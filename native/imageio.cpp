// Native PNG decoder for the data-loading hot path (ctypes-bound from
// avi_talking_tpu/viz/pngio.py; pure-Python fallback is the oracle).
//
// Replaces the reference's cv2.imread in the MEAD image pipeline
// (/root/reference/dataset/data_loader.py:342-346). Supports 8-bit
// gray / gray+alpha / RGB / RGBA, non-interlaced, zlib-inflated via -lz.
//
// Build: make -C native (g++ -O3 -shared -lz).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include <zlib.h>

namespace {

inline uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

inline uint8_t paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return uint8_t(a);
  if (pb <= pc) return uint8_t(b);
  return uint8_t(c);
}

bool inflate_all(const std::vector<uint8_t>& in, std::vector<uint8_t>& out,
                 size_t expected) {
  out.resize(expected);
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return false;
  zs.next_in = const_cast<Bytef*>(in.data());
  zs.avail_in = uInt(in.size());
  zs.next_out = out.data();
  zs.avail_out = uInt(out.size());
  int rc = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  return rc == Z_STREAM_END && zs.total_out == expected;
}

}  // namespace

extern "C" {

// Decode `path` into `out` (row-major H*W*C uint8). Returns bytes written.
// Errors: -1 io/parse, -2 capacity (needed size reported via *w), -3
// unsupported format, -4 inflate failure.
int64_t imageio_read_png(const char* path, uint8_t* out, int64_t cap,
                         int32_t* w, int32_t* h, int32_t* c) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long fsize = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> data(static_cast<size_t>(fsize));
  if (std::fread(data.data(), 1, size_t(fsize), f) != size_t(fsize)) {
    std::fclose(f);
    return -1;
  }
  std::fclose(f);

  static const uint8_t kSig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  if (fsize < 8 || std::memcmp(data.data(), kSig, 8) != 0) return -1;

  uint32_t width = 0, height = 0;
  int depth = 0, ctype = -1, interlace = 0;
  std::vector<uint8_t> idat;
  size_t pos = 8;
  while (pos + 12 <= data.size()) {
    uint32_t len = be32(&data[pos]);
    const uint8_t* tag = &data[pos + 4];
    const uint8_t* body = &data[pos + 8];
    if (pos + 12 + len > data.size()) return -1;
    if (!std::memcmp(tag, "IHDR", 4)) {
      if (len < 13) return -1;
      width = be32(body);
      height = be32(body + 4);
      depth = body[8];
      ctype = body[9];
      interlace = body[12];
    } else if (!std::memcmp(tag, "IDAT", 4)) {
      idat.insert(idat.end(), body, body + len);
    } else if (!std::memcmp(tag, "IEND", 4)) {
      break;
    }
    pos += 12 + len;
  }
  if (width == 0 || height == 0 || depth != 8 || interlace != 0) return -3;
  int ch;
  switch (ctype) {
    case 0: ch = 1; break;
    case 2: ch = 3; break;
    case 4: ch = 2; break;
    case 6: ch = 4; break;
    default: return -3;  // palette handled by the Python fallback
  }
  const size_t stride = size_t(width) * ch;
  const size_t need = size_t(height) * stride;
  if (int64_t(need) > cap) {
    *w = int32_t(need);  // report needed bytes through *w
    return -2;
  }
  std::vector<uint8_t> raw;
  if (!inflate_all(idat, raw, (stride + 1) * height)) return -4;

  const uint8_t* prev = nullptr;
  for (uint32_t y = 0; y < height; ++y) {
    const uint8_t* src = &raw[y * (stride + 1)];
    uint8_t filter = src[0];
    uint8_t* dst = out + y * stride;
    ++src;
    switch (filter) {
      case 0:
        std::memcpy(dst, src, stride);
        break;
      case 1:
        for (size_t x = 0; x < stride; ++x)
          dst[x] = uint8_t(src[x] + (x >= size_t(ch) ? dst[x - ch] : 0));
        break;
      case 2:
        for (size_t x = 0; x < stride; ++x)
          dst[x] = uint8_t(src[x] + (prev ? prev[x] : 0));
        break;
      case 3:
        for (size_t x = 0; x < stride; ++x) {
          int left = x >= size_t(ch) ? dst[x - ch] : 0;
          int up = prev ? prev[x] : 0;
          dst[x] = uint8_t(src[x] + ((left + up) >> 1));
        }
        break;
      case 4:
        for (size_t x = 0; x < stride; ++x) {
          int left = x >= size_t(ch) ? dst[x - ch] : 0;
          int up = prev ? prev[x] : 0;
          int ul = (prev && x >= size_t(ch)) ? prev[x - ch] : 0;
          dst[x] = uint8_t(src[x] + paeth(left, up, ul));
        }
        break;
      default:
        return -1;
    }
    prev = dst;
  }
  *w = int32_t(width);
  *h = int32_t(height);
  *c = int32_t(ch);
  return int64_t(need);
}

}  // extern "C"
