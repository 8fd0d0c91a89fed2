// Native host-side audio frontend: WAV decode + resample + framing.
//
// TPU-native replacement for the reference's librosa/ffmpeg host decode path
// (/root/reference/.../evaluation_functions.py:680-714). The device only ever
// sees ready-made frame tensors; this keeps the host preprocessing off the
// Python interpreter for high-throughput serving (the pure-Python fallback in
// avi_talking_tpu/audio/frontend.py remains the portable reference
// implementation — both are covered by the same tests).
//
// C ABI (ctypes):
//   wavio_decode(path, out_ptr, max_samples, target_sr) -> n_samples or <0
//   wavio_frame(wav_f32, n, sr, fps, max_seconds, out_i16) -> n_frames
//
// Build: make -C native   (produces libwavio.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>
#include <cmath>
#include <algorithm>

namespace {

struct Reader {
    FILE* f;
    explicit Reader(const char* path) { f = fopen(path, "rb"); }
    ~Reader() { if (f) fclose(f); }
    bool read(void* dst, size_t n) { return f && fread(dst, 1, n, f) == n; }
    bool skip(long n) { return f && fseek(f, n, SEEK_CUR) == 0; }
};

// linear resample (same semantics as scipy-free align on sample centers)
void resample_linear(const std::vector<float>& in, int sr_in,
                     std::vector<float>& out, int sr_out) {
    if (sr_in == sr_out) { out = in; return; }
    const double ratio = static_cast<double>(sr_in) / sr_out;
    const size_t n_out = static_cast<size_t>(in.size() / ratio);
    out.resize(n_out);
    for (size_t i = 0; i < n_out; ++i) {
        const double pos = i * ratio;
        const size_t lo = static_cast<size_t>(pos);
        const size_t hi = std::min(lo + 1, in.size() - 1);
        const float frac = static_cast<float>(pos - lo);
        out[i] = in[lo] * (1.0f - frac) + in[hi] * frac;
    }
}

}  // namespace

extern "C" {

// Decode a PCM/float WAV to mono float32 at target_sr.
// Returns the number of samples written to out (<= max_samples), or a
// negative error code (-1 open, -2 format, -3 too long).
int64_t wavio_decode(const char* path, float* out, int64_t max_samples,
                     int32_t target_sr) {
    Reader r(path);
    if (!r.f) return -1;
    char riff[4], wave[4];
    uint32_t riff_size;
    if (!r.read(riff, 4) || !r.read(&riff_size, 4) || !r.read(wave, 4)) return -2;
    if (memcmp(riff, "RIFF", 4) || memcmp(wave, "WAVE", 4)) return -2;

    uint16_t fmt = 0, channels = 0, bits = 0;
    uint32_t sr = 0;
    std::vector<float> mono;

    for (;;) {
        char tag[4];
        uint32_t size;
        if (!r.read(tag, 4) || !r.read(&size, 4)) break;
        if (!memcmp(tag, "fmt ", 4)) {
            uint8_t buf[16];
            if (size < 16 || !r.read(buf, 16)) return -2;
            fmt = buf[0] | (buf[1] << 8);
            channels = buf[2] | (buf[3] << 8);
            memcpy(&sr, buf + 4, 4);
            bits = buf[14] | (buf[15] << 8);
            if (size > 16) r.skip(size - 16);
        } else if (!memcmp(tag, "data", 4)) {
            if (!channels || !sr) return -2;
            const uint32_t bytes_per = bits / 8;
            const uint64_t n_frames = size / (bytes_per * channels);
            std::vector<uint8_t> raw(size);
            if (!r.read(raw.data(), size)) return -2;
            mono.resize(n_frames);
            for (uint64_t i = 0; i < n_frames; ++i) {
                float acc = 0.f;
                for (uint16_t c = 0; c < channels; ++c) {
                    const uint8_t* p = raw.data() + (i * channels + c) * bytes_per;
                    float v;
                    if (fmt == 3 && bits == 32) {          // IEEE float
                        memcpy(&v, p, 4);
                    } else if (bits == 16) {
                        int16_t s; memcpy(&s, p, 2); v = s / 32768.f;
                    } else if (bits == 32) {
                        int32_t s; memcpy(&s, p, 4); v = s / 2147483648.f;
                    } else if (bits == 24) {
                        int32_t s = (p[0] << 8) | (p[1] << 16) | (p[2] << 24);
                        v = (s >> 8) / 8388608.f;
                    } else if (bits == 8) {
                        v = (p[0] - 128) / 128.f;
                    } else {
                        return -2;
                    }
                    acc += v;
                }
                mono[i] = acc / channels;
            }
            break;
        } else {
            r.skip(size + (size & 1));
        }
    }
    if (mono.empty()) return -2;

    std::vector<float> res;
    resample_linear(mono, static_cast<int>(sr), res, target_sr);
    if (static_cast<int64_t>(res.size()) > max_samples) return -3;
    memcpy(out, res.data(), res.size() * sizeof(float));
    return static_cast<int64_t>(res.size());
}

// float wav -> int16 frames of (sr/fps) samples; hard cut at max_seconds.
// Returns number of frames written to out_i16 (shape n_frames x spf).
int64_t wavio_frame(const float* wav, int64_t n, int32_t sr, int32_t fps,
                    int32_t max_seconds, int16_t* out_i16) {
    const int64_t spf = sr / fps;
    int64_t limit = n;
    if (max_seconds > 0 && limit > static_cast<int64_t>(max_seconds) * sr)
        limit = static_cast<int64_t>(max_seconds) * sr;
    const int64_t n_frames = limit / spf;
    const int64_t total = n_frames * spf;
    for (int64_t i = 0; i < total; ++i) {
        double v = static_cast<double>(wav[i]) * 32768.0;
        v = std::max(-32768.0, std::min(32767.0, v));
        out_i16[i] = static_cast<int16_t>(v);
    }
    return n_frames;
}

}  // extern "C"
