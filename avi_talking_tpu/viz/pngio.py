"""Dependency-free PNG read/write (replaces the reference's cv2.imread /
cv2.imwrite image IO, e.g. /root/reference/dataset/data_loader.py:342-346).

``read_png`` decodes 8-bit gray / gray+alpha / RGB / RGBA / palette PNGs
(non-interlaced) to a (H, W, C) uint8 array. A native C++ decoder
(``native/imageio.cpp``, built with ``make -C native``) is used when
available — the pure-Python unfilter loop is the fallback and the
correctness oracle (both covered by the same tests).
"""

from __future__ import annotations

import ctypes
import os
import struct
import zlib
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_SEARCHED = False

_CHANNELS = {0: 1, 2: 3, 3: 3, 4: 2, 6: 4}  # color type -> output channels


def _load_native() -> Optional[ctypes.CDLL]:
    global _LIB, _SEARCHED
    if _SEARCHED:
        return _LIB
    _SEARCHED = True
    here = os.path.dirname(os.path.abspath(__file__))
    for cand in (
        os.environ.get("AVI_TALKING_IMAGEIO"),
        os.path.join(here, "..", "..", "native", "libimageio.so"),
    ):
        if cand and os.path.exists(cand):
            lib = ctypes.CDLL(cand)
            lib.imageio_read_png.restype = ctypes.c_int64
            lib.imageio_read_png.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),  # w
                ctypes.POINTER(ctypes.c_int32),  # h
                ctypes.POINTER(ctypes.c_int32),  # c
            ]
            _LIB = lib
            break
    return _LIB


def _read_png_native(path: str, lib: ctypes.CDLL) -> np.ndarray:
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    c = ctypes.c_int32()
    cap = os.path.getsize(path) * 64 + (1 << 20)  # generous inflate bound
    buf = np.empty(cap, np.uint8)
    n = lib.imageio_read_png(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cap, ctypes.byref(w), ctypes.byref(h), ctypes.byref(c),
    )
    if n < 0:
        if n == -2:  # capacity: retry with the exact requested size
            buf = np.empty(w.value, np.uint8)  # w carries needed bytes
            n = lib.imageio_read_png(
                path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                buf.size, ctypes.byref(w), ctypes.byref(h), ctypes.byref(c),
            )
        if n < 0:
            raise ValueError(f"native PNG decode failed ({n}): {path}")
    return buf[:n].reshape(h.value, w.value, c.value).copy()


# --------------------------------------------------------------------------
# pure-Python decoder
# --------------------------------------------------------------------------

def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)).astype(
        np.uint8
    )


def _unfilter(raw: bytes, h: int, w: int, ch: int) -> np.ndarray:
    stride = w * ch
    out = np.zeros((h, stride), np.uint8)
    pos = 0
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        ftype = raw[pos]
        row = np.frombuffer(raw, np.uint8, stride, pos + 1).copy()
        pos += 1 + stride
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub: mod-256 cumulative sum per channel lane
            row = (
                np.cumsum(row.reshape(w, ch), axis=0, dtype=np.uint64)
                .astype(np.uint8)
                .reshape(stride)
            )
        elif ftype == 2:  # Up
            row = (row.astype(np.int32) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            r = row.reshape(w, ch).astype(np.int32)
            p = prev.reshape(w, ch).astype(np.int32)
            acc = np.zeros(ch, np.int32)
            rows = []
            for x in range(w):
                acc = (r[x] + ((acc + p[x]) >> 1)) & 0xFF
                rows.append(acc)
            row = np.stack(rows).astype(np.uint8).reshape(stride)
        elif ftype == 4:  # Paeth
            r = row.reshape(w, ch)
            p = prev.reshape(w, ch)
            left = np.zeros(ch, np.uint8)
            ul = np.zeros(ch, np.uint8)
            rows = []
            for x in range(w):
                left = ((r[x].astype(np.int32) + _paeth(left, p[x], ul)) & 0xFF).astype(np.uint8)
                ul = p[x]
                rows.append(left)
            row = np.stack(rows).reshape(stride)
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = row
        prev = out[y]
    return out


def _read_png_python(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        data = f.read()
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError(f"not a PNG: {path}")
    pos = 8
    idat = b""
    plte = trns = None
    w = h = depth = ctype = interlace = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(body, np.uint8)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if depth != 8:
        raise ValueError(f"only 8-bit PNGs supported (depth={depth}): {path}")
    if interlace:
        raise ValueError(f"interlaced PNGs not supported: {path}")
    if ctype not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {ctype}: {path}")
    raw_ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    raw = zlib.decompress(idat)
    img = _unfilter(raw, h, w, raw_ch).reshape(h, w, raw_ch)
    if ctype == 3:  # palette
        if plte is None:
            raise ValueError(f"palette PNG missing PLTE: {path}")
        idx = img[..., 0]
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(256, 255, np.uint8)
            alpha[: len(trns)] = trns
            return np.concatenate([rgb, alpha[idx][..., None]], axis=-1)
        return rgb
    return img


def read_png(path: str) -> np.ndarray:
    """Decode to (H, W, C) uint8 (C = 1/2/3/4 by color type)."""
    lib = _load_native()
    if lib is not None:
        try:
            return _read_png_native(path, lib)
        except ValueError:
            pass  # fall through (e.g. palette handled only in Python)
    return _read_png_python(path)


def write_png(path: str, img_u8: np.ndarray) -> None:
    """Minimal PNG writer (8-bit gray/RGB/RGBA, filter 0 rows)."""
    if img_u8.ndim == 2:
        img_u8 = img_u8[..., None]
    h, w, c = img_u8.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    raw = b"".join(b"\x00" + img_u8[i].tobytes() for i in range(h))

    def chunk(tag, body):
        out = struct.pack(">I", len(body)) + tag + body
        return out + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)

    header = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", header))
        f.write(chunk(b"IDAT", zlib.compress(raw)))
        f.write(chunk(b"IEND", b""))


def read_image_u8(path: str) -> np.ndarray:
    """(H, W, 3) uint8 RGB — gray/alpha channels folded away. The byte-
    transport reader: preprocessing ships these to the device as-is (4x
    fewer wire bytes than fp32) and normalises on device."""
    img = read_png(path)
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    elif img.shape[-1] in (2, 4):
        img = img[..., :3] if img.shape[-1] == 4 else np.repeat(img[..., :1], 3, -1)
    return img


def read_image_normalized(path: str) -> np.ndarray:
    """(H, W, 3) float32 in [-1, 1] — the reference's to_Tensor contract
    (data_loader.py:229-238) in NHWC layout."""
    return read_image_u8(path).astype(np.float32) / 255.0 * 2.0 - 1.0
