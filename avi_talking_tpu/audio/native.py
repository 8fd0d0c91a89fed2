"""ctypes bindings for the native audio frontend (native/wavio.cpp).

Optional fast path; falls back to the pure-Python frontend when the shared
library has not been built (``make -C native``). Both implementations are
covered by the same tests and must agree.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

from .frontend import MAX_SECONDS, SAMPLE_RATE, VIDEO_FPS

_LIB: Optional[ctypes.CDLL] = None
_SEARCHED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _SEARCHED
    if _SEARCHED:
        return _LIB
    _SEARCHED = True
    here = os.path.dirname(os.path.abspath(__file__))
    for cand in (
        os.environ.get("AVI_TALKING_WAVIO"),
        os.path.join(here, "..", "..", "native", "libwavio.so"),
    ):
        if cand and os.path.exists(cand):
            lib = ctypes.CDLL(cand)
            lib.wavio_decode.restype = ctypes.c_int64
            lib.wavio_decode.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.c_int32,
            ]
            lib.wavio_frame.restype = ctypes.c_int64
            lib.wavio_frame.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int16),
            ]
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return _load() is not None


def read_wav_native(path: str, target_sr: int = SAMPLE_RATE,
                    max_seconds: int = 600) -> Tuple[np.ndarray, int]:
    lib = _load()
    if lib is None:
        raise RuntimeError("libwavio.so not built (make -C native)")
    buf = np.empty(max_seconds * target_sr, np.float32)
    n = lib.wavio_decode(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        buf.shape[0], target_sr,
    )
    if n < 0:
        raise ValueError(f"wavio_decode failed with code {n} for {path!r}")
    return buf[:n].copy(), target_sr


def frame_audio_native(
    wav: np.ndarray, sr: int = SAMPLE_RATE, fps: int = VIDEO_FPS,
    max_seconds: int = MAX_SECONDS,
) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("libwavio.so not built (make -C native)")
    wav = np.ascontiguousarray(wav, np.float32)
    spf = sr // fps
    max_frames = min(len(wav), (max_seconds or 10**9) * sr) // spf
    out = np.empty((max_frames, spf), np.int16)
    n = lib.wavio_frame(
        wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(wav), sr, fps,
        max_seconds or 0, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
    )
    return out[:n]
