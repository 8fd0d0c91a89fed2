"""YUV 4:2:0 frame transport: 1.5 bytes/pixel host->device shipping.

Preprocessing is transfer-bound on remote-TPU links (measured ~35 MB/s
through the axon tunnel: a 224^2 fp32 frame costs 17 ms of wire time
before the encoder sees it). Video containers already store frames as
yuv420p, so shipping Y + 2x2-subsampled U/V planes and reconstructing RGB
on device is both the cheapest (6x fewer bytes than fp32, 2x fewer than
raw uint8 RGB) and, for video-sourced data, the most faithful transport —
the chroma subsampling it "loses" was already lost by the codec.

The reference has no analog (it reads decoded RGB ndarrays from skvideo,
third_party/inferno/inferno/datasets/FaceVideoDataModule.py:422-429, and
ships them to CUDA over PCIe where bytes are free).

Layout: one packed uint8 row per frame, ``[Y (H*W) | U (H/2*W/2) |
V (H/2*W/2)]`` — exactly ffmpeg's ``-pix_fmt yuv420p`` rawvideo frame
layout, so ``data.videoio`` can feed decoder output here byte-for-byte.
BT.601 full-range ("JPEG") coefficients.
"""

from __future__ import annotations

import numpy as np

# BT.601 full-range RGB -> YUV (the JPEG/JFIF matrix; ffmpeg yuvj/full-range)
_RGB2Y = np.array([0.299, 0.587, 0.114], np.float32)
_RGB2U = np.array([-0.168736, -0.331264, 0.5], np.float32)
_RGB2V = np.array([0.5, -0.418688, -0.081312], np.float32)


def yuv420_packed_size(h: int, w: int) -> int:
    return h * w + 2 * (h // 2) * (w // 2)


def rgb_to_yuv420(frames_u8: np.ndarray) -> np.ndarray:
    """(T, H, W, 3) uint8 RGB -> (T, H*W*3/2) packed planar uint8.

    H and W must be even (pad/crop upstream — video codecs require the
    same). 2x2 box-filter chroma subsampling (what swscale does for
    yuv420p encode)."""
    if frames_u8.dtype != np.uint8:
        raise ValueError(f"rgb_to_yuv420 wants uint8, got {frames_u8.dtype}")
    t, h, w, c = frames_u8.shape
    if c != 3 or h % 2 or w % 2:
        raise ValueError(f"need (T, even H, even W, 3), got {frames_u8.shape}")
    f = frames_u8.astype(np.float32)
    y = f @ _RGB2Y
    u = f @ _RGB2U + 128.0
    v = f @ _RGB2V + 128.0
    # 2x2 average subsample
    u = u.reshape(t, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
    v = v.reshape(t, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
    pack = np.concatenate(
        [np.clip(np.rint(p), 0, 255).astype(np.uint8).reshape(t, -1)
         for p in (y, u, v)], axis=1)
    return pack


def yuv420_to_rgb_host(packed: np.ndarray, h: int, w: int) -> np.ndarray:
    """Host-side inverse (numpy) — test oracle and non-JAX consumers.
    Returns (T, H, W, 3) float32 in [0, 1]."""
    y, u, v = _split(packed, h, w, np)
    u = u.repeat(2, axis=1).repeat(2, axis=2)
    v = v.repeat(2, axis=1).repeat(2, axis=2)
    return _combine(y, u, v, np)


def yuv420_to_rgb(packed, h: int, w: int):
    """Device-side unpack: (B, H*W*3/2) uint8 -> (B, H, W, 3) float32 in
    [0, 1]. Traced under jit (h, w static). Chroma is upsampled with the
    same 2x NEAREST repeat as the host oracle — device and host paths must
    produce identical RGB, or the same clip would get different pseudo-GT
    codes depending on whether the frame-free or frames path ran it."""
    import jax.numpy as jnp

    y, u, v = _split(packed, h, w, jnp)
    u = jnp.repeat(jnp.repeat(u, 2, axis=1), 2, axis=2)
    v = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2)
    return _combine(y, u, v, jnp)


def _split(packed, h, w, xp):
    b = packed.shape[0]
    hw = h * w
    qw = (h // 2) * (w // 2)
    y = packed[:, :hw].reshape(b, h, w).astype(xp.float32)
    u = packed[:, hw : hw + qw].reshape(b, h // 2, w // 2).astype(xp.float32)
    v = packed[:, hw + qw :].reshape(b, h // 2, w // 2).astype(xp.float32)
    return y, u, v


def _combine(y, u, v, xp):
    u = u - 128.0
    v = v - 128.0
    r = y + 1.402 * v
    g = y - 0.344136 * u - 0.714136 * v
    b = y + 1.772 * u
    rgb = xp.stack([r, g, b], axis=-1)
    return xp.clip(rgb, 0.0, 255.0) / 255.0
