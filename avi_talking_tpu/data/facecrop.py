"""Landmark-driven face cropping (detect -> center/size -> similarity warp).

The in-framework equivalent of the reference's detection/cropping helpers at
third_party/inferno/inferno/datasets/ImageDatasetHelpers.py:25-70
(``bbox2point``/``point2transform``/``bbpoint_warp``) as driven by
FaceVideoDataModule (scale=1.25, kpt68 boxes from the FAN detector's
landmark min/max, FaceDetector.py:112-121). Together with
models.fan_landmarks this closes the raw-FULL-frame -> cropped-detection
path: detect landmarks on the full frame, derive the square face box,
warp-crop to the encoder size, and carry the landmarks into crop space.

The reference warps with skimage bicubic (order=3); we warp with a jitted
bilinear gather (jax map_coordinates supports order<=1) — sub-pixel
differences are far below the downstream encoder's sensitivity, and the
warp runs batched on device instead of per-frame on host.

All landmark/crop conventions: pixel coords are (x right, y down);
normalized coords are [-1, 1] NDC with the same orientation.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np


def bbox2point_kpt68(lmk_px: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(T, 68, 2) landmark pixels -> (old_size (T,), center (T, 2)).

    ImageDatasetHelpers.bbox2point type='kpt68': old_size is the mean box
    side x 1.1; center is the box center."""
    left = lmk_px[..., 0].min(-1)
    right = lmk_px[..., 0].max(-1)
    top = lmk_px[..., 1].min(-1)
    bottom = lmk_px[..., 1].max(-1)
    old_size = (right - left + bottom - top) / 2.0 * 1.1
    center = np.stack([right - (right - left) / 2.0,
                       bottom - (bottom - top) / 2.0], axis=-1)
    return old_size.astype(np.float32), center.astype(np.float32)


def bbox2point_bbox(boxes: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(T, 4) [left, top, right, bottom] detector boxes -> (size, center)
    with the detector-box vertical shift (bbox2point type='bbox')."""
    left, top, right, bottom = [boxes[..., i] for i in range(4)]
    old_size = (right - left + bottom - top) / 2.0
    center = np.stack(
        [right - (right - left) / 2.0,
         bottom - (bottom - top) / 2.0 + old_size * 0.12], axis=-1)
    return old_size.astype(np.float32), center.astype(np.float32)


def _warp_jit():
    """Module-level jitted warp (one compile per (T, H, W, S) signature —
    defining it inside warp_crop would re-trace on every call)."""
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnums=(3, 4))
    def _warp(fr, c, s, S, out_u8=False):
        if fr.dtype == jnp.uint8:  # uint8 transport: normalise on device
            fr = fr.astype(jnp.float32) / 255.0
        grid = jnp.arange(S, dtype=jnp.float32) / (S - 1)  # [0, 1]

        def axis_weights(start, side, limit):
            # clamped sample positions along one axis (edge clamp ==
            # map_coordinates mode='nearest' for coords clipped in-range)
            pos = jnp.clip(start + grid * side, 0.0, limit - 1.0)  # (S,)
            i0 = jnp.floor(pos).astype(jnp.int32)
            i1 = jnp.minimum(i0 + 1, limit - 1)
            w = pos - i0.astype(jnp.float32)
            return i0, i1, w

        def one(img, ci, si):
            # the crop is an axis-aligned scale+translate, so bilinear
            # sampling SEPARATES: one whole-row gather+lerp (H -> S), then
            # one column gather+lerp (W -> S). Whole-row gathers keep the
            # gather minor dims big (W*C contiguous) — the 4-point
            # map_coordinates form was ~5x slower on v5e (tiny-trailing-dim
            # gathers, the CLAUDE.md layout trap) at 15.8 ms/frame.
            iy0, iy1, wy = axis_weights(ci[1] - si / 2.0, si, img.shape[0])
            ix0, ix1, wx = axis_weights(ci[0] - si / 2.0, si, img.shape[1])
            rows = (img[iy0] * (1.0 - wy)[:, None, None]
                    + img[iy1] * wy[:, None, None])  # (S, W, C)
            out = (rows[:, ix0] * (1.0 - wx)[None, :, None]
                   + rows[:, ix1] * wx[None, :, None])  # (S, S, C)
            return out

        out = jax.vmap(one)(fr, c, s)
        if out_u8:  # quantise ON device: 4x fewer D2H bytes for the crops
            out = jnp.clip(jnp.rint(out * 255.0), 0.0, 255.0).astype(jnp.uint8)
        return out

    return _warp


_WARP = None


def warp_crop(frames, center, size, out_size: int, out_u8: bool = False):
    """Batched square crop: (T, H, W, 3), (T, 2), (T,) -> (T, S, S, 3).

    point2transform semantics: the square [center - size/2, center + size/2]
    maps onto [0, out_size - 1]; bilinear sampling, edge clamp (skimage
    warp's default 'constant' only differs outside the frame, where a face
    box rarely reaches; clamping avoids black borders poisoning the
    encoder). ``out_u8`` quantises to uint8 on device — 4x fewer D2H bytes
    (the crops are stored as 8-bit PNGs anyway)."""
    import jax.numpy as jnp

    global _WARP
    if _WARP is None:
        _WARP = _warp_jit()
    return np.asarray(_WARP(
        jnp.asarray(frames), jnp.asarray(center),
        jnp.asarray(size), out_size, out_u8))


def landmarks_to_crop_space(
    lmk_px: np.ndarray, center: np.ndarray, size: np.ndarray, out_size: int
) -> np.ndarray:
    """Full-frame landmark pixels -> [-1, 1] NDC of the warped crop."""
    origin = center - size[:, None] / 2.0  # (T, 2)
    crop_px = (lmk_px - origin[:, None, :]) * (
        (out_size - 1) / size)[:, None, None]
    return (crop_px / (out_size - 1) * 2.0 - 1.0).astype(np.float32)


def detect_and_crop(
    detector,  # models.fan_landmarks.FanLandmarkDetector
    frames: np.ndarray,  # (T, H, W, 3) FULL frames in [0, 1]
    out_size: int = 224,
    scale: float = 1.25,
    smooth_boxes: bool = False,
    box_detector=None,  # models.sfd.SfdDetector
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full frames -> (crops (T, S, S, 3), crop-space landmarks (T, 68, 2)
    in [-1, 1], per-frame validity (T,)).

    FaceVideoDataModule flow: FAN landmarks on the full frame -> kpt68 box
    -> size x ``scale`` (default 1.25) -> similarity warp-crop.
    ``smooth_boxes`` median-smooths center/size over the clip (the
    reference's static-box option for single-subject clips).

    With ``box_detector`` (S3FD), a detection stage runs first — the
    face_alignment get_landmarks flow: SFD box -> box-centered 256 crop
    (center shifted up 0.12 x box height, side 200 x (w+h)/195) -> FAN on
    the crop -> landmarks mapped back to full-frame pixels. Without it,
    FAN runs on the whole (resized) frame — fine when the face dominates
    the frame (talking-head footage), required detector-free."""
    lmk_px, scores = detect_fullframe_landmarks(detector, frames,
                                                box_detector=box_detector)
    old_size, center = bbox2point_kpt68(lmk_px)
    size = (old_size * scale).astype(np.float32)
    if smooth_boxes:
        size = np.full_like(size, float(np.median(size)))
        center = np.broadcast_to(
            np.median(center, axis=0, keepdims=True), center.shape).copy()
    crops = warp_crop(frames, center, size, out_size)
    crop_lmk = landmarks_to_crop_space(lmk_px, center, size, out_size)
    validity = np.clip(scores.mean(-1), 0.0, None).astype(np.float32)
    return crops.astype(np.float32), crop_lmk, validity


def detect_fullframe_landmarks(
    detector, frames: np.ndarray, box_detector=None
) -> Tuple[np.ndarray, np.ndarray]:
    """Full frames -> (landmark pixels (T, 68, 2), scores (T, 68)).

    The detection half of ``detect_and_crop`` — factored out so callers
    that need the WHOLE clip's track (e.g. temporal smoothing) can detect
    in chunks, assemble the track, then crop in a second pass."""
    import jax
    import jax.numpy as jnp

    T, H, W = frames.shape[:3]
    # FAN's optimal input (FaceDetector.optimal_landmark_detector_im_size)
    det_size = 256
    if box_detector is not None:
        # device-resident stage 1: full frames cross H2D ONCE, then box
        # decode (device top-1 when available), 256-warp and FAN all
        # consume the same device buffer — only boxes/landmarks are
        # fetched. The r5 chain bench measured the old host-decode path
        # (full score pyramids + re-shipped frames) at 3.2 frames/s.
        dev = jax.device_put(frames)
        if hasattr(box_detector, "best_box_device"):
            boxes = box_detector.best_box_device(dev)  # (T, 5)
        else:  # host decode (multi-face NMS path)
            boxes = box_detector.best_box(frames)
        bw = boxes[:, 2] - boxes[:, 0]
        bh = boxes[:, 3] - boxes[:, 1]
        center0 = np.stack(
            [(boxes[:, 0] + boxes[:, 2]) / 2.0,
             (boxes[:, 1] + boxes[:, 3]) / 2.0 - 0.12 * bh], axis=-1)
        side0 = ((bw + bh) * (200.0 / 195.0)).astype(np.float32)
        global _WARP
        if _WARP is None:
            _WARP = _warp_jit()
        stage1 = _WARP(dev, jnp.asarray(center0), jnp.asarray(side0),
                       det_size)  # stays on device for the FAN pass
        lmk_ndc, scores = detector(stage1)  # [-1,1] of the stage-1 crop
        origin = center0 - side0[:, None] / 2.0
        lmk_px = (origin[:, None, :]
                  + (lmk_ndc + 1.0) / 2.0 * side0[:, None, None])
    else:
        if (H, W) != (det_size, det_size):
            f = jnp.asarray(frames)
            if f.dtype == jnp.uint8:  # uint8 transport: normalise on device
                f = f.astype(jnp.float32) / 255.0
            det_in = np.asarray(jax.image.resize(
                f, (T, det_size, det_size, 3), "bilinear"))
        else:
            det_in = frames
        lmk_ndc, scores = detector(det_in)  # [-1,1] of the resized frame
        # -> full-frame pixels
        rel = (lmk_ndc + 1.0) / 2.0
        lmk_px = np.stack([rel[..., 0] * (W - 1), rel[..., 1] * (H - 1)], -1)
    return lmk_px.astype(np.float32), scores


def smooth_track(
    center: np.ndarray,  # (T, 2)
    size: np.ndarray,  # (T,)
    validity: Optional[np.ndarray] = None,  # (T,) 0 = failed detection
    sigma: float = 3.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Temporally stabilise a face-box track (FaceVideoDataModule's
    detection alignment, :2830-2868: interpolate over failed-detection
    gaps, then gaussian_filter1d(sigma=3) on centers and sizes — the
    reference RBF-interpolates; linear interpolation over the gap frames
    serves the same role without the scipy RBF machinery). Per-frame
    crops jitter with detector noise; the smoothed track keeps the crop
    stable so downstream pseudo-GT/PIRender sequences don't inherit the
    jitter."""
    from scipy.ndimage import gaussian_filter1d

    T = center.shape[0]
    center = center.astype(np.float64).copy()
    size = size.astype(np.float64).copy()
    if validity is not None:
        good = np.asarray(validity) > 0
        if good.any() and not good.all():
            t = np.arange(T)
            for d in range(2):
                center[:, d] = np.interp(t, t[good], center[good, d])
            size = np.interp(t, t[good], size[good])
        # all-bad tracks fall through unmodified (caller handles validity)
    if sigma > 0 and T > 1:
        for d in range(2):
            center[:, d] = gaussian_filter1d(center[:, d], sigma=sigma,
                                             mode="nearest")
        size = gaussian_filter1d(size, sigma=sigma, mode="nearest")
    return center.astype(np.float32), size.astype(np.float32)
