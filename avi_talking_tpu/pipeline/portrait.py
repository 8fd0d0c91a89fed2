"""PIRender portrait-video inference (photoreal reenactment from coeffs).

TPU-native equivalent of the reference's PIRender inference tooling:

- ``inference_flame.py`` (/root/reference/third_party/pirender/
  inference_flame.py:99-125): drive ``net_G`` with a source portrait and a
  per-frame window of FLAME motion semantics, write ``gt|warp|fake`` video
  strips (``write2video`` :42-64 concatenates streams along width).
- ``coef_control.py`` (/root/reference/third_party/pirender/
  coef_control.py:40-136): semantic control sweeps — interpolate the
  rotation / expression dimensions of the descriptor between presets and
  render the sweep.

The reference renders ONE frame per ``net_G`` forward in a Python loop.
Here the whole sequence's 27-frame semantic windows are gathered with one
take and rendered in fixed-size frame chunks through a single jitted
``FaceGenerator`` apply (static shapes, one compile; the MXU sees
``(chunk, 27, C)`` mapping-net batches and ``(chunk, H, W, ·)`` warps).

Descriptor layout matches training (``train/render_loss.py``, reference
``models/faceformer.py:509-517``): ``[exp | rot3 | jaw3 | cam3]``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.pirender import FaceGenerator


def build_semantics(
    exp: jax.Array,
    jaw: jax.Array,
    rot: Optional[jax.Array] = None,
    cam: Optional[Sequence[float] | jax.Array] = None,
) -> jax.Array:
    """Assemble (T, C) motion descriptors ``[exp | rot3 | jaw3 | cam3]``.

    ``rot``/``cam`` may be (T, 3), (3,), or None (zeros) — generated speech
    coeffs carry no head pose or camera, so both default to the fixed
    frontal view (the reference's driving video supplies them per frame).
    """
    exp = jnp.asarray(exp)
    jaw = jnp.asarray(jaw)
    T = exp.shape[0]

    def _field(x, name):
        if x is None:
            return jnp.zeros((T, 3), exp.dtype)
        x = jnp.asarray(x, exp.dtype)
        if x.ndim == 1:
            x = jnp.broadcast_to(x[None], (T, 3))
        if x.shape != (T, 3):
            raise ValueError(f"{name} must be (3,) or (T,3), got {x.shape}")
        return x

    return jnp.concatenate(
        [exp, _field(rot, "rot"), jaw, _field(cam, "cam")], axis=-1
    )


def semantic_windows(descr: jax.Array, radius: int = 13) -> jax.Array:
    """(T, C) -> (T, 2*radius+1, C) edge-clamped windows.

    Same indexing as ``train.render_loss.obtain_seq_index`` (reference
    ``faceformer.py:529-533``), vectorised over every frame at once.
    """
    T = descr.shape[0]
    idx = jnp.clip(
        jnp.arange(T)[:, None] + jnp.arange(-radius, radius + 1)[None, :],
        0,
        T - 1,
    )
    return jnp.take(descr, idx, axis=0)


@dataclasses.dataclass
class PortraitRenderer:
    """Chunked whole-sequence ``net_G`` inference.

    ``render(source, descr)`` reenacts ``source`` (H, W, 3) in [-1, 1] with
    the (T, C) descriptor sequence and returns ``{"fake": (T, H, W, 3)}``
    (plus ``"warp"`` with ``return_warp=True``), values in [-1, 1].
    """

    generator: FaceGenerator
    params: Any
    chunk: int = 32
    radius: int = 13

    def __post_init__(self):
        gen = self.generator

        @jax.jit
        def _apply(params, src, windows):
            return gen.apply(params, src, windows)

        self._apply = _apply

    def render(
        self, source: jax.Array, descr: jax.Array, return_warp: bool = False
    ) -> Dict[str, np.ndarray]:
        source = jnp.asarray(source)
        windows = semantic_windows(jnp.asarray(descr), self.radius)
        T = windows.shape[0]
        pad = (-T) % self.chunk
        if pad:
            windows = jnp.concatenate(
                [windows, jnp.broadcast_to(windows[-1:], (pad, *windows.shape[1:]))]
            )
        src = jnp.broadcast_to(source[None], (self.chunk, *source.shape))
        fake: List[np.ndarray] = []
        warp: List[np.ndarray] = []
        for s in range(0, T + pad, self.chunk):
            out = self._apply(self.params, src, windows[s : s + self.chunk])
            fake.append(np.asarray(out["fake_image"], np.float32))
            if return_warp:
                warp.append(np.asarray(out["warp_image"], np.float32))
        res = {"fake": np.concatenate(fake)[:T]}
        if return_warp:
            res["warp"] = np.concatenate(warp)[:T]
        return res


def control_schedule(
    base: jax.Array,
    num: int = 10,
    exp_presets: Optional[Dict[str, np.ndarray]] = None,
    exp_scale: float = 2.0,
) -> Tuple[np.ndarray, List[str]]:
    """Semantic sweep sequence (``coef_control.py:40-136`` for FLAME).

    The reference sweeps the 3DMM rotation dims between +/- presets
    (pi/10 on x/y, pi/8 on z; ``:40-52``) and the expression dims between
    dataset-derived presets (``:54-58``), interpolating ``num`` steps per
    leg and returning to center between legs (``:111-135``).  The FLAME
    descriptor has rot at ``[C-9:C-6)`` and exp at ``[0:C-9)``; expression
    presets default to +/- ``exp_scale`` on the first three PCs (the
    reference's ``.mat`` presets are dataset files we do not ship).

    Returns (frames, leg_names): frames (L, C) with L = num * legs.
    """
    base = np.asarray(base, np.float32)
    C = base.shape[0]
    n_exp = C - 9
    rot_lo = n_exp

    def rot_preset(axis: int, sign: float) -> np.ndarray:
        v = np.zeros(3, np.float32)
        v[axis] = sign * (math.pi / 8 if axis == 2 else math.pi / 10)
        return v

    legs: List[Tuple[str, slice, np.ndarray]] = []
    rot_sl = slice(rot_lo, rot_lo + 3)
    center_rot = base[rot_sl].copy()
    for axis, name in enumerate("xyz"):
        for sign, side in ((1.0, "left"), (-1.0, "right")):
            legs.append((f"rotation_{side}_{name}", rot_sl, rot_preset(axis, sign)))
            legs.append((f"rotation_center_{name}_{side}", rot_sl, center_rot))

    exp_sl = slice(0, n_exp)
    center_exp = base[exp_sl].copy()
    if exp_presets is None:
        exp_presets = {}
        for pc in range(min(3, n_exp)):
            v = center_exp.copy()
            v[pc] += exp_scale
            exp_presets[f"expression_pc{pc}"] = v
    for name, target in exp_presets.items():
        legs.append((name, exp_sl, np.asarray(target, np.float32)))
        legs.append((f"expression_center_after_{name}", exp_sl, center_exp))

    frames: List[np.ndarray] = []
    names: List[str] = []
    current = base.copy()
    for name, sl, target in legs:
        start = current[sl].copy()
        for i in range(num):
            t = i / (num - 1) if num > 1 else 1.0
            f = current.copy()
            f[sl] = start + (np.asarray(target) - start) * t
            frames.append(f)
        current = frames[-1].copy()
        names.append(name)
    return np.stack(frames), names


def frames_to_u8(frames: np.ndarray) -> List[np.ndarray]:
    """[-1, 1] float (T, H, W, 3) -> list of (H, W, 3) uint8 frames."""
    u8 = ((np.clip(frames, -1.0, 1.0) + 1.0) * 127.5).astype(np.uint8)
    return list(u8)


def write_strip_video(
    out_path: str,
    *streams: np.ndarray,
    fps: int = 25,
    audio_path: Optional[str] = None,
) -> str:
    """Concatenate [-1,1] float streams along width and write a video.

    Mirror of ``write2video`` (``inference_flame.py:42-64``); mp4 when
    ffmpeg is available, else a PNG frame directory
    (``viz.visualizer.save_frames_as_video``).
    """
    from ..viz.visualizer import save_frames_as_video

    cat = np.concatenate(streams, axis=2)
    return save_frames_as_video(frames_to_u8(cat), out_path, fps, audio_path)
