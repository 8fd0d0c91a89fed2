"""Coefficient post-processing: silent-interval jaw surgery + pose smoothing.

``apply_jaw_intervals`` reproduces the reference's mouth opening/closure/
silence handling (run_evalutation,
/root/reference/third_party/inferno/inferno_apps/TalkingHead/evaluation/evaluation_functions.py:404-532):

  * mouth_opening (s, e): jaw linearly interpolated 0 -> jaw[e] over [s, e)
  * mouth_closure (s, e): jaw linearly interpolated jaw[s] -> 0 over [s, e)
  * silent (s, e): jaw zeroed

Expressions are left untouched (the reference computes interpolated
expressions but overwrites them with the boundary value, :431/:489 — i.e.
no-ops on exp). Instead of the reference's per-interval FLAME re-decode of
slices, the caller re-decodes the whole modified sequence in one batched
FLAME call (identical outputs, single device dispatch).

``butter_lowpass_filtfilt`` ports the dataset's pose smoothing
(/root/reference/dataset/data_loader.py:37-62) for the MEAD loader (host-side
scipy, matching butter+filtfilt semantics).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Intervals:
    """Frame intervals (negative indices allowed, resolved against T)."""

    mouth_opening: Sequence[Tuple[int, int]] = ()
    mouth_closure: Sequence[Tuple[int, int]] = ()
    silent: Sequence[Tuple[int, int]] = ()

    @classmethod
    def for_padded_silence(
        cls, silent_frames_start: int, silent_frames_end: int,
        num_mouth_frames: int = 5,
    ) -> "Intervals":
        """The eval_talking_head_on_audio recipe
        (train_diffusion_prior.py:878-892)."""
        opening, closure, silent = [], [], []
        if silent_frames_start > 0:
            silent.append((0, silent_frames_start - num_mouth_frames))
            opening.append(
                (silent_frames_start - num_mouth_frames, silent_frames_start)
            )
        if silent_frames_end > 0:
            silent.append((-silent_frames_end + num_mouth_frames, -1))
            closure.append((-silent_frames_end, -silent_frames_end + num_mouth_frames))
        return cls(tuple(opening), tuple(closure), tuple(silent))


def _resolve(iv: Tuple[int, int], T: int) -> Tuple[int, int]:
    s, e = iv
    if s < 0:
        s += T
    if e < 0:
        e += T
    return s, e


def apply_jaw_intervals(
    exp: jax.Array,  # (B, T, n_exp)
    jaw: jax.Array,  # (B, T, 3)
    intervals: Intervals,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (exp, modified jaw). Interval bounds are static ints."""
    T = jaw.shape[1]
    jaw = jnp.asarray(jaw)

    for iv in intervals.mouth_opening:
        s, e = _resolve(iv, T)
        if e - s <= 0:
            continue
        w = jnp.linspace(0.0, 1.0, e - s)[None, :, None].astype(jaw.dtype)
        target = jaw[:, e : e + 1]
        jaw = jaw.at[:, s:e].set(w * target)

    for iv in intervals.mouth_closure:
        s, e = _resolve(iv, T)
        if e - s <= 0 or s <= 0:
            continue
        w = jnp.linspace(0.0, 1.0, e - s)[None, :, None].astype(jaw.dtype)
        start = jaw[:, s : s + 1]
        jaw = jaw.at[:, s:e].set(start * (1.0 - w))

    for iv in intervals.silent:
        s, e = _resolve(iv, T)
        if e - s <= 0:
            continue
        jaw = jaw.at[:, s:e].set(0.0)

    return exp, jaw


def butter_lowpass_filtfilt(
    data: np.ndarray, cutoff: float = 4.0, fs: float = 25.0, order: int = 4
) -> np.ndarray:
    """Zero-phase butterworth low-pass along axis 0 (host, scipy)."""
    from scipy.signal import butter, filtfilt

    b, a = butter(order, cutoff / (0.5 * fs), btype="low", analog=False)
    return filtfilt(b, a, data, axis=0).astype(data.dtype)
