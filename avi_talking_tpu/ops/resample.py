"""Feature-rate resampling.

The reference pipeline resamples wav2vec2 features from the model's native
50 fps to the video frame rate (25 fps) with ``F.interpolate(...,
mode='linear', align_corners=True, size=output_len)`` — see
/root/reference/models/lib/wav2vec.py:67-73 and
/root/reference/third_party/inferno/inferno/models/temporal/AudioEncoders.py:27-101.
Lip-sync quality depends on matching those semantics exactly, so this module
implements the identical align_corners=True linear resampling as a pure
gather+lerp that XLA fuses into the surrounding graph (no host round trip,
static output length => jit-stable).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear_interpolate(x: jax.Array, output_len: int, axis: int = 1) -> jax.Array:
    """Linear resample along ``axis`` to ``output_len`` with align_corners=True.

    Matches ``torch.nn.functional.interpolate(mode='linear',
    align_corners=True)``: for output index ``i`` the source coordinate is
    ``i * (L_in - 1) / (L_out - 1)`` (and 0 when ``L_out == 1``).

    Args:
        x: input array; the resampled axis is ``axis``.
        output_len: static output length along ``axis``.
        axis: axis to resample.

    Returns:
        Array with ``x.shape[axis]`` replaced by ``output_len``.
    """
    in_len = x.shape[axis]
    if in_len == output_len:
        return x
    if output_len == 1:
        # align_corners=True with a single output sample picks coordinate 0.
        return jax.lax.slice_in_dim(x, 0, 1, axis=axis)
    if in_len == 1:
        reps = [1] * x.ndim
        reps[axis] = output_len
        return jnp.tile(x, reps)

    scale = (in_len - 1) / (output_len - 1)
    coords = jnp.arange(output_len, dtype=jnp.float32) * scale
    lo = jnp.clip(jnp.floor(coords).astype(jnp.int32), 0, in_len - 1)
    hi = jnp.clip(lo + 1, 0, in_len - 1)
    frac = (coords - lo.astype(jnp.float32)).astype(x.dtype)

    x_lo = jnp.take(x, lo, axis=axis)
    x_hi = jnp.take(x, hi, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = output_len
    frac = frac.reshape(shape)
    return x_lo + (x_hi - x_lo) * frac


def resample_features(
    features: jax.Array,
    input_fps: float,
    output_fps: float,
    output_len: int | None = None,
) -> jax.Array:
    """Resample (B, T, F) features between frame rates.

    Mirrors ``linear_interpolation`` in the reference
    (/root/reference/models/lib/wav2vec.py:67-73): when ``output_len`` is not
    given it is derived as ``int(T / input_fps * output_fps)``.
    """
    if output_len is None:
        output_len = int(features.shape[1] / float(input_fps) * output_fps)
    return linear_interpolate(features, output_len, axis=1)
