"""Positional encodings and attention-bias construction.

The reference materialises 600x600 / 1200x1200 ALiBi-style bias tables as
buffers (/root/reference/models/faceformer.py:51-72,
/root/reference/third_party/inferno/inferno/models/temporal/TransformerMasking.py).
On TPU we compute the bias on the fly from broadcasted iotas — O(T^2) work the
VPU does essentially for free, no 1200^2 table in HBM, and any sequence length
up to the jit-bucketed maximum works without re-allocating buffers.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e9  # finite -inf stand-in; keeps softmax NaN-free in low precision


def alibi_slopes(n_heads: int) -> np.ndarray:
    """ALiBi per-head slopes (Press et al.), matching the reference's
    ``get_slopes`` (/root/reference/models/faceformer.py:52-62)."""

    def pow2_slopes(n: int) -> list[float]:
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]

    if math.log2(n_heads).is_integer():
        return np.asarray(pow2_slopes(n_heads), dtype=np.float32)
    closest = 2 ** math.floor(math.log2(n_heads))
    extra = pow2_slopes(2 * closest)[0::2][: n_heads - closest]
    return np.asarray(pow2_slopes(closest) + extra, dtype=np.float32)


def faceformer_bias(
    n_heads: int,
    seq_len: int,
    period: int,
    causal: bool = True,
    dtype=jnp.float32,
) -> jax.Array:
    """(H, T, T) additive attention bias: causal mask + periodised ALiBi.

    Equivalent to slicing the reference's ``init_biased_mask`` table
    (/root/reference/models/faceformer.py:51-72):
    ``bias[h, i, j] = -slope[h] * floor((i - j) / period)`` for ``j <= i`` and
    ``-inf`` above the diagonal (when ``causal``).
    """
    slopes = jnp.asarray(alibi_slopes(n_heads), dtype=dtype)
    i = jax.lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 1)
    dist = jnp.where(i >= j, (i - j) // period, 0)
    bias = -slopes[:, None, None] * dist[None].astype(dtype)
    if causal:
        bias = jnp.where((j > i)[None], jnp.asarray(NEG_INF, dtype), bias)
    return bias


def enc_dec_alignment_bias(
    tgt_len: int,
    src_len: int,
    frames_per_step: int = 1,
    dtype=jnp.float32,
) -> jax.Array:
    """(T, S) additive cross-attention bias allowing target frame ``i`` to see
    only source frames ``[i*k, i*k + k)``.

    Behavioural equivalent of the boolean ``enc_dec_mask``
    (/root/reference/models/faceformer.py:75-83): vocaset => k=1 (diagonal),
    BIWI => k=2.
    """
    i = jax.lax.broadcasted_iota(jnp.int32, (tgt_len, src_len), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (tgt_len, src_len), 1)
    allowed = (j >= i * frames_per_step) & (j < i * frames_per_step + frames_per_step)
    return jnp.where(allowed, jnp.asarray(0.0, dtype), jnp.asarray(NEG_INF, dtype))


def _sinusoid_table(length: int, d_model: int) -> np.ndarray:
    position = np.arange(length, dtype=np.float64)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64) * (-math.log(10000.0) / d_model)
    )
    table = np.zeros((length, d_model), dtype=np.float64)
    table[:, 0::2] = np.sin(position * div_term)
    table[:, 1::2] = np.cos(position * div_term[: (d_model + 1) // 2])
    return table.astype(np.float32)


def sinusoidal_positional_encoding(length: int, d_model: int, dtype=jnp.float32) -> jax.Array:
    """Classic (length, d_model) sinusoidal PE table."""
    return jnp.asarray(_sinusoid_table(length, d_model), dtype=dtype)


def periodic_positional_encoding(
    length: int, d_model: int, period: int, dtype=jnp.float32
) -> jax.Array:
    """Periodic positional encoding: the sinusoidal table of one ``period``
    tiled along time (FaceFormer's PPE,
    /root/reference/models/faceformer.py:87-102)."""
    table = _sinusoid_table(period, d_model)
    reps = length // period + 1
    return jnp.asarray(np.tile(table, (reps, 1))[:length], dtype=dtype)


def t5_relative_position_bucket(
    relative_position: jax.Array,
    num_buckets: int = 32,
    max_distance: int = 128,
) -> jax.Array:
    """Causal-style T5 relative-position bucketing, as used by the
    dalle2-style prior transformer's RelPosBias (num_buckets=32,
    max_distance=128). ``relative_position = k_pos - q_pos``.
    """
    n = jnp.maximum(-relative_position, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    # log-spaced buckets for larger distances
    n_f = jnp.maximum(n.astype(jnp.float32), 1.0)
    val_if_large = max_exact + (
        jnp.log(n_f / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return jnp.where(is_small, n, val_if_large)
