"""Pallas TPU kernel: fused biased attention for the decoder stacks.

The talking-head decoders run many small attention calls (T <= 600/1200,
head_dim 32/64) whose XLA lowering materialises the (T, T) score matrix in
HBM between matmul/softmax/matmul. This kernel keeps one (head, batch)
attention entirely in VMEM: scores -> +bias -> numerically-stable softmax ->
context in a single fused pass (one HBM read per operand, one write).

Sizes: T=608, d=64 needs ~3 x 160 KB operands + 1.5 MB scores in VMEM —
comfortably under the ~16 MB/core budget, so a single-block kernel per
(batch*head) grid step is the right shape; no K/V streaming needed at these
sequence lengths.

Falls back to the XLA path automatically off-TPU (interpret mode in tests).

Measured (v5e, B=8 H=8 T=608 d=64 fp32): pallas 0.85 ms vs XLA 0.74 ms —
XLA's own fusion already keeps this shape VMEM-resident, so the kernel is
OPT-IN (``MultiHeadAttention(use_fused_kernel=True)``), kept as the
foundation for shapes XLA handles worse (very long S with streamed K/V,
quantised K/V) rather than as a default win.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_available() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
    q = q_ref[:]  # (T, d)
    k = k_ref[:]  # (S, d)
    v = v_ref[:]  # (S, d)
    bias = bias_ref[:]  # (T, S)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    scores = scores + bias.astype(jnp.float32)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    weights = (e / denom).astype(v.dtype)
    o_ref[:] = jnp.dot(weights, v, preferred_element_type=jnp.float32).astype(
        o_ref.dtype
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_bias_attention(
    q: jax.Array,  # (B, H, T, d), pre-scaled
    k: jax.Array,  # (B, H, S, d)
    v: jax.Array,  # (B, H, S, d)
    bias: jax.Array,  # (B, H, T, S) additive
    interpret: bool = False,
) -> jax.Array:
    B, H, T, d = q.shape
    S = k.shape[2]
    qf = q.reshape(B * H, T, d)
    kf = k.reshape(B * H, S, d)
    vf = v.reshape(B * H, S, d)
    bf = jnp.broadcast_to(bias, (B, H, T, S)).reshape(B * H, T, S)

    out = pl.pallas_call(
        _attn_kernel,
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((None, T, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, S, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, S, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, T, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, T, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, T, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, bf)
    return out.reshape(B, H, T, d)
