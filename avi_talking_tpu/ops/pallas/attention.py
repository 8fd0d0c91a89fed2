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

Measured (v5e): at the small DECODER shape (B=8 H=8 T=608 d=64 fp32) XLA's
own fusion already wins (pallas 0.85 ms vs XLA 0.74 ms), so the generic
``fused_bias_attention`` stays OPT-IN
(``MultiHeadAttention(use_fused_kernel=True)``). At the wav2vec2 ENCODER
shape (B=16 H=12 T=552 d=64) the key-bias variant WINS — f32 1.50 ms vs
2.14 ms, bf16 1.27 ms vs 2.06 ms (1.4-1.6x) — because the only bias is a
per-batch (S,) padding mask that the kernel broadcasts in VMEM instead of
materialising (B, H, T, S). Inside the FULL wav2vec2 model at the common
serving shape (B=4, T=200) XLA's fusion with the surrounding projections
ties/wins again (8.2 vs 8.7 ms whole-model fwd), so ``keybias_attention``
(Pallas fwd + XLA bwd custom_vjp) is OPT-IN via
``Wav2Vec2Config.use_pallas_attention`` — enable for long-clip /
large-batch serving where the kernel's regime holds.
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


def _attn_kernel_keybias(q_ref, k_ref, v_ref, kb_ref, o_ref):
    """Like _attn_kernel but the bias is a per-batch (S,) key bias (padding
    mask), broadcast across rows INSIDE the kernel — no (B, H, T, S)
    materialisation in HBM. One (batch, head) per grid step, every op
    rank-2: the (1, S) -> (T, S) broadcast-add is the r2-measured proven
    pattern. (A head-batched rank-3 variant — batched dot_general +
    (1, 1, S) broadcast — SIGABRTs Mosaic's ApplyVectorLayoutPass on real
    TPU: vector_extract slice 69 vs dim 1 at T=S=552. An unrolled Hb-heads
    -per-step variant compiled but measured SLOWER at its target shape,
    B=4 T=200 H=12 d=64: 0.147 ms vs 0.097 ms hb=1 vs 0.074 ms XLA,
    chained RTT-cancelled timing, v5e — head-batching is retired.)"""
    q = q_ref[:]  # (T, d)
    k = k_ref[:]  # (S, d)
    v = v_ref[:]  # (S, d)
    kb = kb_ref[:]  # (1, S)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    scores = scores + kb.astype(jnp.float32)  # (T, S) + (1, S)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    weights = (e / denom).astype(v.dtype)
    o_ref[:] = jnp.dot(weights, v, preferred_element_type=jnp.float32).astype(
        o_ref.dtype
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_keybias_attention(
    q: jax.Array,  # (B, H, T, d), pre-scaled
    k: jax.Array,  # (B, H, S, d)
    v: jax.Array,  # (B, H, S, d)
    key_bias: jax.Array,  # (B, S) additive (0 / -1e9 padding mask)
    interpret: bool = False,
) -> jax.Array:
    """Fused attention for the wav2vec2-encoder case: the only bias is a
    per-batch key padding mask. One (batch, head) attention per grid step,
    fully VMEM-resident; the (T, S) score matrix never touches HBM and the
    mask is read as (S,) instead of a broadcast (B, H, T, S)."""
    B, H, T, d = q.shape
    S = k.shape[2]
    qf = q.reshape(B * H, T, d)
    kf = k.reshape(B * H, S, d)
    vf = v.reshape(B * H, S, d)
    kb = key_bias.reshape(B, 1, S)

    out = pl.pallas_call(
        _attn_kernel_keybias,
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((None, T, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, S, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, S, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, S), lambda i, H=H: (i // H, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, T, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, T, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, kb)
    return out.reshape(B, H, T, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def keybias_attention(q, k, v, key_bias, interpret=False):
    """Differentiable fused attention with a per-batch (B, S) key bias:
    Pallas forward (the (T, S) scores never touch HBM), standard XLA
    backward (recompute). Wins 1.4-1.6x over the XLA forward at the
    wav2vec2-encoder shape (B=16 H=12 T=552 d=64, v5e: f32 1.50 ms vs
    2.14 ms; bf16 1.27 ms vs 2.06 ms) — the runtime hot spot #2 of the
    serving path (SURVEY.md §3.1)."""
    return fused_keybias_attention(q, k, v, key_bias, interpret=interpret)


def _keybias_fwd(q, k, v, key_bias, interpret=False):
    out = fused_keybias_attention(q, k, v, key_bias, interpret=interpret)
    return out, (q, k, v, key_bias)


def _keybias_bwd(interpret, res, do):
    q, k, v, key_bias = res
    s = jax.lax.dot_general(
        q, k, (((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )  # (B, H, T, S)
    s = s + key_bias[:, None, None, :].astype(jnp.float32)
    w = jax.nn.softmax(s, axis=-1)
    do32 = do.astype(jnp.float32)
    dv = jnp.einsum("bhts,bhtd->bhsd", w, do32)
    dw = jnp.einsum("bhtd,bhsd->bhts", do32, v.astype(jnp.float32))
    ds = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
    dq = jnp.einsum("bhts,bhsd->bhtd", ds, k.astype(jnp.float32))
    dk = jnp.einsum("bhts,bhtd->bhsd", ds, q.astype(jnp.float32))
    dkb = jnp.sum(ds, axis=(1, 2))  # (B, S)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dkb.astype(key_bias.dtype))


keybias_attention.defvjp(_keybias_fwd, _keybias_bwd)


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
