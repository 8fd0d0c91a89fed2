"""Shared KV-cached autoregressive decode for the FaceFormer family.

One ``lax.scan`` over frames against a fixed-size KV cache: O(T) new-token
work instead of the reference's O(T^2) full-prefix re-decode per frame
(/root/reference/models/faceformer.py:393-409,
faceformer_disentangle.py:459-478). Works on the raw param tree of
ops.transformer.TransformerDecoder (1 layer), with the diagonal audio
alignment mask reduced to a single-key lookup.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..ops.positional import NEG_INF, alibi_slopes, periodic_positional_encoding


def _lin(px, x):
    return x @ px["kernel"].astype(x.dtype) + px["bias"].astype(x.dtype)


def _ln(px, x, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * px["scale"].astype(x.dtype) + px[
        "bias"
    ].astype(x.dtype)


def _proj(attn_p, x, part):
    w = attn_p["in_proj_weight"].astype(x.dtype)
    b = attn_p["in_proj_bias"].astype(x.dtype)
    wq, wk, wv = jnp.split(w, 3, axis=0)
    bq, bk, bv = jnp.split(b, 3, axis=0)
    return {"q": x @ wq.T + bq, "k": x @ wk.T + bk, "v": x @ wv.T + bv}[part]


def ar_decode(
    layer_params,  # params of transformer_decoder/layers_0
    memory: jax.Array,  # (B, T, D) conditioned audio memory
    token0: jax.Array,  # (B, D) first input token (style/obj embedding)
    out_proj,  # params of the coeff/vertex head (Dense D -> out_dim)
    feedback_proj,  # params of the token map (Dense out_dim -> D)
    n_heads: int,
    period: int,
    style_emb: Optional[jax.Array] = None,  # (B, D) added to feedback tokens
    activation: Callable[[jax.Array], jax.Array] = jax.nn.relu,
) -> jax.Array:
    """Returns (B, T, out_dim) autoregressive outputs."""
    p = layer_params
    B, T, D = memory.shape
    H = n_heads
    hd = D // H

    sa, ca = p["self_attn"], p["multihead_attn"]
    mem_v = _proj(ca, memory, "v").reshape(B, T, H, hd)
    ppe = periodic_positional_encoding(T, D, period, memory.dtype)
    slopes = jnp.asarray(alibi_slopes(H), memory.dtype)
    scale = 1.0 / jnp.sqrt(jnp.asarray(hd, memory.dtype))
    j_idx = jnp.arange(T)

    def step(carry, i):
        token_emb, k_cache, v_cache = carry
        x = token_emb + ppe[i]
        q = _proj(sa, x, "q").reshape(B, H, hd)
        k_new = _proj(sa, x, "k").reshape(B, H, hd)
        v_new = _proj(sa, x, "v").reshape(B, H, hd)
        k_cache = jax.lax.dynamic_update_index_in_dim(k_cache, k_new, i, axis=1)
        v_cache = jax.lax.dynamic_update_index_in_dim(v_cache, v_new, i, axis=1)
        logits = jnp.einsum("bhd,bjhd->bhj", q * scale, k_cache)
        dist = jnp.maximum(i - j_idx, 0) // period
        logits = logits - slopes[None, :, None] * dist[None, None].astype(logits.dtype)
        logits = jnp.where((j_idx > i)[None, None], NEG_INF, logits)
        attn = jax.nn.softmax(logits, axis=-1)
        sa_out = jnp.einsum("bhj,bjhd->bhd", attn, v_cache).reshape(B, D)
        sa_out = _lin(
            {"kernel": sa["out_proj_weight"].astype(x.dtype).T,
             "bias": sa["out_proj_bias"]},
            sa_out,
        )
        x = _ln(p["norm1"], x + sa_out)
        # cross attention, diagonal alignment: single allowed key i ->
        # softmax weight 1 -> context = memory V_i
        v_i = jax.lax.dynamic_index_in_dim(mem_v, i, axis=1, keepdims=False)
        ca_out = _lin(
            {"kernel": ca["out_proj_weight"].astype(x.dtype).T,
             "bias": ca["out_proj_bias"]},
            v_i.reshape(B, D),
        )
        x = _ln(p["norm2"], x + ca_out)
        h = activation(_lin(p["linear1"], x))
        h = _lin(p["linear2"], h)
        x = _ln(p["norm3"], x + h)
        out = _lin(out_proj, x)
        next_token = _lin(feedback_proj, out)
        if style_emb is not None:
            next_token = next_token + style_emb
        return (next_token, k_cache, v_cache), out

    k0 = jnp.zeros((B, T, H, hd), memory.dtype)
    (_, _, _), outs = jax.lax.scan(step, (token0, k0, jnp.zeros_like(k0)), jnp.arange(T))
    return outs.transpose(1, 0, 2)
