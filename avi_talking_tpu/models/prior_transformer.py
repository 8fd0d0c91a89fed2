"""DALLE2-style diffusion-prior denoiser network.

Equivalent of ``VersatileDiffusionPriorNetwork`` + ``FlaggedCausalTransformer``
(/root/reference/models/diffusion_prior.py:119-313), which are built from
dalle2_pytorch primitives. dalle2_pytorch is not vendored by the reference,
so the primitives are re-derived here from their published semantics:

  * lucidrains LayerNorm: gamma-only, biased variance; "stable" variant
    divides by amax first,
  * Attention: input-LN, multi-query (single-head K/V), 2 learned null KV
    tokens, partial rotary embedding (rot_dim = min(32, dim_head)), cosine-sim
    attention with scale 16, output Linear (no bias) + LayerNorm,
  * FeedForward: LN -> Dense(2*inner, no bias) -> GEGLU -> Dense(dim, no bias),
  * T5-style relative position bias over (n, n+1) with 32 buckets/max-dist 128,
  * token layout: [brain_embed(1), time_embed(1), image_embed(1)+learned
    pos-emb]; prediction = last ``num_tokens`` outputs,
  * classifier-free guidance via learned null embeds and bernoulli keep masks.

The whole net is ~0.9 M params on dim=128; a full 100-step DDPM sample loop
jits into one `lax.scan` (see models/diffusion.py) — the reference runs the
same loop in python at ~100 dispatches/sample (train_diffusion_prior.py:357).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.positional import t5_relative_position_bucket


def l2norm(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    # torch F.normalize semantics: x / max(||x||, eps)
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


class LucidLayerNorm(nn.Module):
    """Gamma-only LayerNorm with biased variance (dalle2_pytorch.LayerNorm)."""

    dim: int
    stable: bool = False
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        g = self.param("g", nn.initializers.ones, (self.dim,), self.param_dtype)
        if self.stable:
            x = x / jax.lax.stop_gradient(jnp.max(x, axis=-1, keepdims=True))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * g.astype(x.dtype)


def sinusoidal_time_embedding(t: jax.Array, dim: int) -> jax.Array:
    """dalle2 SinusoidalPosEmb: (B,) -> (B, dim), cat[sin, cos]."""
    half = dim // 2
    emb = math.log(10000.0) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class TimeEmbedMLP(nn.Module):
    """dalle2 MLP(dim, dim_out): depth-2, SiLU, expansion 2 (on dim_out)."""

    dim: int
    dim_out: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        hidden = int(2 * self.dim_out)
        x = sinusoidal_time_embedding(t, self.dim).astype(self.dtype)
        x = nn.Dense(hidden, name="dense0", **dd)(x)
        x = jax.nn.silu(x)
        x = nn.Dense(hidden, name="dense1", **dd)(x)
        x = jax.nn.silu(x)
        return nn.Dense(self.dim_out, name="dense_out", **dd)(x)


class RelPosBias(nn.Module):
    """T5 relative position bias (heads, i, j)."""

    heads: int
    num_buckets: int = 32
    max_distance: int = 128
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, i: int, j: int) -> jax.Array:
        emb = self.param(
            "relative_attention_bias",
            nn.initializers.normal(1.0),
            (self.num_buckets, self.heads),
            self.param_dtype,
        )
        q_pos = jnp.arange(i)[:, None]
        k_pos = jnp.arange(j)[None, :]
        buckets = t5_relative_position_bucket(
            k_pos - q_pos, self.num_buckets, self.max_distance
        )
        return emb[buckets].transpose(2, 0, 1)  # (h, i, j)


def _rotary_freqs(seq_len: int, rot_dim: int) -> jax.Array:
    inv = 1.0 / (10000.0 ** (jnp.arange(0, rot_dim, 2, dtype=jnp.float32) / rot_dim))
    t = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = t[:, None] * inv[None]
    return jnp.concatenate([freqs, freqs], axis=-1)  # (T, rot_dim)


def _apply_rotary(pos: jax.Array, x: jax.Array) -> jax.Array:
    """NeoX-style rotary on the first rot_dim channels of x (..., T, d)."""
    rot_dim = pos.shape[-1]
    xr, xp = x[..., :rot_dim], x[..., rot_dim:]
    half = rot_dim // 2
    x1, x2 = xr[..., :half], xr[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    xr = xr * jnp.cos(pos) + rotated * jnp.sin(pos)
    return jnp.concatenate([xr, xp], axis=-1)


class PriorAttention(nn.Module):
    """dalle2 Attention: MQA + null KV + cosine-sim + partial rotary."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    causal: bool = False
    cosine_sim_scale: float = 16.0
    rotary: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, attn_bias: Optional[jax.Array] = None) -> jax.Array:
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        B, T, _ = x.shape
        h, dh = self.heads, self.dim_head
        x = LucidLayerNorm(self.dim, name="norm", dtype=self.dtype,
                           param_dtype=self.param_dtype)(x)
        q = nn.Dense(h * dh, use_bias=False, name="to_q", **dd)(x)
        kv = nn.Dense(2 * dh, use_bias=False, name="to_kv", **dd)(x)
        k, v = jnp.split(kv, 2, axis=-1)  # (B, T, dh) single-head

        q = q.reshape(B, T, h, dh).transpose(0, 2, 1, 3)  # (B, h, T, dh)
        # (scale then rotary then l2norm, matching dalle2 op order; the
        # pre-normalisation q*scale is a no-op under cosine-sim but kept)
        q = q * (dh ** -0.5)
        if self.rotary:
            pos = _rotary_freqs(T, min(32, dh)).astype(self.dtype)
            q = _apply_rotary(pos, q)
            k = _apply_rotary(pos, k)

        null_kv = self.param(
            "null_kv", nn.initializers.normal(1.0), (2, dh), self.param_dtype
        ).astype(self.dtype)
        nk = jnp.broadcast_to(null_kv[0][None, None], (B, 1, dh))
        nv = jnp.broadcast_to(null_kv[1][None, None], (B, 1, dh))
        k = jnp.concatenate([nk, k], axis=1)  # (B, T+1, dh)
        v = jnp.concatenate([nv, v], axis=1)

        q = l2norm(q) * math.sqrt(self.cosine_sim_scale)
        k = l2norm(k) * math.sqrt(self.cosine_sim_scale)

        sim = jnp.einsum("bhtd,bsd->bhts", q, k, preferred_element_type=jnp.float32)
        if attn_bias is not None:
            sim = sim + attn_bias[None].astype(sim.dtype)
        if self.causal:
            i = jax.lax.broadcasted_iota(jnp.int32, (T, T + 1), 0)
            j = jax.lax.broadcasted_iota(jnp.int32, (T, T + 1), 1)
            causal_mask = j > i + 1  # column 0 is the null token
            sim = jnp.where(causal_mask[None, None], -jnp.inf, sim)
        attn = jax.nn.softmax(sim, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhts,bsd->bhtd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, h * dh)
        out = nn.Dense(self.dim, use_bias=False, name="to_out", **dd)(out)
        return LucidLayerNorm(self.dim, name="out_norm", dtype=self.dtype,
                              param_dtype=self.param_dtype)(out)


class PriorFeedForward(nn.Module):
    """dalle2 FeedForward: LN -> Dense(2*inner) -> GEGLU -> Dense(dim)."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        inner = int(self.mult * self.dim)
        x = LucidLayerNorm(self.dim, name="norm", dtype=self.dtype,
                           param_dtype=self.param_dtype)(x)
        x = nn.Dense(inner * 2, use_bias=False, name="dense_in", **dd)(x)
        a, gate = jnp.split(x, 2, axis=-1)
        x = a * jax.nn.gelu(gate, approximate=False)
        return nn.Dense(self.dim, use_bias=False, name="dense_out", **dd)(x)


class PriorCausalTransformer(nn.Module):
    """FlaggedCausalTransformer (diffusion_prior.py:119-166): rel-pos bias,
    residual attn/ff stack, stable LN out, final projection."""

    dim: int
    depth: int = 6
    heads: int = 8
    dim_head: int = 64
    causal: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        T = x.shape[1]
        attn_bias = RelPosBias(self.heads, name="rel_pos_bias",
                               param_dtype=self.param_dtype)(T, T + 1)
        for i in range(self.depth):
            x = PriorAttention(
                self.dim, self.heads, self.dim_head, causal=self.causal,
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"attn_{i}",
            )(x, attn_bias) + x
            x = PriorFeedForward(
                self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"ff_{i}",
            )(x) + x
        x = LucidLayerNorm(self.dim, stable=True, name="norm_out",
                           dtype=self.dtype, param_dtype=self.param_dtype)(x)
        return nn.Dense(self.dim, use_bias=False, name="project_out",
                        dtype=self.dtype, param_dtype=self.param_dtype)(x)


class PriorTransformerNetwork(nn.Module):
    """VersatileDiffusionPriorNetwork equivalent (learned_query_mode='pos_emb').

    ``__call__(image_embed (B, n, D), t (B,), text_embed (B, n, D) | (B, D),
    keep_rng, brain_cond_drop_prob, image_cond_drop_prob)`` -> x0-hat (B, n, D).
    """

    dim: int = 128
    num_tokens: int = 1
    depth: int = 6
    heads: int = 8
    dim_head: int = 64
    causal: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        image_embed: jax.Array,
        diffusion_timesteps: jax.Array,
        text_embed: jax.Array,
        brain_cond_drop_prob: float = 0.0,
        image_cond_drop_prob: float = 0.0,
        keep_rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        B = image_embed.shape[0]
        n = self.num_tokens
        image_embed = image_embed.reshape(B, -1, self.dim)
        brain_embed = text_embed.reshape(B, -1, self.dim)

        null_brain = self.param(
            "null_brain_embeds", nn.initializers.normal(1.0), (n, self.dim),
            self.param_dtype,
        ).astype(image_embed.dtype)
        null_image = self.param(
            "null_image_embed", nn.initializers.normal(1.0), (n, self.dim),
            self.param_dtype,
        ).astype(image_embed.dtype)
        learned_query = self.param(
            "learned_query", nn.initializers.normal(self.dim ** -0.5), (n, self.dim),
            self.param_dtype,
        ).astype(image_embed.dtype)

        # classifier-free guidance: prob 1.0 = deterministic null (inference
        # unconditional pass), prob in (0,1) = bernoulli keep mask (training)
        if brain_cond_drop_prob >= 1.0:
            brain_embed = jnp.broadcast_to(null_brain[None], brain_embed.shape)
        if image_cond_drop_prob >= 1.0:
            image_embed = jnp.broadcast_to(null_image[None], image_embed.shape)
        stochastic = (0.0 < brain_cond_drop_prob < 1.0) or (
            0.0 < image_cond_drop_prob < 1.0
        )
        if stochastic:
            assert keep_rng is not None, "dropout of conditions requires keep_rng"
            rb, ri = jax.random.split(keep_rng)
            if 0.0 < brain_cond_drop_prob < 1.0:
                brain_keep = jax.random.uniform(rb, (B, 1, 1)) >= brain_cond_drop_prob
                brain_embed = jnp.where(brain_keep, brain_embed, null_brain[None])
            if 0.0 < image_cond_drop_prob < 1.0:
                image_keep = jax.random.uniform(ri, (B, 1, 1)) >= image_cond_drop_prob
                image_embed = jnp.where(image_keep, image_embed, null_image[None])

        time_embed = TimeEmbedMLP(
            self.dim, self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="to_time_embeds",
        )(diffusion_timesteps)[:, None]  # (B, 1, D)

        image_embed = image_embed + learned_query[None]  # 'pos_emb' mode
        tokens = jnp.concatenate([brain_embed, time_embed, image_embed], axis=1)
        tokens = PriorCausalTransformer(
            self.dim, self.depth, self.heads, self.dim_head, causal=self.causal,
            dtype=self.dtype, param_dtype=self.param_dtype, name="causal_transformer",
        )(tokens)
        return tokens[:, -n:, :]

    def forward_with_cond_scale(
        self, params, image_embed, t, text_embed, cond_scale: float = 1.0
    ) -> jax.Array:
        logits = self.apply(params, image_embed, t, text_embed)
        if cond_scale == 1.0:
            return logits
        null_logits = self.apply(
            params, image_embed, t, text_embed,
            brain_cond_drop_prob=1.0, image_cond_drop_prob=1.0,
        )
        return null_logits + (logits - null_logits) * cond_scale
