"""Torch-parity transformer blocks in flax.linen.

The reference's decoders are built from ``torch.nn.TransformerEncoder`` /
``TransformerDecoder`` layers (post-LayerNorm, packed-QKV multi-head
attention): EMOTE's BertPriorDecoder
(/root/reference/third_party/inferno/inferno/models/talkinghead/FaceFormerDecoder.py:995-1002),
the FLINT decoder transformer
(/root/reference/third_party/inferno/inferno/models/temporal/motion_prior/L2lMotionPrior.py:390-398)
and the stage-1 FaceFormer decoder (/root/reference/models/faceformer.py:148-149).

These linen modules reproduce torch's numerics exactly (verified by the
parity tests in tests/test_transformer_parity.py against torch CPU) while
remaining pure functions of their parameters — jit/pjit/scan-compatible, and
laid out so the packed QKV projection is one MXU matmul.

Masks are additive float biases (0 = keep, -1e9 = drop), shaped (T, S),
(H, T, S) or (B, H, T, S); torch boolean masks translate to 0/-inf biases.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def _merge_bias(bias: Optional[jax.Array], batch: int, heads: int, t: int, s: int):
    if bias is None:
        return None
    if bias.ndim == 2:
        bias = bias[None, None]
    elif bias.ndim == 3:
        bias = bias[None]
    return jnp.broadcast_to(bias, (batch, heads, t, s))


class MultiHeadAttention(nn.Module):
    """torch.nn.MultiheadAttention-compatible attention (batch_first).

    Parameters are stored packed exactly like torch: ``in_proj`` is one
    (3*D, D) matrix (a single MXU matmul for self-attention) and ``out_proj``
    is (D, D). ``torch_import`` in infra/checkpoint.py maps state dicts 1:1.
    """

    embed_dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_fused_kernel: bool = False  # Pallas fused attention (TPU only)

    @nn.compact
    def __call__(
        self,
        query: jax.Array,  # (B, T, D)
        key: jax.Array,  # (B, S, D)
        value: jax.Array,  # (B, S, D)
        bias: Optional[jax.Array] = None,  # additive, broadcastable to (B,H,T,S)
        deterministic: bool = True,
    ) -> jax.Array:
        d, h = self.embed_dim, self.num_heads
        head_dim = d // h
        assert head_dim * h == d, "embed_dim must be divisible by num_heads"

        in_proj_w = self.param(
            "in_proj_weight",
            nn.initializers.xavier_uniform(),
            (3 * d, d),
            self.param_dtype,
        ).astype(self.dtype)
        in_proj_b = self.param(
            "in_proj_bias", nn.initializers.zeros, (3 * d,), self.param_dtype
        ).astype(self.dtype)

        if query is key and key is value:
            qkv = query @ in_proj_w.T + in_proj_b
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            wq, wk, wv = jnp.split(in_proj_w, 3, axis=0)
            bq, bk, bv = jnp.split(in_proj_b, 3, axis=0)
            q = query @ wq.T + bq
            k = key @ wk.T + bk
            v = value @ wv.T + bv

        b, t = q.shape[0], q.shape[1]
        s = k.shape[1]
        q = q.reshape(b, t, h, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, h, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, h, head_dim).transpose(0, 2, 1, 3)

        scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, self.dtype))
        if self.use_fused_kernel:
            from .pallas.attention import fused_bias_attention

            merged = _merge_bias(bias, b, h, t, s)
            if merged is None:
                merged = jnp.zeros((1, 1, t, s), self.dtype)
            out = fused_bias_attention(q * scale, k, v, merged)
        else:
            logits = jnp.einsum(
                "bhtd,bhsd->bhts", q * scale, k, preferred_element_type=jnp.float32
            )
            merged = _merge_bias(bias, b, h, t, s)
            if merged is not None:
                logits = logits + merged.astype(logits.dtype)
            weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhts,bhsd->bhtd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, d)

        out_w = self.param(
            "out_proj_weight",
            nn.initializers.xavier_uniform(),
            (d, d),
            self.param_dtype,
        ).astype(self.dtype)
        out_b = self.param(
            "out_proj_bias", nn.initializers.zeros, (d,), self.param_dtype
        ).astype(self.dtype)
        return out @ out_w.T + out_b


def _activation(name: str) -> Callable[[jax.Array], jax.Array]:
    if name == "relu":
        return jax.nn.relu
    if name == "gelu":
        # torch F.gelu default is the exact (erf) form
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "leaky_relu":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=0.2)
    raise ValueError(f"unknown activation {name!r}")


class TransformerEncoderLayer(nn.Module):
    """Post-LN torch.nn.TransformerEncoderLayer equivalent (batch_first)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    activation: str = "relu"
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        bias: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        attn = MultiHeadAttention(
            self.d_model, self.nhead, self.dtype, self.param_dtype, name="self_attn"
        )(x, x, x, bias, deterministic)
        attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype, name="norm1")(
            x + attn
        )
        h = nn.Dense(
            self.dim_feedforward,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="linear1",
        )(x)
        h = _activation(self.activation)(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        h = nn.Dense(
            self.d_model, dtype=self.dtype, param_dtype=self.param_dtype, name="linear2"
        )(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype, name="norm2")(
            x + h
        )


class TransformerEncoder(nn.Module):
    """Stack of post-LN encoder layers (torch.nn.TransformerEncoder)."""

    num_layers: int
    d_model: int
    nhead: int
    dim_feedforward: int
    activation: str = "relu"
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        bias: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.d_model,
                self.nhead,
                self.dim_feedforward,
                self.activation,
                self.dropout_rate,
                self.dtype,
                self.param_dtype,
                name=f"layers_{i}",
            )(x, bias, deterministic)
        return x


class TransformerDecoderLayer(nn.Module):
    """Post-LN torch.nn.TransformerDecoderLayer equivalent (batch_first).

    Self-attention over the target with ``tgt_bias`` plus cross-attention to
    ``memory`` with ``memory_bias`` — the stage-1 FaceFormer decode step
    (/root/reference/models/faceformer.py:148-149 uses one such layer).
    """

    d_model: int
    nhead: int
    dim_feedforward: int
    activation: str = "relu"
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        tgt: jax.Array,
        memory: jax.Array,
        tgt_bias: Optional[jax.Array] = None,
        memory_bias: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        sa = MultiHeadAttention(
            self.d_model, self.nhead, self.dtype, self.param_dtype, name="self_attn"
        )(tgt, tgt, tgt, tgt_bias, deterministic)
        sa = nn.Dropout(self.dropout_rate)(sa, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype, name="norm1")(
            tgt + sa
        )
        ca = MultiHeadAttention(
            self.d_model, self.nhead, self.dtype, self.param_dtype, name="multihead_attn"
        )(x, memory, memory, memory_bias, deterministic)
        ca = nn.Dropout(self.dropout_rate)(ca, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype, name="norm2")(
            x + ca
        )
        h = nn.Dense(
            self.dim_feedforward,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="linear1",
        )(x)
        h = _activation(self.activation)(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        h = nn.Dense(
            self.d_model, dtype=self.dtype, param_dtype=self.param_dtype, name="linear2"
        )(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype, name="norm3")(
            x + h
        )


class TransformerDecoder(nn.Module):
    """Stack of post-LN decoder layers (torch.nn.TransformerDecoder)."""

    num_layers: int
    d_model: int
    nhead: int
    dim_feedforward: int
    activation: str = "relu"
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        tgt: jax.Array,
        memory: jax.Array,
        tgt_bias: Optional[jax.Array] = None,
        memory_bias: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        for i in range(self.num_layers):
            tgt = TransformerDecoderLayer(
                self.d_model,
                self.nhead,
                self.dim_feedforward,
                self.activation,
                self.dropout_rate,
                self.dtype,
                self.param_dtype,
                name=f"layers_{i}",
            )(tgt, memory, tgt_bias, memory_bias, deterministic)
        return tgt
