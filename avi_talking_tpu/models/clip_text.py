"""CLIP text encoder (HF CLIPTextModel layout) in flax.linen.

Equivalent of ``FrozenCLIPEmbedder``
(/root/reference/models/diffusion_prior.py:30-55): tokenize on host with the
HF tokenizer (padding='max_length', 77 tokens), run the text tower, return
the last hidden state (B, 77, 768); the driver means over tokens
(train_diffusion_prior.py:439).

Architecture (openai/clip-vit-large-patch14 text tower): token + learned
position embeddings, 12 pre-LN layers (quick_gelu MLP), causal mask, final
LayerNorm. Weight import from the HF torch model via
``clip_text_params_from_torch`` (parity-tested on a tiny random config).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..infra.torch_compat import layernorm_params, linear_params, to_np


@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"

    @classmethod
    def tiny(cls) -> "ClipTextConfig":
        return cls(
            vocab_size=99, hidden_size=32, num_layers=2, num_heads=4,
            intermediate_size=64, max_position_embeddings=16,
        )


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    raise ValueError(name)


class ClipEncoderLayer(nn.Module):
    cfg: ClipTextConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, causal_bias: jax.Array) -> jax.Array:
        c = self.cfg
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        d, h = c.hidden_size, c.num_heads
        hd = d // h
        B, T = x.shape[:2]

        res = x
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm1", **dd)(x)
        q = nn.Dense(d, name="q_proj", **dd)(x) * (hd**-0.5)
        k = nn.Dense(d, name="k_proj", **dd)(x)
        v = nn.Dense(d, name="v_proj", **dd)(x)
        q = q.reshape(B, T, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, h, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32)
        logits = logits + causal_bias[None, None].astype(logits.dtype)
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        ctx = jnp.einsum("bhts,bhsd->bhtd", attn, v).transpose(0, 2, 1, 3).reshape(B, T, d)
        x = res + nn.Dense(d, name="out_proj", **dd)(ctx)

        res = x
        y = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm2", **dd)(x)
        y = nn.Dense(c.intermediate_size, name="fc1", **dd)(y)
        y = _act(c.hidden_act)(y)
        y = nn.Dense(d, name="fc2", **dd)(y)
        return res + y


class ClipTextModel(nn.Module):
    cfg: ClipTextConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> jax.Array:  # (B, T) int32
        c = self.cfg
        B, T = input_ids.shape
        tok = nn.Embed(
            c.vocab_size, c.hidden_size, dtype=self.dtype,
            param_dtype=self.param_dtype, name="token_embedding",
        )(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (c.max_position_embeddings, c.hidden_size),
            self.param_dtype,
        )
        x = tok + pos[None, :T].astype(self.dtype)

        i = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
        causal_bias = jnp.where(j > i, jnp.asarray(-1e9, jnp.float32), 0.0)

        for li in range(c.num_layers):
            x = ClipEncoderLayer(
                c, self.dtype, self.param_dtype, name=f"layers_{li}"
            )(x, causal_bias)
        return nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=self.dtype,
            param_dtype=self.param_dtype, name="final_layer_norm",
        )(x)


def clip_text_params_from_torch(
    sd: Mapping[str, Any], cfg: ClipTextConfig, prefix: str = "text_model."
) -> Dict[str, Any]:
    """HF CLIPTextModel state_dict -> ClipTextModel params."""
    p = prefix
    params: Dict[str, Any] = {
        "token_embedding": {
            "embedding": to_np(sd[f"{p}embeddings.token_embedding.weight"])
        },
        "position_embedding": to_np(sd[f"{p}embeddings.position_embedding.weight"]),
        "final_layer_norm": layernorm_params(sd, f"{p}final_layer_norm."),
    }
    for i in range(cfg.num_layers):
        lp = f"{p}encoder.layers.{i}."
        params[f"layers_{i}"] = {
            "layer_norm1": layernorm_params(sd, f"{lp}layer_norm1."),
            "layer_norm2": layernorm_params(sd, f"{lp}layer_norm2."),
            "q_proj": linear_params(sd, f"{lp}self_attn.q_proj."),
            "k_proj": linear_params(sd, f"{lp}self_attn.k_proj."),
            "v_proj": linear_params(sd, f"{lp}self_attn.v_proj."),
            "out_proj": linear_params(sd, f"{lp}self_attn.out_proj."),
            "fc1": linear_params(sd, f"{lp}mlp.fc1."),
            "fc2": linear_params(sd, f"{lp}mlp.fc2."),
        }
    return params
