"""Feed-forward sequence-decoder family (EMOTE ablation decoders).

The reference's FeedForwardDecoder subclasses
(inferno/models/talkinghead/FaceFormerDecoder.py:584-1224): LinearDecoder
:705, MLPDecoder :722, BertDecoder :742 (with the 'post_bug_fix' switch and
optional faceformer temporal bias), FlameBertDecoder :812 (exp+jaw heads +
FLAME decode). The EMOTE default (BertPriorDecoder) lives in
models/emote.py; these cover the remaining configs so ablation checkpoints
can be reproduced. Style handling matches ``_style`` (:652-682): 'add',
'cat', 'none', or 'style_only' with a 128-d embedding.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.flame import FlameAssets, FlameModel
from ..ops.positional import faceformer_bias
from ..ops.transformer import TransformerEncoder


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    kind: str = "bert"  # linear | mlp | bert | flame_bert
    feature_dim: int = 128
    vertices_dim: int = 15069
    nhead: int = 8
    num_layers: int = 1
    activation: str = "gelu"
    style_op: str = "add"
    post_bug_fix: bool = True  # False reproduces the reference's legacy path
    temporal_bias_type: str = "none"  # none | faceformer
    period: int = 30
    mlp_hidden_layers: int = 2
    # flame_bert:
    n_exp: int = 50
    predict_jaw: bool = True


class FeedForwardDecoder(nn.Module):
    """hidden (B, T, D) + style (B, D) -> offsets/coeffs (B, T, out)."""

    cfg: DecoderConfig
    flame_assets: Optional[FlameAssets] = None
    dtype: jnp.dtype = jnp.float32

    def _styled(self, hidden: jax.Array, style_emb: Optional[jax.Array]) -> jax.Array:
        c = self.cfg
        if style_emb is None or c.style_op == "none":
            return hidden
        if style_emb.ndim == 2:
            style_emb = style_emb[:, None]
        if c.style_op == "add":
            return hidden + style_emb
        if c.style_op == "cat":
            return jnp.concatenate(
                [hidden, jnp.broadcast_to(style_emb, hidden.shape)], axis=-1
            )
        if c.style_op == "style_only":
            return jnp.broadcast_to(style_emb, hidden.shape)
        raise ValueError(c.style_op)

    def _out_dim(self) -> int:
        c = self.cfg
        if c.kind == "flame_bert":
            return c.n_exp + (3 if c.predict_jaw else 0)
        return c.vertices_dim

    @nn.compact
    def __call__(
        self,
        hidden: jax.Array,  # (B, T, D) encoded audio features
        style_emb: Optional[jax.Array] = None,
        deterministic: bool = True,
    ):
        c = self.cfg
        x = self._styled(hidden, style_emb)
        d = x.shape[-1]
        head = nn.Dense(
            self._out_dim(), kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, dtype=self.dtype, name="decoder",
        )
        if c.kind == "linear":
            out = head(x)
        elif c.kind == "mlp":
            h = x
            for i in range(c.mlp_hidden_layers):
                h = nn.Dense(d, dtype=self.dtype, name=f"mlp_{i}")(h)
                h = jax.nn.leaky_relu(h, negative_slope=0.01)
            out = head(h)
        elif c.kind in ("bert", "flame_bert"):
            bias = None
            if c.temporal_bias_type == "faceformer":
                bias = faceformer_bias(c.nhead, x.shape[1], c.period,
                                       dtype=jnp.float32)
            enc = TransformerEncoder(
                num_layers=c.num_layers, d_model=d, nhead=c.nhead,
                dim_feedforward=d, activation=c.activation, dtype=self.dtype,
                name="bert_decoder",
            )(x, bias, deterministic=deterministic)
            # the reference's "INSANE BUG" legacy switch: pre-fix checkpoints
            # fed the *styled inputs* to the head (FaceFormerDecoder.py:801-808)
            out = head(enc if c.post_bug_fix else x)
        else:
            raise ValueError(c.kind)

        if c.kind != "flame_bert":
            return {"offsets": out}
        exp = out[..., : c.n_exp]
        jaw = out[..., c.n_exp :] if c.predict_jaw else jnp.zeros(
            out.shape[:-1] + (3,), out.dtype
        )
        result = {"exp": exp, "jaw": jaw}
        if self.flame_assets is not None:
            B, T = exp.shape[:2]
            flame = FlameModel(self.flame_assets,
                               n_shape=self.flame_assets.shapedirs.shape[-1] - c.n_exp,
                               n_exp=c.n_exp)
            pose = jnp.concatenate([jnp.zeros_like(jaw), jaw], axis=-1)
            verts = flame.vertices_only(
                jnp.zeros((B * T, flame.n_shape), exp.dtype),
                exp.reshape(B * T, -1), pose.reshape(B * T, -1),
            ).reshape(B, T, -1, 3)
            result["vertices"] = verts
        return result
