"""Lip-reading feature network + consistency loss (EMOTE's lip-reading term).

Equivalent of the lip-reading loss in EMOTE training (inferno FaceFormer.py
neural losses; inferno/models/temporal/external/LipReadingLoss using the
spatio-temporal front-end of a pretrained visual-speech model): grayscale
mouth crops -> 3D conv front-end -> ResNet-style trunk -> per-frame visual
speech features; the loss matches predicted-render features to ground-truth
video features. Weights are the reference's external download; the
architecture is the standard lipreading front-end (Ma et al.) so imported
checkpoints map onto it.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn


class LipReadingNet(nn.Module):
    """(B, T, H, W, 1) mouth crops in [0,1] -> (B, T, feature_dim)."""

    feature_dim: int = 512
    width: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, crops: jax.Array, train: bool = False) -> jax.Array:
        B, T = crops.shape[:2]
        # 3D conv front-end: temporal kernel 5, spatial stride 2 (standard
        # visual-speech stem)
        x = nn.Conv(
            self.width, (5, 7, 7), strides=(1, 2, 2), padding=((2, 2), (3, 3), (3, 3)),
            use_bias=False, dtype=self.dtype, name="frontend3d",
        )(crops)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="frontend_bn")(x)
        x = jax.nn.relu(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding=((0, 0), (1, 1), (1, 1)))
        # fold time into batch for the 2D trunk
        _, _, H, W, C = x.shape
        h = x.reshape(B * T, H, W, C)
        for i, ch in enumerate((self.width, self.width * 2, self.width * 4)):
            h = nn.Conv(ch, (3, 3), strides=(2, 2) if i > 0 else (1, 1),
                        padding=1, use_bias=False, dtype=self.dtype,
                        name=f"trunk{i}_conv")(h)
            h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                             name=f"trunk{i}_bn")(h)
            h = jax.nn.relu(h)
        feat = h.mean(axis=(1, 2))  # global average pool
        feat = nn.Dense(self.feature_dim, dtype=self.dtype, name="proj")(feat)
        return feat.reshape(B, T, self.feature_dim)


@dataclasses.dataclass
class LipReadingLoss:
    """Feature-distance between predicted and GT mouth-crop sequences
    (inferno LipReadingLoss semantics: distance on the per-frame visual
    speech features, GT side stop-gradiented)."""

    net: LipReadingNet
    variables: Dict
    metric: str = "cosine"  # cosine | l2

    def __call__(self, pred_crops: jax.Array, gt_crops: jax.Array) -> jax.Array:
        fp = self.net.apply(self.variables, pred_crops)
        fg = jax.lax.stop_gradient(self.net.apply(self.variables, gt_crops))
        if self.metric == "l2":
            return jnp.mean((fp - fg) ** 2)
        fp_n = fp / jnp.maximum(jnp.linalg.norm(fp, axis=-1, keepdims=True), 1e-8)
        fg_n = fg / jnp.maximum(jnp.linalg.norm(fg, axis=-1, keepdims=True), 1e-8)
        return (1.0 - (fp_n * fg_n).sum(-1)).mean()
