"""Video-level emotion recognition + loss (EMOTE's video-emotion term).

Equivalent of inferno's VideoEmotionClassifier stack used by EMOTE training
(inferno/models/video_emorec/VideoEmotionClassifier.py; wired as a loss in
inferno FaceFormer.py's neural losses): per-frame emotion features (from the
image-based EmotionRecognitionModule) -> transformer encoder over time ->
sequence-level expression logits. The loss compares the video-level emotion
of rendered predictions to ground-truth video emotion (logits or labels).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.positional import sinusoidal_positional_encoding
from ..ops.transformer import TransformerEncoder


class VideoEmotionClassifier(nn.Module):
    """(B, T, feat) per-frame emotion features -> (B, n_classes) logits."""

    n_classes: int = 8
    feature_dim: int = 256
    num_layers: int = 2
    nhead: int = 8
    input_dim: int = 2048  # emo_feat_2 width
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: jax.Array, deterministic: bool = True) -> jax.Array:
        x = nn.Dense(self.feature_dim, dtype=self.dtype, name="in_proj")(feats)
        x = x + sinusoidal_positional_encoding(
            x.shape[1], self.feature_dim, self.dtype
        )[None]
        x = TransformerEncoder(
            num_layers=self.num_layers, d_model=self.feature_dim,
            nhead=self.nhead, dim_feedforward=self.feature_dim * 2,
            activation="gelu", dtype=self.dtype, name="encoder",
        )(x, deterministic=deterministic)
        pooled = x.mean(axis=1)
        return nn.Dense(self.n_classes, dtype=self.dtype, name="classifier")(pooled)


@dataclasses.dataclass
class VideoEmotionLoss:
    """Cross-entropy to GT labels or KL to GT video logits (EMOTE's options)."""

    classifier: VideoEmotionClassifier
    variables: Dict

    def __call__(
        self,
        frame_features: jax.Array,  # (B, T, input_dim) from rendered frames
        gt_label: Optional[jax.Array] = None,  # (B,) int
        gt_logits: Optional[jax.Array] = None,  # (B, n_classes)
    ) -> jax.Array:
        logits = self.classifier.apply(self.variables, frame_features)
        if gt_logits is not None:
            p_gt = jax.nn.softmax(jax.lax.stop_gradient(gt_logits), axis=-1)
            return -(p_gt * jax.nn.log_softmax(logits, axis=-1)).sum(-1).mean()
        assert gt_label is not None
        onehot = jax.nn.one_hot(gt_label, logits.shape[-1])
        return -(onehot * jax.nn.log_softmax(logits, axis=-1)).sum(-1).mean()
