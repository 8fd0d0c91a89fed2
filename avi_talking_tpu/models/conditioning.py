"""Style conditioning for the EMOTE-style talking head.

``EmotionStyleEncoder`` is the LinearEmotionCondition equivalent
(/root/reference/third_party/inferno/inferno/models/talkinghead/FaceFormerDecoder.py:128-267):
concat one-hot [expression(8), intensity(3), identity(n_identities)] plus the
300-d shape code -> Linear -> 128-d style embedding. This 128-d space is what
the diffusion prior regresses (the ``only_style_emb`` early-return path,
FaceFormerDecoder.py:598-601).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

AFFECTNET_EMOTIONS = (
    "Neutral", "Happy", "Sad", "Surprise", "Fear", "Disgust", "Anger", "Contempt",
)


@dataclasses.dataclass(frozen=True)
class StyleCondition:
    """One sample's style condition (host-built, like create_condition,
    evaluation_functions.py:39-57)."""

    expression: jax.Array  # (B, n_expression) one-hot (or (B, T, n))
    intensity: jax.Array  # (B, n_intensities)
    identity: jax.Array  # (B, n_identities)
    shape: Optional[jax.Array] = None  # (B, shape_dim)

    @classmethod
    def make(
        cls,
        emotion_idx: int = 0,
        intensity_idx: int = 2,
        identity_idx: int = 0,
        batch: int = 1,
        n_expression: int = 8,
        n_intensities: int = 3,
        n_identities: int = 32,
        shape_dim: Optional[int] = 300,
    ) -> "StyleCondition":
        def onehot(i, n):
            return jnp.tile(jax.nn.one_hot(jnp.asarray([i]), n), (batch, 1))

        return cls(
            expression=onehot(emotion_idx, n_expression),
            intensity=onehot(intensity_idx, n_intensities),
            identity=onehot(identity_idx, n_identities),
            shape=jnp.zeros((batch, shape_dim)) if shape_dim else None,
        )

    def concat(self) -> jax.Array:
        parts = [self.expression, self.intensity, self.identity]
        if self.shape is not None:
            parts.append(self.shape)
        return jnp.concatenate(parts, axis=-1)


class EmotionStyleEncoder(nn.Module):
    """Linear map from concatenated condition -> style embedding."""

    output_dim: int = 128
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, condition: jax.Array) -> jax.Array:
        return nn.Dense(
            self.output_dim,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="map",
        )(condition)
