"""Speech emotion recognition head on wav2vec2 (Wav2Vec2SER equivalent).

Port of inferno's ``Wav2Vec2SER`` / the resampled sequence-classification
variant (inferno/models/temporal/AudioEncoders.py:243+,
Wav2Vec2ForSequenceClassificationResampled): wav2vec2 features -> projector
-> mean pool -> classifier logits. Used as an audio-side emotion conditioning
/ loss signal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .wav2vec2 import Wav2Vec2Config, Wav2Vec2Model


class Wav2Vec2SER(nn.Module):
    cfg: Wav2Vec2Config
    num_labels: int = 8
    classifier_proj_size: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_values: jax.Array, output_len=None) -> jax.Array:
        feats = Wav2Vec2Model(self.cfg, dtype=self.dtype, name="wav2vec2")(
            input_values, output_len=output_len
        )
        h = nn.Dense(self.classifier_proj_size, dtype=self.dtype,
                     name="projector")(feats)
        pooled = h.mean(axis=1)
        return nn.Dense(self.num_labels, dtype=self.dtype, name="classifier")(pooled)
