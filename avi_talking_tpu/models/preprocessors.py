"""Batch preprocessors (pseudo-GT builders) — inferno Preprocessors.py ports.

  * ``FlamePreprocessor``: decode stored FLAME codes to GT vertices
    (Preprocessors.py:27+ — used when the dataset ships codes, not meshes).
  * ``EmocaPreprocessor`` equivalent lives in models/emoca.py
    (EmocaEncoder + emoca_pseudo_gt).
  * ``EmotionRecognitionPreprocessor``: per-frame emotion features/logits
    from the image-based module (Preprocessors.py:493+).
  * ``SpeechEmotionRecognitionPreprocessor``: audio-side emotion logits via
    the Wav2Vec2SER head (Preprocessors.py:570+).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

from ..core.flame import FlameModel


@dataclasses.dataclass
class FlamePreprocessor:
    flame: FlameModel

    def __call__(self, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        """gt_shape (B, n_shape) or (B,T,n_shape), gt_exp (B,T,n_exp),
        gt_jaw (B,T,3) -> adds gt_vertices (B,T,V,3) and template (B,V,3)."""
        exp, jaw = batch["gt_exp"], batch["gt_jaw"]
        B, T = exp.shape[:2]
        shape = batch["gt_shape"]
        if shape.ndim == 2:
            shape = jnp.broadcast_to(shape[:, None], (B, T, shape.shape[-1]))
        pose = jnp.concatenate([jnp.zeros_like(jaw), jaw], axis=-1)
        verts = self.flame.vertices_only(
            shape.reshape(B * T, -1), exp.reshape(B * T, -1),
            pose.reshape(B * T, -1),
        ).reshape(B, T, -1, 3)
        template = self.flame.vertices_only(
            shape[:, 0], jnp.zeros_like(exp[:, 0]),
        )
        return {**batch, "gt_vertices": verts, "template": template}


@dataclasses.dataclass
class EmotionRecognitionPreprocessor:
    """(B, T, H, W, 3) frames -> per-frame emotion features + logits."""

    module: "EmotionRecognitionModule"
    variables: Dict

    def __call__(self, frames: jax.Array) -> Dict[str, jax.Array]:
        B, T = frames.shape[:2]
        flat = frames.reshape((B * T,) + frames.shape[2:])
        out = self.module.apply(self.variables, flat)
        return {
            "gt_emo_feat_2": out["emo_feat_2"].reshape(B, T, -1),
            "gt_expression_logits": out["expr_classification"].reshape(B, T, -1),
        }


@dataclasses.dataclass
class SpeechEmotionRecognitionPreprocessor:
    """(B, samples) audio -> utterance emotion logits via Wav2Vec2SER."""

    ser: "Wav2Vec2SER"
    variables: Dict

    def __call__(self, audio: jax.Array, output_len=None) -> Dict[str, jax.Array]:
        logits = self.ser.apply(self.variables, audio, output_len=output_len)
        return {"gt_audio_emotion_logits": logits}
