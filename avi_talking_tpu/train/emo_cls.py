"""Stage-1 emotion-classification loss on rendered predicted vertices.

Port of the disentangle trainer's ``w_emo_cls_loss``
(/root/reference/models/faceformer_disentangle.py:243-267 setup, 514-517
cross-entropy, 718-731 loss): every ``stride``-th predicted frame is
rendered as a normal map (FlameVisualizer semantics — here differentiable
through the TPU rasterizer), resized to the frozen FAN backbone's input,
classified by the frozen Linear(512,128)-ReLU-BN-Linear(128,8) head, and
penalised with cross-entropy against the clip's MEAD emotion label
(summed into the loss with weight 0.1).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from ..core.projection import batch_orth_proj
from ..models.fan_encoder import FanEncoder
from ..viz.rasterizer import render_normal_maps

# faceformer_disentangle.py:267 (the reference's emo2idx)
EMO2IDX = {
    "neutral": 0, "angry": 1, "contempt": 2, "disgusted": 3,
    "fear": 4, "happy": 5, "sad": 6, "surprised": 7,
}


class EmoClsHead(nn.Module):
    """custom_emonet_head: Linear(512,128)-ReLU-BatchNorm1d-Linear(128,8)
    (faceformer_disentangle.py:265-266)."""

    n_classes: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jax.Array, train: bool = False) -> jax.Array:
        h = nn.Dense(128, dtype=self.dtype, name="fc0")(feat)
        h = jax.nn.relu(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(h)
        return nn.Dense(self.n_classes, dtype=self.dtype, name="fc1")(h)


@dataclasses.dataclass
class EmoClsLoss:
    """Callable (pred_verts (B, T, V*3), emo_label (B,) int) -> scalar CE.

    The render + FAN towers are frozen (stop-gradient on their params is
    implicit: they are held here, not in the trainable pytree); gradients
    flow through the rendered images back into the predicted vertices.
    """

    faces: jax.Array
    fan: FanEncoder
    fan_vars: Any
    head: EmoClsHead
    head_vars: Any
    camera: Sequence[float] = (8.0, 0.0, -0.01)
    render_size: int = 224
    fan_size: int = 224
    stride: int = 20  # sample_index = range(0, T, 20)

    def __call__(self, pred_verts: jax.Array, emo_label: jax.Array,
                 head_vars: Any = None) -> jax.Array:
        """``head_vars`` overrides the stored (frozen) head parameters —
        the emonet-pretrain stage (faceformer_disentangle.py:484-512)
        passes the trainable head here while the render + FAN features
        stay stop-gradiented."""
        B, T = pred_verts.shape[:2]
        idx = jnp.arange(0, T, self.stride)
        S = idx.shape[0]
        v = jnp.take(pred_verts, idx, axis=1).reshape(B * S, -1, 3)
        cam = jnp.broadcast_to(
            jnp.asarray([list(self.camera)], v.dtype), (v.shape[0], 3)
        )
        proj = batch_orth_proj(v, cam)
        ndc = jnp.stack(
            [proj[..., 0], -proj[..., 1], -proj[..., 2]], axis=-1
        )
        imgs = render_normal_maps(
            ndc, self.faces, self.render_size, self.render_size
        )
        if self.fan_size != self.render_size:  # F.interpolate(..., (224,224))
            imgs = jax.image.resize(
                imgs, (imgs.shape[0], self.fan_size, self.fan_size, 3),
                method="bilinear",
            )
        feat = self.fan.apply(
            self.fan_vars, imgs, method=FanEncoder.backbone_feature
        )
        if head_vars is None:
            head_vars = self.head_vars
        else:  # pretrain: only the head learns (feat.detach())
            feat = jax.lax.stop_gradient(feat)
        logits = self.head.apply(head_vars, feat)
        labels = jnp.repeat(emo_label, S)  # expand + reshape(-1)
        valid = (labels >= 0).astype(logits.dtype)  # -1 = unparseable clip
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.clip(labels, 0)
        )
        return jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1.0)
