"""VGG19 multi-scale perceptual + style loss (PIRender's render loss).

Port of /root/reference/third_party/pirender/loss/perceptual.py:25-168 with
the flame_wo_crop.yaml settings: vgg19, layers relu_1_1..relu_5_1,
num_scales=3, L1 criterion, optional gram-matrix style loss (scale 0 only,
weight 250). The VGG19 feature tower is flax (NHWC); weights import from a
torchvision-style ``features.N.*`` state dict (external download — the
reference's torchvision dependency is likewise weight-download-based).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..infra.torch_compat import to_np

# VGG19 conv plan: (out_channels, n_convs) per stage; relu_k_1 taps the
# first conv of stage k.
_VGG19_PLAN = ((64, 2), (128, 2), (256, 4), (512, 4), (512, 4))

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def apply_imagenet_normalization(x: jax.Array) -> jax.Array:
    """[-1,1] NHWC images -> ImageNet-normalised."""
    x01 = (x + 1.0) / 2.0
    return (x01 - IMAGENET_MEAN) / IMAGENET_STD


class Vgg19Features(nn.Module):
    """VGG19 feature tower tapping relu_k_1 activations (NHWC)."""

    taps: Sequence[str] = ("relu_1_1", "relu_2_1", "relu_3_1", "relu_4_1", "relu_5_1")
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:
        feats: Dict[str, jax.Array] = {}
        for stage, (ch, n_convs) in enumerate(_VGG19_PLAN, start=1):
            for ci in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"conv{stage}_{ci + 1}")(x)
                x = jax.nn.relu(x)
                name = f"relu_{stage}_{ci + 1}"
                if name in self.taps:
                    feats[name] = x
            if stage < len(_VGG19_PLAN):
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


def vgg19_params_from_torch(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """torchvision ``vgg19().features`` state dict -> Vgg19Features params."""
    params: Dict[str, Any] = {}
    idx = 0
    for stage, (ch, n_convs) in enumerate(_VGG19_PLAN, start=1):
        for ci in range(n_convs):
            w = to_np(sd[f"features.{idx}.weight"]).transpose(2, 3, 1, 0)
            b = to_np(sd[f"features.{idx}.bias"])
            params[f"conv{stage}_{ci + 1}"] = {"kernel": w, "bias": b}
            idx += 2  # conv + relu
        idx += 1  # max pool
    return params


def gram_matrix(feat: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, C, C) normalised gram (perceptual.py:164-168)."""
    B, H, W, C = feat.shape
    f = feat.reshape(B, H * W, C)
    return jnp.einsum("bnc,bnd->bcd", f, f) / (H * W * C)


def _downsample_half(x: jax.Array) -> jax.Array:
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, H // 2, W // 2, C), method="bilinear")


@dataclasses.dataclass
class PerceptualLoss:
    """Multi-scale VGG perceptual loss; callable (params, pred, target)."""

    model: Vgg19Features
    layers: Sequence[str] = (
        "relu_1_1", "relu_2_1", "relu_3_1", "relu_4_1", "relu_5_1"
    )
    weights: Optional[Sequence[float]] = None
    num_scales: int = 3
    criterion: str = "l1"
    use_style_loss: bool = False
    style_weight: float = 250.0

    def __call__(self, params, inp: jax.Array, target: jax.Array) -> jax.Array:
        weights = self.weights or [1.0] * len(self.layers)
        dist = (
            (lambda a, b: jnp.abs(a - b).mean())
            if self.criterion == "l1"
            else (lambda a, b: ((a - b) ** 2).mean())
        )
        inp = apply_imagenet_normalization(inp)
        target = jax.lax.stop_gradient(apply_imagenet_normalization(target))
        loss = 0.0
        style_loss = 0.0
        for scale in range(self.num_scales):
            fi = self.model.apply({"params": params}, inp)
            ft = self.model.apply({"params": params}, target)
            for layer, w in zip(self.layers, weights):
                loss += w * dist(fi[layer], jax.lax.stop_gradient(ft[layer]))
                if self.use_style_loss and scale == 0:
                    style_loss += dist(
                        gram_matrix(fi[layer]),
                        jax.lax.stop_gradient(gram_matrix(ft[layer])),
                    )
            if scale != self.num_scales - 1:
                inp = _downsample_half(inp)
                target = _downsample_half(target)
        if self.use_style_loss:
            return loss + style_loss * self.style_weight
        return loss
