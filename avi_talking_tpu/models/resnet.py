"""ResNet-50 backbone in flax (NHWC) with torch(vision) weight import.

Shared vision backbone of the EMOCA/DECA family: the DECA/EMOCA coefficient
encoders and the EmoNet-style emotion recognition network are all
ResNet-50 + linear heads
(/root/reference/BlendshapeVisualizer/EMOCA/gdl/models/DECA.py E_flame /
EmoCnnModule; reference emonet path train_diffusion_prior SURVEY §2.4).

Layout matches torchvision resnet50 exactly (conv1/bn1/layer{1..4}.{i}.
conv{1..3}/bn{1..3}/downsample) so published checkpoints import 1:1.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..infra.torch_compat import to_np

_LAYERS50: Sequence[int] = (3, 4, 6, 3)


class _BN(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype, name="bn")(x)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = jax.nn.relu(_BN(self.dtype, name="bn1")(out, train))
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2, padding=1,
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = jax.nn.relu(_BN(self.dtype, name="bn2")(out, train))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv3")(out)
        out = _BN(self.dtype, name="bn3")(out, train)
        if self.downsample:
            sc = nn.Conv(self.planes * 4, (1, 1), strides=(self.stride,) * 2,
                         use_bias=False, dtype=self.dtype, name="down_conv")(x)
            sc = _BN(self.dtype, name="down_bn")(sc, train)
        else:
            sc = x
        return jax.nn.relu(out + sc)


class ResNet50(nn.Module):
    """(B, H, W, 3) -> (B, 2048) pooled feature."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = jax.nn.relu(_BN(self.dtype, name="bn1")(x, train))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        planes = 64
        for li, blocks in enumerate(_LAYERS50):
            for bi in range(blocks):
                stride = 2 if (bi == 0 and li > 0) else 1
                x = Bottleneck(
                    planes, stride, downsample=(bi == 0), dtype=self.dtype,
                    name=f"layer{li + 1}_{bi}",
                )(x, train)
            planes *= 2
        return x.mean(axis=(1, 2))  # global average pool -> (B, 2048)


def _bn_pair(sd: Mapping[str, Any], key: str):
    return (
        {"scale": to_np(sd[f"{key}.weight"]), "bias": to_np(sd[f"{key}.bias"])},
        {"mean": to_np(sd[f"{key}.running_mean"]),
         "var": to_np(sd[f"{key}.running_var"])},
    )


def _conv(sd: Mapping[str, Any], key: str):
    return {"kernel": to_np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)}


def resnet50_params_from_torch(
    sd: Mapping[str, Any], prefix: str = ""
) -> Dict[str, Any]:
    """torchvision resnet50 state dict -> {'params':..., 'batch_stats':...}."""
    p = prefix
    P: Dict[str, Any] = {"conv1": _conv(sd, f"{p}conv1")}
    S: Dict[str, Any] = {}
    bnp, bns = _bn_pair(sd, f"{p}bn1")
    P["bn1"], S["bn1"] = {"bn": bnp}, {"bn": bns}
    for li, blocks in enumerate(_LAYERS50):
        for bi in range(blocks):
            name = f"layer{li + 1}_{bi}"
            tb = f"{p}layer{li + 1}.{bi}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for ci in (1, 2, 3):
                bp[f"conv{ci}"] = _conv(sd, f"{tb}.conv{ci}")
                q, s = _bn_pair(sd, f"{tb}.bn{ci}")
                bp[f"bn{ci}"], bs[f"bn{ci}"] = {"bn": q}, {"bn": s}
            if f"{tb}.downsample.0.weight" in sd:
                bp["down_conv"] = _conv(sd, f"{tb}.downsample.0")
                q, s = _bn_pair(sd, f"{tb}.downsample.1")
                bp["down_bn"], bs["down_bn"] = {"bn": q}, {"bn": s}
            P[name], S[name] = bp, bs
    return {"params": P, "batch_stats": S}
