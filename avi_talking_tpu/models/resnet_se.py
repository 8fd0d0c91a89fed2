"""ResNetSE speaker/audio embedding encoder (PD-FGC support net), in flax.

TPU-native equivalent of the reference's voxceleb-style audio encoder
(/root/reference/third_party/pd_fgc_inference/lib/models/networks/audio_network.py:5-105):
log-mel input (B, 1, n_mels, T) -> 3x3 conv stem (relu BEFORE bn, :82-84) ->
four SE-BasicBlock stages (strides 1/2/2/2, :20-23) -> flatten (C, mel) ->
self-attentive pooling over time (SAP, or ASP with attentive std, :93-100)
-> linear to the nOut-d embedding.

Layout quirks preserved exactly for checkpoint import:
- stem conv HAS a bias (reference conv1 default, :16) and the activation
  order is conv -> relu -> bn (:82-84); inside SEBasicBlock it is
  conv1 -> relu -> bn1 but conv2 -> bn2 -> SE (:124-140).
- the SE layer (:184-199) squeezes over (H, W) and gates channels with a
  reduction-8 bottleneck MLP (fc.0 / fc.2 in the state dict).
- attention head (:29-35): Conv1d(C*mel' -> 128, k1) -> ReLU -> BatchNorm1d
  -> Conv1d(128 -> C*mel', k1) -> softmax over TIME.

Input is NHWC here: (B, n_mels, T, 1). The flatten before pooling matches
torch's (B, C, H, W).reshape(B, C*H, W) channel-major order (:91).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..infra.torch_compat import to_np


class SELayer(nn.Module):
    """Squeeze-and-excitation channel gate (audio_network.py:184-199)."""

    channels: int
    reduction: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = x.mean(axis=(1, 2))  # (B, C) squeeze over (H, W)
        y = nn.Dense(self.channels // self.reduction, dtype=self.dtype,
                     name="fc0")(y)
        y = jax.nn.relu(y)
        y = nn.Dense(self.channels, dtype=self.dtype, name="fc2")(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, None, :]


class SEBasicBlock(nn.Module):
    """conv1 -> relu -> bn1 -> conv2 -> bn2 -> SE -> +res -> relu
    (audio_network.py:110-140; note relu-before-bn on the first conv)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    reduction: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = jax.nn.relu(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(h)
        h = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn2")(h)
        h = SELayer(self.planes, self.reduction, self.dtype, name="se")(h)
        if self.downsample:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, dtype=self.dtype, name="down_conv")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="down_bn")(x)
        return jax.nn.relu(h + x)


class ResNetSE(nn.Module):
    """(B, n_mels, T, 1) log-mel -> (B, n_out) embedding.

    Defaults are the ResNetSE34-ish config the PD-FGC repo instantiates its
    audio encoder family from (layers/filters are ctor args upstream, :6).
    """

    layers: Sequence[int] = (3, 4, 6, 3)
    num_filters: Sequence[int] = (32, 64, 128, 256)
    n_out: int = 512
    n_mels: int = 80
    n_mel_t: int = 1
    encoder_type: str = "SAP"  # SAP | ASP (audio_network.py:37-42)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.encoder_type not in ("SAP", "ASP"):
            raise ValueError(self.encoder_type)
        B = x.shape[0]
        x = nn.Conv(self.num_filters[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(x)
        x = jax.nn.relu(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        in_planes = self.num_filters[0]
        for li, (planes, blocks) in enumerate(zip(self.num_filters, self.layers)):
            stride = 1 if li == 0 else 2
            for bi in range(blocks):
                down = bi == 0 and (stride != 1 or in_planes != planes)
                x = SEBasicBlock(planes, stride if bi == 0 else 1, down,
                                 dtype=self.dtype, name=f"layer{li + 1}_{bi}")(
                                     x, train)
                in_planes = planes
        # (B, H', W', C') -> torch channel-major flatten (B, C'*H', W')
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(B, -1, x.shape[2])
        # self-attentive pooling over time (:29-35, :93-100)
        w = jnp.swapaxes(x, 1, 2)  # (B, W', C'*H') feature-last for conv1d
        w = nn.Conv(128, (1,), dtype=self.dtype, name="att0")(w)
        w = jax.nn.relu(w)
        w = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="att2")(w)
        w = nn.Conv(x.shape[1], (1,), dtype=self.dtype, name="att3")(w)
        w = jax.nn.softmax(jnp.swapaxes(w, 1, 2), axis=2)  # (B, C*H, W)
        mu = jnp.sum(x * w, axis=2)
        if self.encoder_type == "ASP":
            sg = jnp.sqrt(jnp.clip(jnp.sum(x * x * w, axis=2) - mu * mu,
                                   1e-5, None))
            mu = jnp.concatenate([mu, sg], axis=1)
        return nn.Dense(self.n_out, dtype=self.dtype, name="fc")(mu)


def _bn(sd: Mapping[str, Any], key: str):
    return (
        {"scale": to_np(sd[f"{key}.weight"]), "bias": to_np(sd[f"{key}.bias"])},
        {"mean": to_np(sd[f"{key}.running_mean"]),
         "var": to_np(sd[f"{key}.running_var"])},
    )


def resnet_se_params_from_torch(
    sd: Mapping[str, Any],
    layers: Sequence[int] = (3, 4, 6, 3),
    prefix: str = "",
) -> Dict[str, Any]:
    """Reference ``ResNetSE`` state dict -> flax variables dict."""
    p = prefix

    def conv2d(key):
        w = to_np(sd[f"{p}{key}.weight"]).transpose(2, 3, 1, 0)
        out = {"kernel": w}
        if f"{p}{key}.bias" in sd:
            out["bias"] = to_np(sd[f"{p}{key}.bias"])
        return out

    def conv1d(key):
        return {"kernel": to_np(sd[f"{p}{key}.weight"]).transpose(2, 1, 0),
                "bias": to_np(sd[f"{p}{key}.bias"])}

    P: Dict[str, Any] = {"conv1": conv2d("conv1")}
    S: Dict[str, Any] = {}
    P["bn1"], S["bn1"] = _bn(sd, f"{p}bn1")
    for li, blocks in enumerate(layers):
        for bi in range(blocks):
            tb = f"{p}layer{li + 1}.{bi}"
            name = f"layer{li + 1}_{bi}"
            bp: Dict[str, Any] = {
                "conv1": conv2d(f"layer{li + 1}.{bi}.conv1"),
                "conv2": conv2d(f"layer{li + 1}.{bi}.conv2"),
                "se": {
                    "fc0": {"kernel": to_np(sd[f"{tb}.se.fc.0.weight"]).T,
                            "bias": to_np(sd[f"{tb}.se.fc.0.bias"])},
                    "fc2": {"kernel": to_np(sd[f"{tb}.se.fc.2.weight"]).T,
                            "bias": to_np(sd[f"{tb}.se.fc.2.bias"])},
                },
            }
            bs: Dict[str, Any] = {}
            bp["bn1"], bs["bn1"] = _bn(sd, f"{tb}.bn1")
            bp["bn2"], bs["bn2"] = _bn(sd, f"{tb}.bn2")
            if f"{tb}.downsample.0.weight" in sd:
                bp["down_conv"] = conv2d(f"layer{li + 1}.{bi}.downsample.0")
                bp["down_bn"], bs["down_bn"] = _bn(sd, f"{tb}.downsample.1")
            P[name], S[name] = bp, bs
    P["att0"] = conv1d("attention.0")
    P["att2"], S["att2"] = _bn(sd, f"{p}attention.2")
    P["att3"] = conv1d("attention.3")
    P["fc"] = {"kernel": to_np(sd[f"{p}fc.weight"]).T,
               "bias": to_np(sd[f"{p}fc.bias"])}
    return {"params": P, "batch_stats": S}
