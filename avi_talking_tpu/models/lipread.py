"""Lip-reading feature network + consistency loss (EMOTE's lip-reading term).

TPU-native equivalent of inferno's ``LipReadingLoss``
(/root/reference/third_party/inferno/inferno/models/temporal/external/LipReadingLoss.py:121-199):
grayscale 88x88 mouth crops -> the visual front-end of the pretrained
visual-speech model from "Lipreading using Temporal Convolutional Networks"
(Ma et al.; spectre's ``Lipreading`` wrapper) -> per-frame 512-d features;
the loss is a cosine/L1/MSE distance between predicted-render and GT-render
features with the GT side stop-gradiented.

The reference calls ``encoder(..., extract_resnet_feats=True)``
(LipReadingLoss.py:92-96), i.e. features are taken AFTER the
Conv3d front-end + ResNet-18 trunk and BEFORE the TCN head — so the TCN is
never used by the loss and is not implemented here. The trunk below is the
published layout (Conv3d(1->64, k(5,7,7), s(1,2,2)) + BN + act + MaxPool3d
(1,3,3)/(1,2,2), then ResNet-18 BasicBlocks [2,2,2,2] at 64/128/256/512 with
global average pool), so real VSR checkpoints map onto it via
``lipread_params_from_torch``.

Input transform (LipReadingLoss.py:47-55): center-crop to 88x88 and
normalize with mean 0.421 / std 0.165 (``mouth_transform``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

LIPREAD_MEAN = 0.421
LIPREAD_STD = 0.165


def _act(name: str):
    if name == "swish":
        return jax.nn.silu
    if name == "relu":
        return jax.nn.relu
    if name == "prelu":  # flax PReLU needs params; loss nets use fixed 0.25
        return lambda x: jnp.where(x >= 0, x, 0.25 * x)
    raise ValueError(name)


class BasicBlock(nn.Module):
    """ResNet BasicBlock (two 3x3 convs), torch layout/naming compatible."""

    planes: int
    stride: int = 1
    relu_type: str = "swish"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        act = _act(self.relu_type)
        h = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=True, dtype=self.dtype, name="bn1")(h)
        h = act(h)
        h = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=True, dtype=self.dtype, name="bn2")(h)
        if x.shape[-1] != self.planes or self.stride != 1:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride, use_bias=False,
                        dtype=self.dtype, name="downsample_conv")(x)
            x = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                             name="downsample_bn")(x)
        return act(h + x)


class LipReadingNet(nn.Module):
    """(B, T, H, W, 1) mouth crops (already mouth_transform-ed) ->
    (B, T, 512) per-frame visual-speech features (resnet feats)."""

    relu_type: str = "swish"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, crops: jax.Array) -> jax.Array:
        act = _act(self.relu_type)
        B, T = crops.shape[:2]
        # 3D front-end (espnet conv3d_extractor layout): NDHWC in flax
        x = nn.Conv(64, (5, 7, 7), strides=(1, 2, 2),
                    padding=((2, 2), (3, 3), (3, 3)), use_bias=False,
                    dtype=self.dtype, name="frontend3d_conv")(crops)
        x = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                         name="frontend3d_bn")(x)
        x = act(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2),
                        padding=((0, 0), (1, 1), (1, 1)))
        # fold time into batch for the 2D ResNet-18 trunk
        _, _, H, W, C = x.shape
        h = x.reshape(B * T, H, W, C)
        for li, (planes, stride, blocks) in enumerate(
            ((64, 1, 2), (128, 2, 2), (256, 2, 2), (512, 2, 2))
        ):
            for bi in range(blocks):
                h = BasicBlock(
                    planes, stride if bi == 0 else 1, self.relu_type,
                    self.dtype, name=f"layer{li + 1}_{bi}",
                )(h)
        feat = h.mean(axis=(1, 2))  # adaptive avg pool -> (B*T, 512)
        return feat.reshape(B, T, 512)


def mouth_transform(images: jax.Array, crop: int = 88) -> jax.Array:
    """Grayscale [0,1] frames (..., H, W) or (..., H, W, 1) -> centered
    ``crop``² patch normalized with the lipread mean/std, channel dim added."""
    if images.shape[-1] == 1:
        images = images[..., 0]
    H, W = images.shape[-2:]
    top, left = max(0, (H - crop) // 2), max(0, (W - crop) // 2)
    patch = images[..., top : top + min(crop, H), left : left + min(crop, W)]
    return ((patch - LIPREAD_MEAN) / LIPREAD_STD)[..., None]


@dataclasses.dataclass
class LipReadingLoss:
    """Feature-distance between predicted and GT mouth-crop sequences
    (LipReadingLoss.py:157-199: GT side no-grad; cosine / l1 / mse on the
    per-frame resnet features; optional per-frame validity mask)."""

    net: LipReadingNet
    variables: Dict
    metric: str = "cosine"  # cosine | l1 | l2

    def features(self, crops: jax.Array) -> jax.Array:
        return self.net.apply(self.variables, crops)

    def __call__(
        self,
        pred_crops: jax.Array,
        gt_crops: jax.Array,
        mask: Optional[jax.Array] = None,  # (B, T) 1=valid
    ) -> jax.Array:
        return self.from_features(
            self.features(pred_crops), self.features(gt_crops), mask
        )

    def from_features(
        self,
        fp: jax.Array,
        fg: jax.Array,
        mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Loss from precomputed per-frame features, so callers sharing a
        gt side across terms (condition exchange) run the tower once per
        distinct crop set. ``fg`` is stop-gradded here."""
        fg = jax.lax.stop_gradient(fg)
        if self.metric == "l1":
            per = jnp.abs(fp - fg).mean(-1)
        elif self.metric == "l2":
            per = ((fp - fg) ** 2).mean(-1)
        else:
            fp_n = fp / jnp.maximum(jnp.linalg.norm(fp, axis=-1, keepdims=True), 1e-8)
            fg_n = fg / jnp.maximum(jnp.linalg.norm(fg, axis=-1, keepdims=True), 1e-8)
            per = 1.0 - (fp_n * fg_n).sum(-1)
        if mask is None:
            return per.mean()
        mask = mask.astype(per.dtype)
        return (per * mask).sum() / jnp.maximum(mask.sum(), 1.0)


# --- torch import ------------------------------------------------------------


def lipread_params_from_torch(
    sd: Mapping[str, Any], prefix: str = "", dtype=jnp.float32
) -> Dict:
    """Map a VSR ``Conv3dResNet`` state dict onto LipReadingNet params.

    Expected torch keys (espnet conv3d_extractor + lipreading/models/resnet):
    ``{prefix}frontend3D.0.weight`` (conv3d), ``frontend3D.1.*`` (bn3d),
    ``{prefix}trunk.layer{1..4}.{0,1}.{conv1,bn1,conv2,bn2,downsample.0/1}.*``.
    """
    import numpy as np

    def t(key):
        return np.asarray(sd[prefix + key], dtype=np.float32)

    def bn(key):
        return (
            {"scale": jnp.asarray(t(f"{key}.weight"), dtype),
             "bias": jnp.asarray(t(f"{key}.bias"), dtype)},
            {"mean": jnp.asarray(t(f"{key}.running_mean"), dtype),
             "var": jnp.asarray(t(f"{key}.running_var"), dtype)},
        )

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    # torch conv3d (O, I, D, H, W) -> flax (D, H, W, I, O)
    params["frontend3d_conv"] = {
        "kernel": jnp.asarray(t("frontend3D.0.weight").transpose(2, 3, 4, 1, 0), dtype)
    }
    params["frontend3d_bn"], stats["frontend3d_bn"] = bn("frontend3D.1")
    for li in range(1, 5):
        for bi in range(2):
            tk = f"trunk.layer{li}.{bi}"
            fk = f"layer{li}_{bi}"
            blk_p: Dict[str, Any] = {}
            blk_s: Dict[str, Any] = {}
            for conv, bnk in (("conv1", "bn1"), ("conv2", "bn2")):
                blk_p[conv] = {
                    "kernel": jnp.asarray(
                        t(f"{tk}.{conv}.weight").transpose(2, 3, 1, 0), dtype
                    )
                }
                blk_p[bnk], blk_s[bnk] = bn(f"{tk}.{bnk}")
            if prefix + f"{tk}.downsample.0.weight" in sd:
                blk_p["downsample_conv"] = {
                    "kernel": jnp.asarray(
                        t(f"{tk}.downsample.0.weight").transpose(2, 3, 1, 0), dtype
                    )
                }
                blk_p["downsample_bn"], blk_s["downsample_bn"] = bn(
                    f"{tk}.downsample.1"
                )
            params[fk] = blk_p
            stats[fk] = blk_s
    return {"params": params, "batch_stats": stats}
