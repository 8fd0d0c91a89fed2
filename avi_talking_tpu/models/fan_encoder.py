"""PD-FGC motion-feature encoder (FAN hourglass CNN + disentangled heads).

Equivalent of ``FanEncoder``
(/root/reference/third_party/pd_fgc_inference/lib/models/networks/encoder.py:87-126)
and its ``FAN_use`` backbone (FAN_feature_extractor.py): a single-stack
hourglass landmark CNN producing a 512-d feature, with four heads:
headpose (6), eye (6), emotion (30), mouth (512). The stage-1 FaceFormers
consume the eye/emo embeddings (models/faceformer.py:333-371).

Layout notes (all matched for torch weight import, NHWC here):
  * ConvBlock: pre-activation BN-ReLU-conv x3 with dense concat
    (out = cat[c1(x), c2(c1), c3(c2)]) + optional BN-ReLU-1x1 downsample
    residual,
  * HourGlass: depth-4 recursive pool/up pyramid with skip adds,
  * head: 1x1 convs -> 68-ch heatmap -> BN/ReLU -> strided 3x3 to 1 ch
    -> flatten 28*28 -> Linear 512.

BatchNorm runs on imported running stats (inference) or batch stats
(training) via the ``train`` flag.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..infra.torch_compat import linear_params, to_np


class _BN(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn",
        )(x)


class ConvBlock(nn.Module):
    in_planes: int
    out_planes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        half, quarter = self.out_planes // 2, self.out_planes // 4
        o1 = _BN(self.dtype, name="bn1")(x, train)
        o1 = nn.Conv(half, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                     name="conv1")(jax.nn.relu(o1))
        o2 = _BN(self.dtype, name="bn2")(o1, train)
        o2 = nn.Conv(quarter, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                     name="conv2")(jax.nn.relu(o2))
        o3 = _BN(self.dtype, name="bn3")(o2, train)
        o3 = nn.Conv(quarter, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                     name="conv3")(jax.nn.relu(o3))
        out = jnp.concatenate([o1, o2, o3], axis=-1)
        if self.in_planes != self.out_planes:
            res = _BN(self.dtype, name="down_bn")(x, train)
            res = nn.Conv(self.out_planes, (1, 1), use_bias=False, dtype=self.dtype,
                          name="down_conv")(jax.nn.relu(res))
        else:
            res = x
        return out + res


class HourGlass(nn.Module):
    depth: int = 4
    features: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.features

        def level(inp, lvl):
            up1 = ConvBlock(f, f, self.dtype, name=f"b1_{lvl}")(inp, train)
            low1 = nn.max_pool(inp, (2, 2), strides=(2, 2))
            low1 = ConvBlock(f, f, self.dtype, name=f"b2_{lvl}")(low1, train)
            if lvl > 1:
                low2 = level(low1, lvl - 1)
            else:
                low2 = ConvBlock(f, f, self.dtype, name=f"b2_plus_{lvl}")(low1, train)
            low3 = ConvBlock(f, f, self.dtype, name=f"b3_{lvl}")(low2, train)
            up2 = jax.image.resize(
                low3, up1.shape, method="bilinear"
            )  # F.upsample(..., mode='bilinear') with align_corners=False
            return up1 + up2

        return level(x, self.depth)


class FanBackbone(nn.Module):
    """FAN_use: 224x224x3 image -> 512-d feature."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, H, W, 3)
        # the hourglass downsamples 4x before its own 4-level pyramid: below
        # 64px a level bottoms out at 0 and fails with an opaque resize error
        if min(x.shape[1], x.shape[2]) < 64:
            raise ValueError(
                f"FanBackbone needs crops >= 64px, got {x.shape[1:3]} "
                "(the reference feeds 224x224 detections)"
            )
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, dtype=self.dtype,
                    name="conv1")(x)
        x = jax.nn.relu(_BN(self.dtype, name="bn1")(x, train))
        x = ConvBlock(64, 128, self.dtype, name="conv2")(x, train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = ConvBlock(128, 128, self.dtype, name="conv3")(x, train)
        x = ConvBlock(128, 256, self.dtype, name="conv4")(x, train)

        hg = HourGlass(4, 256, self.dtype, name="m0")(x, train)
        ll = ConvBlock(256, 256, self.dtype, name="top_m_0")(hg, train)
        ll = nn.Conv(256, (1, 1), dtype=self.dtype, name="conv_last0")(ll)
        ll = _BN(self.dtype, name="bn_end0")(ll, train)
        tmp = nn.Conv(68, (1, 1), dtype=self.dtype, name="l0")(jax.nn.relu(ll))

        net = jax.nn.relu(_BN(self.dtype, name="bn5")(tmp, train))
        net = nn.Conv(1, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
                      name="conv6")(net)
        B = net.shape[0]
        # torch flattens CHW; with C=1 this equals HW
        net = jax.nn.relu(net.reshape(B, -1))
        return nn.Dense(512, dtype=self.dtype, name="fc")(net)


class _Head(nn.Module):
    """to_X (Linear-ReLU-BN1d-Linear) + X_embed (ReLU-Linear) pair."""

    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        h = nn.Dense(512, dtype=self.dtype, name="to_dense0")(x)
        h = jax.nn.relu(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="to_bn")(h)
        feat = nn.Dense(512, dtype=self.dtype, name="to_dense1")(h)
        emb = nn.Dense(self.embed_dim, dtype=self.dtype, name="embed")(
            jax.nn.relu(feat)
        )
        return feat, emb


class FanEncoder(nn.Module):
    """headpose (6), eye (6), emo (30) embeddings + mouth feature (512)."""

    pose_dim: int = 6
    eye_dim: int = 6
    emo_dim: int = 30
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = FanBackbone(self.dtype, name="model")(x, train)
        mouth_feat, _ = _Head(512 - self.pose_dim - self.eye_dim, self.dtype,
                              name="mouth")(feat, train)
        _, headpose = _Head(self.pose_dim, self.dtype, name="headpose")(feat, train)
        _, eye = _Head(self.eye_dim, self.dtype, name="eye")(feat, train)
        _, emo = _Head(self.emo_dim, self.dtype, name="emo")(feat, train)
        return headpose, eye, emo, mouth_feat

    @nn.compact
    def backbone_feature(self, x, train: bool = False):
        return FanBackbone(self.dtype, name="model")(x, train)


def mask_lip(images: jax.Array, variant: str = "coeff") -> jax.Array:
    """Zero the lip region of (B, H, W, 3) in [-1,1] crops.

    'coeff' = faceformer.py:114-126 box; 'disentangle' = the wider
    faceformer_disentangle.py:119-133 box (lower half of the face)."""
    B, H, W, _ = images.shape
    if variant == "coeff":
        h0, h1 = int(100 / 224 * H), int(210 / 224 * H)
        w0, w1 = int(40 / 224 * W), int(185 / 224 * W)
    else:
        h0, h1 = int(100 / 224 * H), H
        w0, w1 = 0, W
    mask = jnp.ones((H, W), images.dtype)
    mask = mask.at[h0:h1, w0:w1].set(0.0)
    return images * mask[None, :, :, None]


# ----- torch import --------------------------------------------------------


def _conv2d(sd: Mapping[str, Any], key: str) -> Dict[str, Any]:
    out = {"kernel": to_np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)}
    if f"{key}.bias" in sd:
        out["bias"] = to_np(sd[f"{key}.bias"])
    return out


def _bn(sd: Mapping[str, Any], key: str):
    return (
        {"scale": to_np(sd[f"{key}.weight"]), "bias": to_np(sd[f"{key}.bias"])},
        {"mean": to_np(sd[f"{key}.running_mean"]), "var": to_np(sd[f"{key}.running_var"])},
    )


def _convblock(sd, prefix):
    params, stats = {}, {}
    for i in (1, 2, 3):
        params[f"conv{i}"] = _conv2d(sd, f"{prefix}.conv{i}")
        p, s = _bn(sd, f"{prefix}.bn{i}")
        params[f"bn{i}"] = {"bn": p}
        stats[f"bn{i}"] = {"bn": s}
    if f"{prefix}.downsample.2.weight" in sd:
        params["down_conv"] = _conv2d(sd, f"{prefix}.downsample.2")
        p, s = _bn(sd, f"{prefix}.downsample.0")
        params["down_bn"] = {"bn": p}
        stats["down_bn"] = {"bn": s}
    return params, stats


def fan_encoder_params_from_torch(sd: Mapping[str, Any]):
    """torch FanEncoder.state_dict() -> {'params':..., 'batch_stats':...}."""
    P: Dict[str, Any] = {}
    S: Dict[str, Any] = {}

    def put(dst_p, dst_s, name, pair):
        p, s = pair
        dst_p[name] = p
        if s:
            dst_s[name] = s

    bp, bs = {}, {}
    bp["conv1"] = _conv2d(sd, "model.conv1")
    p, s = _bn(sd, "model.bn1")
    bp["bn1"], bs["bn1"] = {"bn": p}, {"bn": s}
    for name in ("conv2", "conv3", "conv4", "top_m_0"):
        put(bp, bs, name, _convblock(sd, f"model.{name}"))
    hgp, hgs = {}, {}
    for lvl in (1, 2, 3, 4):
        for blk in (f"b1_{lvl}", f"b2_{lvl}", f"b3_{lvl}"):
            put(hgp, hgs, blk, _convblock(sd, f"model.m0.{blk}"))
    put(hgp, hgs, "b2_plus_1", _convblock(sd, "model.m0.b2_plus_1"))
    bp["m0"], bs["m0"] = hgp, hgs
    bp["conv_last0"] = _conv2d(sd, "model.conv_last0")
    p, s = _bn(sd, "model.bn_end0")
    bp["bn_end0"], bs["bn_end0"] = {"bn": p}, {"bn": s}
    bp["l0"] = _conv2d(sd, "model.l0")
    p, s = _bn(sd, "model.bn5")
    bp["bn5"], bs["bn5"] = {"bn": p}, {"bn": s}
    bp["conv6"] = _conv2d(sd, "model.conv6")
    bp["fc"] = linear_params(sd, "model.fc.")
    P["model"], S["model"] = bp, bs

    heads = {
        "mouth": ("to_mouth", "mouth_embed"),
        "headpose": ("to_headpose", "headpose_embed"),
        "eye": ("to_eye", "eye_embed"),
        "emo": ("to_emo", "emo_embed"),
    }
    for ours, (to_key, embed_key) in heads.items():
        hp = {
            "to_dense0": linear_params(sd, f"{to_key}.0."),
            "to_dense1": linear_params(sd, f"{to_key}.3."),
            "embed": linear_params(sd, f"{embed_key}.1."),
        }
        p, s = _bn(sd, f"{to_key}.2")
        hp["to_bn"] = p
        P[ours] = hp
        S[ours] = {"to_bn": s}
    return {"params": P, "batch_stats": S}
