"""BiSeNet face parsing (the reference's segmentation-mask producer).

TPU-native equivalent of the external ``face-parsing.PyTorch`` BiSeNet the
reference wraps at
/root/reference/third_party/inferno/inferno/models/external/BiSeNetFaceParsing.py:19-75
(512x512, ImageNet-normalised, 19 classes, argmax decode) and consumes
through ``process_segmentation``
(/root/reference/third_party/inferno/inferno/datasets/IO.py:231-278):
the photometric ``masks`` of EMOCA/DECA training are the complement of the
{background, ears, hair, hat, neck, necklace} labels. Our
``train/emoca_trainer.py`` accepts those masks in its batches; this module
lets ``preprocess-mead`` produce them in-framework.

Architecture (public BiSeNet-on-ResNet18 face-parsing variant): ResNet18
trunk taps at strides 8/16/32, two AttentionRefinementModules + a global
context head on the 16/32 taps (nearest upsampling between levels), the
stride-8 trunk tap standing in for the spatial path, a FeatureFusionModule,
and 1x1 classifier heads. The final stride-8 -> full-resolution upsample is
bilinear align_corners=True — expressed here as two interpolation-matrix
matmuls (MXU work instead of a gather).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# IO.py:255-263 — labels whose pixels are EXCLUDED from the photometric mask
DISCARDED_LABELS = (0, 8, 9, 13, 14, 16, 17)  # bg, ears, hair, hat, neck(_l)


class _BN(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, name="bn")(x)


class ConvBNReLU(nn.Module):
    out_ch: int
    ks: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_ch, (self.ks, self.ks),
                    strides=(self.stride, self.stride),
                    padding=self.ks // 2, use_bias=False, name="conv")(x)
        return jax.nn.relu(_BN(name="bn")(x, train))


class BasicBlock(nn.Module):
    out_ch: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.out_ch, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, name="conv1")(x)
        h = jax.nn.relu(_BN(name="bn1")(h, train))
        h = nn.Conv(self.out_ch, (3, 3), padding=1, use_bias=False,
                    name="conv2")(h)
        h = _BN(name="bn2")(h, train)
        if self.downsample:
            x = nn.Conv(self.out_ch, (1, 1),
                        strides=(self.stride, self.stride), use_bias=False,
                        name="down_conv")(x)
            x = _BN(name="down_bn")(x, train)
        return jax.nn.relu(h + x)


class Resnet18Trunk(nn.Module):
    """Taps at strides 8 (128ch), 16 (256ch), 32 (512ch)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="conv1")(x)
        x = jax.nn.relu(_BN(name="bn1")(x, train))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i in range(2):
            x = BasicBlock(64, name=f"layer1_{i}")(x, train)
        x = BasicBlock(128, stride=2, downsample=True,
                       name="layer2_0")(x, train)
        x = BasicBlock(128, name="layer2_1")(x, train)
        feat8 = x
        x = BasicBlock(256, stride=2, downsample=True,
                       name="layer3_0")(x, train)
        x = BasicBlock(256, name="layer3_1")(x, train)
        feat16 = x
        x = BasicBlock(512, stride=2, downsample=True,
                       name="layer4_0")(x, train)
        x = BasicBlock(512, name="layer4_1")(x, train)
        return feat8, feat16, x


class AttentionRefinement(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = ConvBNReLU(self.out_ch, 3, name="conv")(x, train)
        atten = feat.mean(axis=(1, 2), keepdims=True)
        atten = nn.Conv(self.out_ch, (1, 1), use_bias=False,
                        name="conv_atten")(atten)
        atten = jax.nn.sigmoid(_BN(name="bn_atten")(atten, train))
        return feat * atten


class FeatureFusion(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, fsp, fcp, train: bool = False):
        feat = ConvBNReLU(self.out_ch, 1, name="convblk")(
            jnp.concatenate([fsp, fcp], axis=-1), train)
        atten = feat.mean(axis=(1, 2), keepdims=True)
        atten = jax.nn.relu(nn.Conv(self.out_ch // 4, (1, 1), use_bias=False,
                                    name="conv1")(atten))
        atten = jax.nn.sigmoid(nn.Conv(self.out_ch, (1, 1), use_bias=False,
                                       name="conv2")(atten))
        return feat * atten + feat


class BiSeNetOutput(nn.Module):
    mid_ch: int
    n_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNReLU(self.mid_ch, 3, name="conv")(x, train)
        return nn.Conv(self.n_classes, (1, 1), use_bias=False,
                       name="conv_out")(x)


def _up2(x):
    """Nearest x2 (F.interpolate mode='nearest' between exact-octave taps)."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def _linear_matrix(n_in: int, n_out: int) -> jnp.ndarray:
    """(n_out, n_in) bilinear align_corners=True interpolation weights."""
    if n_in == 1:
        return jnp.ones((n_out, 1), jnp.float32)
    pos = np.linspace(0.0, n_in - 1.0, n_out)
    lo = np.clip(np.floor(pos).astype(np.int64), 0, n_in - 2)
    w = (pos - lo).astype(np.float32)
    m = np.zeros((n_out, n_in), np.float32)
    m[np.arange(n_out), lo] = 1.0 - w
    m[np.arange(n_out), lo + 1] += w
    return jnp.asarray(m)


def upsample_bilinear_ac(x: jax.Array, H: int, W: int) -> jax.Array:
    """NHWC bilinear align_corners=True resize via two MXU matmuls."""
    mh = _linear_matrix(x.shape[1], H)
    mw = _linear_matrix(x.shape[2], W)
    x = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("ow,bhwc->bhoc", mw, x)


class BiSeNet(nn.Module):
    """Main head logits at input resolution (B, H, W, n_classes)."""

    n_classes: int = 19

    @nn.compact
    def __call__(self, x, train: bool = False):
        H, W = x.shape[1:3]
        feat8, feat16, feat32 = Resnet18Trunk(name="resnet")(x, train)
        avg = feat32.mean(axis=(1, 2), keepdims=True)
        avg = ConvBNReLU(128, 1, name="conv_avg")(avg, train)
        f32 = AttentionRefinement(128, name="arm32")(feat32, train) + avg
        f32_up = ConvBNReLU(128, 3, name="conv_head32")(_up2(f32), train)
        f16 = AttentionRefinement(128, name="arm16")(feat16, train) + f32_up
        f16_up = ConvBNReLU(128, 3, name="conv_head16")(_up2(f16), train)
        fuse = FeatureFusion(256, name="ffm")(feat8, f16_up, train)
        out = BiSeNetOutput(256, self.n_classes, name="conv_out")(fuse, train)
        return upsample_bilinear_ac(out, H, W)


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class FaceParser:
    """Batched face parsing for preprocessing.

    ``__call__`` takes (T, H, W, 3) crops in [0, 1] and returns
    (seg (T, H, W) uint8 class maps, mask (T, H, W) float32) — the mask is
    the EMOCA photometric mask, i.e. NOT isin(seg, DISCARDED_LABELS)
    (IO.py:266-278). The net runs at ``size`` (512 in the reference,
    BiSeNetFaceParsing.py:24) and the class map is resized back to the
    input resolution with nearest sampling."""

    def __init__(self, variables: Dict, size: int = 512, max_b: int = 4):
        self.model = BiSeNet()
        self.variables = variables
        self.size = size
        self.max_b = max_b

        def fwd(v, x):
            if x.dtype == jnp.uint8:  # uint8 transport: normalise on device
                x = x.astype(jnp.float32) / 255.0
            x = jax.image.resize(
                x, (x.shape[0], size, size, 3), "bilinear")
            x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
            return jnp.argmax(self.model.apply(v, x), axis=-1)

        self._fwd = jax.jit(fwd)

    def __call__(self, frames: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        from ..data.batching import chunked_apply

        T, H, W = frames.shape[:3]
        seg = chunked_apply(
            lambda c: self._fwd(self.variables, jnp.asarray(c)),
            frames, self.max_b).astype(np.uint8)  # (T, size, size)
        if (H, W) != (self.size, self.size):
            yi = np.clip(np.round(np.linspace(0, self.size - 1, H)), 0,
                         self.size - 1).astype(np.int64)
            xi = np.clip(np.round(np.linspace(0, self.size - 1, W)), 0,
                         self.size - 1).astype(np.int64)
            seg = seg[:, yi][:, :, xi]
        mask = np.logical_not(
            np.isin(seg, np.asarray(DISCARDED_LABELS))).astype(np.float32)
        return seg, mask


# ----- torch import --------------------------------------------------------


def _conv(sd: Mapping[str, Any], key: str, to_np) -> Dict[str, Any]:
    out = {"kernel": to_np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)}
    if f"{key}.bias" in sd:
        out["bias"] = to_np(sd[f"{key}.bias"])
    return out


def _bn(sd: Mapping[str, Any], key: str, to_np):
    return ({"scale": to_np(sd[f"{key}.weight"]),
             "bias": to_np(sd[f"{key}.bias"])},
            {"mean": to_np(sd[f"{key}.running_mean"]),
             "var": to_np(sd[f"{key}.running_var"])})


def bisenet_params_from_torch(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """face-parsing.PyTorch BiSeNet.state_dict() -> flax variables.

    Source names: ``cp.resnet.{conv1,bn1,layerL.B.*}``, ``cp.{arm16,arm32,
    conv_head16,conv_head32,conv_avg}``, ``ffm.{convblk,conv1,conv2}``,
    ``conv_out.{conv,conv_out}`` (the aux conv_out16/32 heads are
    inference-unused and skipped)."""
    from ..infra.torch_compat import to_np

    P: Dict[str, Any] = {}
    S: Dict[str, Any] = {}

    def put(dst_p, dst_s, name, cfg):
        kind, key = cfg
        if kind == "conv":
            dst_p[name] = _conv(sd, key, to_np)
        elif kind == "bn":
            p, s = _bn(sd, key, to_np)
            dst_p[name] = {"bn": p}
            dst_s[name] = {"bn": s}
        elif kind == "cbr":  # ConvBNReLU
            p, s = _bn(sd, f"{key}.bn", to_np)
            dst_p[name] = {"conv": _conv(sd, f"{key}.conv", to_np),
                           "bn": {"bn": p}}
            dst_s[name] = {"bn": {"bn": s}}

    rp, rs = {}, {}
    put(rp, rs, "conv1", ("conv", "cp.resnet.conv1"))
    put(rp, rs, "bn1", ("bn", "cp.resnet.bn1"))
    for L, blocks in ((1, 2), (2, 2), (3, 2), (4, 2)):
        for b in range(blocks):
            base = f"cp.resnet.layer{L}.{b}"
            bp, bs = {}, {}
            put(bp, bs, "conv1", ("conv", f"{base}.conv1"))
            put(bp, bs, "bn1", ("bn", f"{base}.bn1"))
            put(bp, bs, "conv2", ("conv", f"{base}.conv2"))
            put(bp, bs, "bn2", ("bn", f"{base}.bn2"))
            if f"{base}.downsample.0.weight" in sd:
                put(bp, bs, "down_conv", ("conv", f"{base}.downsample.0"))
                put(bp, bs, "down_bn", ("bn", f"{base}.downsample.1"))
            rp[f"layer{L}_{b}"], rs[f"layer{L}_{b}"] = bp, bs
    P["resnet"], S["resnet"] = rp, rs

    for arm in ("arm16", "arm32"):
        ap, as_ = {}, {}
        put(ap, as_, "conv", ("cbr", f"cp.{arm}.conv"))
        put(ap, as_, "conv_atten", ("conv", f"cp.{arm}.conv_atten"))
        put(ap, as_, "bn_atten", ("bn", f"cp.{arm}.bn_atten"))
        P[arm], S[arm] = ap, as_
    for head in ("conv_head16", "conv_head32", "conv_avg"):
        put(P, S, head, ("cbr", f"cp.{head}"))
    fp, fs = {}, {}
    put(fp, fs, "convblk", ("cbr", "ffm.convblk"))
    put(fp, fs, "conv1", ("conv", "ffm.conv1"))
    put(fp, fs, "conv2", ("conv", "ffm.conv2"))
    P["ffm"], S["ffm"] = fp, fs
    op, os_ = {}, {}
    put(op, os_, "conv", ("cbr", "conv_out.conv"))
    put(op, os_, "conv_out", ("conv", "conv_out.conv_out"))
    P["conv_out"], S["conv_out"] = op, os_
    return {"params": P, "batch_stats": S}
