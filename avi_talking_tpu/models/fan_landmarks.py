"""FAN 2D landmark detector (stacked hourglass, face_alignment `2DFAN`).

TPU-native equivalent of the external ``face_alignment`` package that the
reference's preprocessing wraps at
/root/reference/third_party/inferno/inferno/utils/FaceDetector.py:75-155
(class ``FAN``): ``landmarks_from_batch_no_face_detection`` runs
``face_alignment_net`` on 256x256 crops and decodes 68-point landmarks +
confidences via ``get_preds_fromhm``. The reference never trains this net —
it consumes pretrained 2DFAN4 weights to produce landmarks/validity during
dataset preprocessing (FaceVideoDataModule) — so we provide the network in
flax NHWC, a torch state-dict importer, and a vectorised jnp heatmap decode
so ``preprocess-mead`` can detect landmarks in-framework.

Architecture (public 2DFAN4, stable since Bulat & Tzimiropoulos 2017):
stem conv 7x7/2 -> ConvBlock(64,128) -> avgpool/2 -> ConvBlock(128,128)
-> ConvBlock(128,256), then ``num_modules`` x [HourGlass(depth 4,
avg-pool down / nearest up) -> ConvBlock -> 1x1 conv -> BN -> ReLU ->
1x1 conv to 68 heatmaps], with intermediate-supervision re-injection
(``bl``/``al`` 1x1 convs) between modules. Input SxS RGB in [0,1];
heatmaps (S/4)x(S/4). Differs from PD-FGC's ``FAN_use``
(models/fan_encoder.py) in pooling (avg vs max), upsampling (nearest vs
bilinear) and the multi-module stacking, but shares the same ConvBlock.

Decode semantics are pinned to face_alignment.utils.get_preds_fromhm:
1-based argmax position, +-0.25px shift toward the larger interior
neighbour, -0.5, then x4 back to input pixels.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .fan_encoder import ConvBlock, _BN, _bn, _conv2d, _convblock


class FanHourGlass(nn.Module):
    """face_alignment HourGlass: avg-pool down, nearest-neighbour up."""

    depth: int = 4
    features: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.features
        if x.shape[1] % (2 ** self.depth) or x.shape[2] % (2 ** self.depth):
            raise ValueError(
                f"FanHourGlass(depth={self.depth}) needs spatial dims "
                f"divisible by {2 ** self.depth}, got {x.shape[1:3]} — feed "
                "the detector 256px crops (FaceDetector.py:147-151; "
                "FanLandmarkDetector resizing or facecrop stage-1 does this)"
            )

        def level(inp, lvl):
            up1 = ConvBlock(f, f, self.dtype, name=f"b1_{lvl}")(inp, train)
            low1 = nn.avg_pool(inp, (2, 2), strides=(2, 2))
            low1 = ConvBlock(f, f, self.dtype, name=f"b2_{lvl}")(low1, train)
            if lvl > 1:
                low2 = level(low1, lvl - 1)
            else:
                low2 = ConvBlock(f, f, self.dtype,
                                 name=f"b2_plus_{lvl}")(low1, train)
            low3 = ConvBlock(f, f, self.dtype, name=f"b3_{lvl}")(low2, train)
            # F.interpolate(scale_factor=2, mode='nearest') == 2x2 repeat
            up2 = jnp.repeat(jnp.repeat(low3, 2, axis=1), 2, axis=2)
            return up1 + up2

        return level(x, self.depth)


class FanLandmarkNet(nn.Module):
    """Stacked-hourglass heatmap regressor; returns (B, S/4, S/4, L).

    ``stem_features``/``features`` default to the public 2DFAN sizes
    (64/256); shrink both for tests. Returns the LAST module's heatmaps —
    inference semantics (face_alignment keeps only ``outputs[-1]``)."""

    num_modules: int = 4
    depth: int = 4
    stem_features: int = 64
    features: int = 256
    n_landmarks: int = 68
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, S, S, 3) in [0, 1]
        s, f = self.stem_features, self.features
        x = nn.Conv(s, (7, 7), strides=(2, 2), padding=3, dtype=self.dtype,
                    name="conv1")(x)
        x = jax.nn.relu(_BN(self.dtype, name="bn1")(x, train))
        x = ConvBlock(s, 2 * s, self.dtype, name="conv2")(x, train)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = ConvBlock(2 * s, 2 * s, self.dtype, name="conv3")(x, train)
        x = ConvBlock(2 * s, f, self.dtype, name="conv4")(x, train)

        previous = x
        out = None
        for i in range(self.num_modules):
            hg = FanHourGlass(self.depth, f, self.dtype,
                              name=f"m{i}")(previous, train)
            ll = ConvBlock(f, f, self.dtype, name=f"top_m_{i}")(hg, train)
            ll = nn.Conv(f, (1, 1), dtype=self.dtype,
                         name=f"conv_last{i}")(ll)
            ll = jax.nn.relu(_BN(self.dtype, name=f"bn_end{i}")(ll, train))
            out = nn.Conv(self.n_landmarks, (1, 1), dtype=self.dtype,
                          name=f"l{i}")(ll)
            if i < self.num_modules - 1:
                previous = (previous
                            + nn.Conv(f, (1, 1), dtype=self.dtype,
                                      name=f"bl{i}")(ll)
                            + nn.Conv(f, (1, 1), dtype=self.dtype,
                                      name=f"al{i}")(out))
        return out


def decode_heatmaps(hm: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """get_preds_fromhm on NHWC heatmaps (FaceDetector.py:128-145 path).

    Returns (pts, scores): ``pts`` (B, L, 2) x/y in HEATMAP pixels
    (matching the torch decode after its ``-= 0.5``), ``scores`` (B, L)
    peak heatmap values. Fully vectorised; jit-safe (static shapes)."""
    B, H, W, L = hm.shape
    flat = hm.reshape(B, H * W, L)
    idx = jnp.argmax(flat, axis=1)  # (B, L)
    scores = jnp.max(flat, axis=1)
    px = idx % W
    py = idx // W

    def peek(dx, dy):
        x = jnp.clip(px + dx, 0, W - 1)
        y = jnp.clip(py + dy, 0, H - 1)
        return jnp.take_along_axis(flat, (y * W + x)[:, None, :],
                                   axis=1)[:, 0, :]

    # +-0.25px toward the larger neighbour, interior peaks only
    # (get_preds_fromhm guards 0 < p < size-1)
    interior = ((px > 0) & (px < W - 1) & (py > 0) & (py < H - 1))
    shift_x = jnp.sign(peek(1, 0) - peek(-1, 0)) * 0.25
    shift_y = jnp.sign(peek(0, 1) - peek(0, -1)) * 0.25
    fx = px.astype(jnp.float32) + 0.5 + jnp.where(interior, shift_x, 0.0)
    fy = py.astype(jnp.float32) + 0.5 + jnp.where(interior, shift_y, 0.0)
    return jnp.stack([fx, fy], axis=-1), scores


class FanLandmarkDetector:
    """Batched landmark detection for preprocessing (chunked, jitted).

    ``__call__`` takes (T, S, S, 3) frames in [0, 1] and returns
    (landmarks, scores): landmarks (T, L, 2) in [-1, 1] image NDC (x right,
    y down — the convention of data.preprocess.landmarks_from_codes and the
    train-emoca landmark loss), scores (T, L) heatmap confidences. The
    reference divides decoded points by the input size to get [0, 1]
    (FaceDetector.py:142) — we additionally map to [-1, 1]."""

    def __init__(self, model: FanLandmarkNet, variables: Dict,
                 max_b: int = 16, input_size: int = None):
        """``input_size``: resize frames to this side before the net (the
        real 2DFAN4 wants 256 — FaceDetector.optimal_landmark_detector_im_
        size; its depth-4 hourglass rejects e.g. 224). None = feed as-is
        (tiny test configs). Landmarks are NDC either way."""
        self.model = model
        self.variables = variables
        self.max_b = max_b
        self.input_size = input_size

        def fwd(v, x):
            if x.dtype == jnp.uint8:  # uint8 transport: normalise on device
                x = x.astype(jnp.float32) / 255.0
            if input_size and x.shape[1:3] != (input_size, input_size):
                x = jax.image.resize(
                    x, (x.shape[0], input_size, input_size, 3), "bilinear")
            hm = model.apply(v, x, train=False)
            pts, scores = decode_heatmaps(hm)
            # heatmap px -> [0,1] per axis -> [-1,1]: normalising by the
            # ACTUAL heatmap dims (not input/4) stays exact when the stem
            # floors an odd size and for non-square crops; for the
            # canonical 256 -> 64 case this equals the reference's
            # pts * 4 / 256 (FaceDetector.py:142)
            rel = pts / jnp.asarray([hm.shape[2], hm.shape[1]], jnp.float32)
            return rel * 2.0 - 1.0, scores

        self._fwd = jax.jit(fwd)

    def __call__(self, frames) -> Tuple[Any, Any]:
        import numpy as np

        from ..data.batching import chunked_apply

        lmk, sc = chunked_apply(
            lambda c: self._fwd(self.variables, jnp.asarray(c)),
            frames, self.max_b)
        return lmk.astype(np.float32), sc.astype(np.float32)


# ----- torch import --------------------------------------------------------


def _hourglass_from_torch(sd: Mapping[str, Any], prefix: str, depth: int):
    p, s = {}, {}
    for lvl in range(1, depth + 1):
        for blk in (f"b1_{lvl}", f"b2_{lvl}", f"b3_{lvl}"):
            bp, bs = _convblock(sd, f"{prefix}.{blk}")
            p[blk], s[blk] = bp, bs
    bp, bs = _convblock(sd, f"{prefix}.b2_plus_1")
    p["b2_plus_1"], s["b2_plus_1"] = bp, bs
    return p, s


def fan_landmarks_params_from_torch(
    sd: Mapping[str, Any], num_modules: int = 4, depth: int = 4
) -> Dict[str, Any]:
    """face_alignment FAN.state_dict() -> flax variables.

    Key layout per the public net: ``conv1/bn1/conv2/conv3/conv4`` stem,
    then ``m{i}/top_m_{i}/conv_last{i}/bn_end{i}/l{i}`` per module and
    ``bl{i}/al{i}`` between modules. Accepts a bare state dict or one
    nested under 'state_dict' (the hub checkpoints are bare)."""
    if "state_dict" in sd and not any("conv1" in k for k in sd):
        sd = sd["state_dict"]
    P: Dict[str, Any] = {"conv1": _conv2d(sd, "conv1")}
    S: Dict[str, Any] = {}
    bp, bs = _bn(sd, "bn1")
    P["bn1"], S["bn1"] = {"bn": bp}, {"bn": bs}
    for name in ("conv2", "conv3", "conv4"):
        p, s = _convblock(sd, name)
        P[name], S[name] = p, s
    for i in range(num_modules):
        p, s = _hourglass_from_torch(sd, f"m{i}", depth)
        P[f"m{i}"], S[f"m{i}"] = p, s
        p, s = _convblock(sd, f"top_m_{i}")
        P[f"top_m_{i}"], S[f"top_m_{i}"] = p, s
        P[f"conv_last{i}"] = _conv2d(sd, f"conv_last{i}")
        bp, bs = _bn(sd, f"bn_end{i}")
        P[f"bn_end{i}"], S[f"bn_end{i}"] = {"bn": bp}, {"bn": bs}
        P[f"l{i}"] = _conv2d(sd, f"l{i}")
        if i < num_modules - 1:
            P[f"bl{i}"] = _conv2d(sd, f"bl{i}")
            P[f"al{i}"] = _conv2d(sd, f"al{i}")
    return {"params": P, "batch_stats": S}
