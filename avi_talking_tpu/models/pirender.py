"""PIRender: 3DMM-coefficient-driven 2D face reenactment (flax, NHWC).

TPU-native rebuild of the reference's neural renderer
(/root/reference/third_party/pirender/generators/face_model.py:12-128 +
generators/base_function.py), used both as a standalone generator and as the
stage-1 render-loss backbone (models/faceformer.py:187-204,488-536).

Default config = flame_wo_crop.yaml gen.param: coeff 59 x 27-frame window ->
MappingNet (dilated 1D convs) -> 256-d descriptor; WarpingNet (ADAIN
hourglass -> 2-ch flow -> bilinear warp); EditingNet (U-Net with ADAIN
residual blocks) -> refined image. use_spect=False (no spectral norm —
matches the shipped config).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class PIRenderConfig:
    coeff_nc: int = 59
    descriptor_nc: int = 256
    mapping_layers: int = 3
    image_nc: int = 3
    base_nc_warp: int = 32
    base_nc_edit: int = 64
    max_nc: int = 256
    encoder_layers: int = 5
    decoder_layers: int = 3
    editing_layers: int = 3
    num_res_blocks: int = 2

    @classmethod
    def tiny(cls) -> "PIRenderConfig":
        return cls(
            coeff_nc=9, descriptor_nc=32, mapping_layers=1, base_nc_warp=8,
            base_nc_edit=8, max_nc=32, encoder_layers=3, decoder_layers=2,
            editing_layers=2, num_res_blocks=1,
        )


def _lrelu(x):
    return jax.nn.leaky_relu(x, negative_slope=0.1)


class LayerNorm2d(nn.Module):
    """torch F.layer_norm over (C,H,W) with per-channel affine (NHWC here)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        w = self.param("weight", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = x.mean(axis=(1, 2, 3), keepdims=True)
        var = jnp.var(x, axis=(1, 2, 3), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * w + b


class Adain(nn.Module):
    """Instance norm (no affine) + descriptor-conditioned scale/shift."""

    norm_nc: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, z):  # x (B,H,W,C), z (B,D)
        mean = x.mean(axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        normalized = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        h = jax.nn.relu(nn.Dense(128, dtype=self.dtype, name="mlp_shared")(z))
        gamma = nn.Dense(self.norm_nc, dtype=self.dtype, name="mlp_gamma")(h)
        beta = nn.Dense(self.norm_nc, dtype=self.dtype, name="mlp_beta")(h)
        return normalized * (1.0 + gamma[:, None, None]) + beta[:, None, None]


def _conv(f, k, s=1, p=None, name=None, dtype=jnp.float32):
    pad = p if p is not None else k // 2
    return nn.Conv(f, (k, k), strides=(s, s), padding=pad, dtype=dtype, name=name)


class _ConvT2x(nn.Module):
    """torch ConvTranspose2d(k3, s2, p1, output_padding=1) == 2x upsample."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(
            self.features, (3, 3), strides=(2, 2),
            padding=((1, 2), (1, 2)), transpose_kernel=True,
            dtype=self.dtype, name="conv",
        )(x)


class MappingNet(nn.Module):
    """(B, coeff_nc, T=27) coefficient window -> (B, descriptor_nc)."""

    cfg: PIRenderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, coeff_window):  # (B, T, coeff_nc) NLC
        c = self.cfg
        x = nn.Conv(c.descriptor_nc, (7,), padding="VALID", dtype=self.dtype,
                    name="first")(coeff_window)
        for i in range(c.mapping_layers):
            h = nn.Conv(
                c.descriptor_nc, (3,), padding="VALID", kernel_dilation=(3,),
                dtype=self.dtype, name=f"encoder{i}",
            )(_lrelu(x))
            x = h + x[:, 3:-3]
        return x.mean(axis=1)  # adaptive avg pool over remaining time


class AdainEncoderBlock(nn.Module):
    in_nc: int
    out_nc: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, z):
        h = Adain(self.in_nc, self.dtype, name="norm_0")(x, z)
        h = _conv(self.out_nc, 4, 2, 1, "conv_0", self.dtype)(_lrelu(h))
        h = Adain(self.out_nc, self.dtype, name="norm_1")(h, z)
        return _conv(self.out_nc, 3, 1, 1, "conv_1", self.dtype)(_lrelu(h))


class AdainDecoderBlock(nn.Module):
    in_nc: int
    out_nc: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, z):
        s = Adain(self.in_nc, self.dtype, name="norm_s")(x, z)
        s = _ConvT2x(self.out_nc, self.dtype, name="conv_s")(_lrelu(s))
        h = Adain(self.in_nc, self.dtype, name="norm_0")(x, z)
        h = _conv(self.out_nc, 3, 1, 1, "conv_0", self.dtype)(_lrelu(h))
        h = Adain(self.out_nc, self.dtype, name="norm_1")(h, z)
        h = _ConvT2x(self.out_nc, self.dtype, name="conv_1")(_lrelu(h))
        return s + h


class AdainHourglass(nn.Module):
    cfg: PIRenderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image, z):
        c = self.cfg
        ngf, img_f = c.base_nc_warp, c.max_nc
        x = _conv(ngf, 7, 1, 3, "input_layer", self.dtype)(image)
        skips = [x]
        ch = ngf
        for i in range(c.encoder_layers):
            in_ch = min(ngf * 2**i, img_f)
            out_ch = min(ngf * 2 ** (i + 1), img_f)
            x = AdainEncoderBlock(in_ch, out_ch, self.dtype, name=f"encoder{i}")(x, z)
            skips.append(x)
            ch = out_ch
        out = skips.pop()
        for i in reversed(range(c.encoder_layers - c.decoder_layers, c.encoder_layers)):
            in_ch = min(ngf * 2 ** (i + 1), img_f)
            in_ch = in_ch * 2 if i != c.encoder_layers - 1 else in_ch
            out_ch = min(ngf * 2**i, img_f)
            out = AdainDecoderBlock(in_ch, out_ch, self.dtype, name=f"decoder{i}")(out, z)
            out = jnp.concatenate([out, skips.pop()], axis=-1)
        return out  # channels = out_ch * 2


def make_coordinate_grid(h: int, w: int, dtype=jnp.float32) -> jax.Array:
    x = 2 * (jnp.arange(w, dtype=dtype) / (w - 1)) - 1
    y = 2 * (jnp.arange(h, dtype=dtype) / (h - 1)) - 1
    xx = jnp.broadcast_to(x[None, :], (h, w))
    yy = jnp.broadcast_to(y[:, None], (h, w))
    return jnp.stack([xx, yy], axis=-1)  # (H, W, 2)


def convert_flow_to_deformation(flow: jax.Array) -> jax.Array:
    """(B, H, W, 2) pixel flow -> normalized sampling grid (B, H, W, 2)."""
    B, h, w, _ = flow.shape
    norm = jnp.stack([flow[..., 0] / (w - 1), flow[..., 1] / (h - 1)], axis=-1) * 2
    return make_coordinate_grid(h, w, flow.dtype)[None] + norm


def grid_sample_bilinear(image: jax.Array, grid: jax.Array) -> jax.Array:
    """torch.nn.functional.grid_sample(align_corners=False, zeros padding).

    image (B, H, W, C); grid (B, Hg, Wg, 2) in [-1, 1] (x, y).
    """
    B, H, W, C = image.shape
    gx = (grid[..., 0] + 1) * W / 2 - 0.5
    gy = (grid[..., 1] + 1) * H / 2 - 0.5
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = gx - x0
    wy = gy - y0

    def gather(ix, iy):
        valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        flat = image.reshape(B, H * W, C)
        idx = iyc * W + ixc  # (B, Hg, Wg)
        vals = jnp.take_along_axis(
            flat, idx.reshape(B, -1, 1), axis=1
        ).reshape(idx.shape + (C,))
        return vals * valid[..., None]

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


class WarpingNet(nn.Module):
    cfg: PIRenderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image, descriptor):
        c = self.cfg
        h = AdainHourglass(c, self.dtype, name="hourglass")(image, descriptor)
        h = LayerNorm2d(h.shape[-1], self.dtype, name="flow_norm")(h)
        flow = _conv(2, 7, 1, 3, "flow_out", self.dtype)(_lrelu(h))
        deformation = convert_flow_to_deformation(flow)
        # flow is predicted at the hourglass output resolution; upsample the
        # deformation to the image size before sampling (flow_util.warp_image)
        if deformation.shape[1:3] != image.shape[1:3]:
            deformation = jax.image.resize(
                deformation,
                (deformation.shape[0], image.shape[1], image.shape[2], 2),
                method="bilinear",
            )
        warped = grid_sample_bilinear(image, deformation)
        return {"flow_field": flow, "warp_image": warped, "deformation": deformation}


class FineAdainResBlock(nn.Module):
    nc: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, z):
        dx = _conv(self.nc, 3, 1, 1, "conv1", self.dtype)(x)
        dx = _lrelu(Adain(self.nc, self.dtype, name="norm1")(dx, z))
        dx2 = _conv(self.nc, 3, 1, 1, "conv2", self.dtype)(x)
        dx2 = Adain(self.nc, self.dtype, name="norm2")(dx2, z)
        return dx2 + x


class EditingNet(nn.Module):
    cfg: PIRenderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_image, warp_image, descriptor):
        c = self.cfg
        ngf, img_f, L = c.base_nc_edit, c.max_nc, c.editing_layers
        x = jnp.concatenate([input_image, warp_image], axis=-1)
        # FineEncoder: first 7x7 + LN + act, then down blocks (conv+LN+act+avgpool)
        x = _conv(ngf, 7, 1, 3, "first_conv", self.dtype)(x)
        x = _lrelu(LayerNorm2d(ngf, self.dtype, name="first_norm")(x))
        skips = [x]
        for i in range(L):
            out_ch = min(ngf * 2 ** (i + 1), img_f)
            x = _conv(out_ch, 3, 1, 1, f"down{i}_conv", self.dtype)(x)
            x = _lrelu(LayerNorm2d(out_ch, self.dtype, name=f"down{i}_norm")(x))
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            skips.append(x)
        out = skips.pop()
        for i in reversed(range(L)):
            in_ch = min(ngf * 2 ** (i + 1), img_f)
            out_ch = min(ngf * 2**i, img_f)
            for r in range(c.num_res_blocks):
                out = FineAdainResBlock(in_ch, self.dtype, name=f"res{i}_{r}")(
                    out, descriptor
                )
            # UpBlock: nearest x2 + conv + LN + act
            up = jax.image.resize(
                out, (out.shape[0], out.shape[1] * 2, out.shape[2] * 2, out.shape[3]),
                method="nearest",
            )
            up = _conv(out_ch, 3, 1, 1, f"up{i}_conv", self.dtype)(up)
            up = _lrelu(LayerNorm2d(out_ch, self.dtype, name=f"up{i}_norm")(up))
            skip = skips.pop()
            jump = _conv(out_ch, 3, 1, 1, f"jump{i}_conv", self.dtype)(skip)
            jump = _lrelu(LayerNorm2d(out_ch, self.dtype, name=f"jump{i}_norm")(jump))
            out = up + jump
        out = _conv(c.image_nc, 7, 1, 3, "final_conv", self.dtype)(out)
        return jnp.tanh(out)


# --- torch import ------------------------------------------------------------


def _np(t):
    import numpy as np

    return np.asarray(getattr(t, "detach", lambda: t)().cpu().numpy()
                      if hasattr(t, "detach") else t)


def pirender_params_from_torch(sd, cfg: PIRenderConfig):
    """Reference ``net_G`` state dict -> flax FaceGenerator variables.

    Layout (generators/face_model.py + base_function.py; the driver consumes
    ``ckpt_dict['net_G']`` with a ``module.`` strip, models/faceformer.py:193-196):
    ``mapping_net.first.0 / encoder{i}.1`` Conv1d;
    ``warpping_net.hourglass.encoder.input_layer|encoder{i}.*`` and
    ``...decoder.decoder{i}.*`` (ADAIN norms = mlp_shared.0/mlp_gamma/mlp_beta,
    conv_1/conv_s are ConvTranspose2d on the decoder);
    ``warpping_net.flow_out.0|2`` (LayerNorm2d weight stored (C,1,1) + conv);
    ``editing_net.encoder.first|down{i}.model.*`` and
    ``editing_net.decoder.up{i}|res{i}.res{r}|jump{i}|final.model.*``.
    """
    sd = {(k[len("module."):] if k.startswith("module.") else k): v
          for k, v in sd.items()}

    def conv1d(key):
        return {"kernel": _np(sd[f"{key}.weight"]).transpose(2, 1, 0),
                "bias": _np(sd[f"{key}.bias"])}

    def conv2d(key):
        return {"kernel": _np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0),
                "bias": _np(sd[f"{key}.bias"])}

    def convT2d(key):  # (I, O, kh, kw) -> (kh, kw, O, I), transpose_kernel
        return {"conv": {"kernel": _np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0),
                         "bias": _np(sd[f"{key}.bias"])}}

    def adain(key):
        return {
            "mlp_shared": {"kernel": _np(sd[f"{key}.mlp_shared.0.weight"]).T,
                           "bias": _np(sd[f"{key}.mlp_shared.0.bias"])},
            "mlp_gamma": {"kernel": _np(sd[f"{key}.mlp_gamma.weight"]).T,
                          "bias": _np(sd[f"{key}.mlp_gamma.bias"])},
            "mlp_beta": {"kernel": _np(sd[f"{key}.mlp_beta.weight"]).T,
                         "bias": _np(sd[f"{key}.mlp_beta.bias"])},
        }

    def ln2d(key):  # torch LayerNorm2d stores (C, 1, 1)
        return {"weight": _np(sd[f"{key}.weight"]).reshape(-1),
                "bias": _np(sd[f"{key}.bias"]).reshape(-1)}

    P = {}
    # mapping net
    m = {"first": conv1d("mapping_net.first.0")}
    for i in range(cfg.mapping_layers):
        m[f"encoder{i}"] = conv1d(f"mapping_net.encoder{i}.1")
    P["mapping_net"] = m

    # warping net
    hg = {"input_layer": conv2d("warpping_net.hourglass.encoder.input_layer")}
    for i in range(cfg.encoder_layers):
        b = f"warpping_net.hourglass.encoder.encoder{i}"
        hg[f"encoder{i}"] = {
            "conv_0": conv2d(f"{b}.conv_0"),
            "conv_1": conv2d(f"{b}.conv_1"),
            "norm_0": adain(f"{b}.norm_0"),
            "norm_1": adain(f"{b}.norm_1"),
        }
    for i in range(cfg.encoder_layers - cfg.decoder_layers, cfg.encoder_layers):
        b = f"warpping_net.hourglass.decoder.decoder{i}"
        hg[f"decoder{i}"] = {
            "conv_0": conv2d(f"{b}.conv_0"),
            "conv_1": convT2d(f"{b}.conv_1"),
            "conv_s": convT2d(f"{b}.conv_s"),
            "norm_0": adain(f"{b}.norm_0"),
            "norm_1": adain(f"{b}.norm_1"),
            "norm_s": adain(f"{b}.norm_s"),
        }
    P["warpping_net"] = {
        "hourglass": hg,
        "flow_norm": ln2d("warpping_net.flow_out.0"),
        "flow_out": conv2d("warpping_net.flow_out.2"),
    }

    # editing net
    e = {
        "first_conv": conv2d("editing_net.encoder.first.model.0"),
        "first_norm": ln2d("editing_net.encoder.first.model.1"),
    }
    for i in range(cfg.editing_layers):
        e[f"down{i}_conv"] = conv2d(f"editing_net.encoder.down{i}.model.0")
        e[f"down{i}_norm"] = ln2d(f"editing_net.encoder.down{i}.model.1")
    for i in range(cfg.editing_layers):
        e[f"up{i}_conv"] = conv2d(f"editing_net.decoder.up{i}.model.0")
        e[f"up{i}_norm"] = ln2d(f"editing_net.decoder.up{i}.model.1")
        e[f"jump{i}_conv"] = conv2d(f"editing_net.decoder.jump{i}.model.0")
        e[f"jump{i}_norm"] = ln2d(f"editing_net.decoder.jump{i}.model.1")
        for r in range(cfg.num_res_blocks):
            b = f"editing_net.decoder.res{i}.res{r}"
            e[f"res{i}_{r}"] = {
                "conv1": conv2d(f"{b}.conv1"),
                "conv2": conv2d(f"{b}.conv2"),
                "norm1": adain(f"{b}.norm1"),
                "norm2": adain(f"{b}.norm2"),
            }
    e["final_conv"] = conv2d("editing_net.decoder.final.model.0")
    P["editing_net"] = e
    return {"params": P}


class FaceGenerator(nn.Module):
    """MappingNet + WarpingNet + EditingNet (PIRender top level)."""

    cfg: PIRenderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_image, coeff_window, stage: Optional[str] = None):
        """input_image (B, H, W, 3) in [-1,1]; coeff_window (B, T, coeff_nc)."""
        descriptor = MappingNet(self.cfg, self.dtype, name="mapping_net")(coeff_window)
        out = WarpingNet(self.cfg, self.dtype, name="warpping_net")(
            input_image, descriptor
        )
        if stage != "warp":
            out["fake_image"] = EditingNet(self.cfg, self.dtype, name="editing_net")(
                input_image, out["warp_image"], descriptor
            )
        return out
