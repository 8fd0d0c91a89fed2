"""PD-FGC discriminator family (PatchGAN / multiscale / feature), in flax.

TPU-native equivalent of
/root/reference/third_party/pd_fgc_inference/lib/models/networks/discriminator.py:
- ``NLayerDiscriminator`` (:48-102): SPADE-style PatchGAN, k4 pad2 convs,
  spectral-norm + instance-norm ("spectralinstance",
  architecture.py:35-71), LeakyReLU(0.2); returns the per-stage feature
  list INCLUDING the input (:90-102 ``results[0:]``).
- ``MultiscaleDiscriminator`` (:9-44): num_D copies over an avg-pool
  (k3 s2 p1, count_include_pad=False) image pyramid.
- ``ImageDiscriminator`` (:129-174): classic pix2pix PatchGAN (k4 pad1,
  batch-norm, bias only under instance norm).
- ``FeatureDiscriminator`` (:177-188): dropout + 512->num_labels linear.

The reference repo is inference-only and ships NO trainer for these nets
(SURVEY.md §2.7 "support nets"); the matching GAN objectives (hinge /
lsgan / feature-matching) live in ``train/gan.py``.

Spectral norm: torch's eval-mode forward uses the STORED u, v vectors
(sigma = u^T W v) — the importer bakes W/sigma into the kernel for exact
inference parity, while ``SpectralConv`` maintains its own (u, v) in a
``spectral`` variable collection with one power iteration per training
call for JAX-side training.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..infra.torch_compat import to_np


def _l2n(v, eps=1e-12):
    return v / jnp.maximum(jnp.linalg.norm(v), eps)


class SpectralConv(nn.Module):
    """Conv2d with spectral weight normalisation (power iteration).

    Matches ``torch.nn.utils.spectral_norm(Conv2d(...))`` semantics: the
    weight matrix is reshaped to (out, -1) in torch (O, I, kh, kw) order;
    u/v live in the ``spectral`` collection and are updated with one power
    iteration when ``update_stats=True``.
    """

    features: int
    kernel_size: int = 4
    stride: int = 1
    padding: int = 2
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, in_ch, self.features),
            self.dtype,
        )
        # torch reshape order: (O, I, kh, kw) -> (O, I*kh*kw)
        wmat = jnp.transpose(kernel, (3, 2, 0, 1)).reshape(self.features, -1)
        u = self.variable("spectral", "u",
                          lambda: _l2n(jnp.ones((self.features,), self.dtype)))
        v = self.variable("spectral", "v",
                          lambda: _l2n(jnp.ones((wmat.shape[1],), self.dtype)))
        if update_stats and not self.is_initializing():
            v_new = _l2n(wmat.T @ u.value)
            u_new = _l2n(wmat @ v_new)
            u.value, v.value = u_new, v_new
        sigma = u.value @ (wmat @ v.value)
        w = kernel / sigma
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (self.stride, self.stride),
            [(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,), self.dtype)
        return y


def instance_norm_2d(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """InstanceNorm2d(affine=False) over NHWC spatial dims."""
    mu = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


class NLayerDiscriminator(nn.Module):
    """SPADE-style PatchGAN (discriminator.py:48-102).

    norm: 'spectralinstance' (default upstream), 'instance', or 'none'.
    Returns [input, feat_0, ..., logits] when ``get_features`` else logits.
    """

    ndf: int = 64
    n_layers: int = 4
    norm: str = "spectralinstance"
    get_features: bool = True
    dtype: jnp.dtype = jnp.float32

    def _norm_conv(self, x, features, stride, name, update_stats):
        spectral = self.norm.startswith("spectral")
        sub = self.norm[len("spectral"):] if spectral else self.norm
        use_bias = sub in ("none", "")  # bias removed under a norm layer
        if spectral:
            y = SpectralConv(features, 4, stride, 2, use_bias=use_bias,
                             dtype=self.dtype, name=name)(x, update_stats)
        else:
            y = nn.Conv(features, (4, 4), strides=stride, padding=2,
                        use_bias=use_bias, dtype=self.dtype, name=name)(x)
        if sub == "instance":
            y = instance_norm_2d(y)
        elif sub not in ("none", ""):
            raise ValueError(self.norm)
        return y

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool = False):
        feats: List[jax.Array] = [x]
        nf = self.ndf
        h = nn.Conv(nf, (4, 4), strides=2, padding=2, dtype=self.dtype,
                    name="conv0")(x)
        h = jax.nn.leaky_relu(h, 0.2)
        feats.append(h)
        for n in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            stride = 1 if n == self.n_layers - 1 else 2
            h = self._norm_conv(h, nf, stride, f"conv{n}", update_stats)
            h = jax.nn.leaky_relu(h, 0.2)
            feats.append(h)
        h = nn.Conv(1, (4, 4), strides=1, padding=2, dtype=self.dtype,
                    name="conv_out")(h)
        feats.append(h)
        return feats if self.get_features else h


def avg_pool_no_pad_count(x: jax.Array) -> jax.Array:
    """F.avg_pool2d(k3, s2, p1, count_include_pad=False) on NHWC
    (discriminator.py:27-30)."""
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    count = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    return summed / count


class MultiscaleDiscriminator(nn.Module):
    """num_D NLayer PatchGANs over an avg-pooled pyramid
    (discriminator.py:9-44). Returns a list (one per scale) of feature
    lists (or logits when ``get_features=False``)."""

    num_d: int = 2
    ndf: int = 64
    n_layers: int = 4
    norm: str = "spectralinstance"
    get_features: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool = False):
        out = []
        for i in range(self.num_d):
            out.append(
                NLayerDiscriminator(
                    self.ndf, self.n_layers, self.norm, self.get_features,
                    self.dtype, name=f"discriminator_{i}",
                )(x, update_stats)
            )
            if i + 1 < self.num_d:
                x = avg_pool_no_pad_count(x)
        return out


class ImageDiscriminator(nn.Module):
    """Classic pix2pix PatchGAN (discriminator.py:129-174): k4 p1 convs,
    batch-norm (inference stats), final 1-channel logit map."""

    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = nn.Conv(self.ndf, (4, 4), strides=2, padding=1, dtype=self.dtype,
                    name="conv0")(x)
        h = jax.nn.leaky_relu(h, 0.2)
        mult = 1
        for n in range(1, self.n_layers):
            mult = min(2 ** n, 8)
            h = nn.Conv(self.ndf * mult, (4, 4), strides=2, padding=1,
                        use_bias=False, dtype=self.dtype, name=f"conv{n}")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"bn{n}")(h)
            h = jax.nn.leaky_relu(h, 0.2)
        mult = min(2 ** self.n_layers, 8)
        h = nn.Conv(self.ndf * mult, (4, 4), strides=1, padding=1,
                    use_bias=False, dtype=self.dtype,
                    name=f"conv{self.n_layers}")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         name=f"bn{self.n_layers}")(h)
        h = jax.nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (4, 4), strides=1, padding=1, dtype=self.dtype,
                       name="conv_out")(h)


class FeatureDiscriminator(nn.Module):
    """512-d feature -> label logits (discriminator.py:177-188)."""

    num_labels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, rng: Optional[jax.Array] = None,
                 train: bool = False) -> jax.Array:
        x = x.reshape(-1, 512)
        if train:
            if rng is None:
                raise ValueError("dropout rng required when train=True")
            keep = jax.random.bernoulli(rng, 0.5, x.shape)
            x = jnp.where(keep, x / 0.5, 0.0)
        return nn.Dense(self.num_labels, dtype=self.dtype, name="fc")(x)


# --- torch import ------------------------------------------------------------


def _spectral_baked_kernel(sd: Mapping[str, Any], key: str) -> np.ndarray:
    """Bake torch eval-mode spectral norm: W / (u^T W v) with stored u, v."""
    w = to_np(sd[f"{key}.weight_orig"])
    u = to_np(sd[f"{key}.weight_u"])
    v = to_np(sd[f"{key}.weight_v"])
    sigma = float(u @ (w.reshape(w.shape[0], -1) @ v))
    return (w / sigma).transpose(2, 3, 1, 0)


def nlayer_params_from_torch(
    sd: Mapping[str, Any], n_layers: int = 4, prefix: str = "",
    norm: str = "spectralinstance",
) -> Dict[str, Any]:
    """Reference NLayerDiscriminator state dict -> flax params.

    Torch layout (discriminator.py:61-77): ``model0.0`` first conv,
    ``model{n}.0.0`` spectral-wrapped convs (Sequential(conv, norm)),
    ``model{n_layers}.0`` final conv.
    """
    p = prefix
    P: Dict[str, Any] = {
        "conv0": {"kernel": to_np(sd[f"{p}model0.0.weight"]).transpose(2, 3, 1, 0),
                  "bias": to_np(sd[f"{p}model0.0.bias"])},
    }
    S: Dict[str, Any] = {}
    spectral = norm.startswith("spectral")
    for n in range(1, n_layers):
        if spectral:
            P[f"conv{n}"] = {
                "kernel": _spectral_baked_kernel(sd, f"{p}model{n}.0.0")}
            S[f"conv{n}"] = {
                "u": to_np(sd[f"{p}model{n}.0.0.weight_u"]),
                "v": to_np(sd[f"{p}model{n}.0.0.weight_v"]),
            }
        else:
            P[f"conv{n}"] = {
                "kernel": to_np(sd[f"{p}model{n}.0.0.weight"]).transpose(2, 3, 1, 0)}
    P["conv_out"] = {
        "kernel": to_np(sd[f"{p}model{n_layers}.0.weight"]).transpose(2, 3, 1, 0),
        "bias": to_np(sd[f"{p}model{n_layers}.0.bias"]),
    }
    out: Dict[str, Any] = {"params": P}
    if S:
        out["spectral"] = S
    return out


def image_discriminator_params_from_torch(
    sd: Mapping[str, Any], n_layers: int = 3, prefix: str = "model.",
) -> Dict[str, Any]:
    """Reference ImageDiscriminator (torch Sequential indices: conv0 at 0,
    then [conv, bn, lrelu] triples, final conv last) -> flax variables."""
    P: Dict[str, Any] = {
        "conv0": {"kernel": to_np(sd[f"{prefix}0.weight"]).transpose(2, 3, 1, 0),
                  "bias": to_np(sd[f"{prefix}0.bias"])},
    }
    S: Dict[str, Any] = {}
    idx = 2  # after conv0 + LeakyReLU
    for n in range(1, n_layers + 1):
        P[f"conv{n}"] = {
            "kernel": to_np(sd[f"{prefix}{idx}.weight"]).transpose(2, 3, 1, 0)}
        P[f"bn{n}"], S[f"bn{n}"] = (
            {"scale": to_np(sd[f"{prefix}{idx + 1}.weight"]),
             "bias": to_np(sd[f"{prefix}{idx + 1}.bias"])},
            {"mean": to_np(sd[f"{prefix}{idx + 1}.running_mean"]),
             "var": to_np(sd[f"{prefix}{idx + 1}.running_var"])},
        )
        idx += 3
    P["conv_out"] = {
        "kernel": to_np(sd[f"{prefix}{idx}.weight"]).transpose(2, 3, 1, 0),
        "bias": to_np(sd[f"{prefix}{idx}.bias"])}
    return {"params": P, "batch_stats": S}


def multiscale_params_from_torch(
    sd: Mapping[str, Any], num_d: int = 2, n_layers: int = 4,
    prefix: str = "", norm: str = "spectralinstance",
) -> Dict[str, Any]:
    P: Dict[str, Any] = {}
    S: Dict[str, Any] = {}
    for i in range(num_d):
        sub = nlayer_params_from_torch(
            sd, n_layers, f"{prefix}discriminator_{i}.", norm)
        P[f"discriminator_{i}"] = sub["params"]
        if "spectral" in sub:
            S[f"discriminator_{i}"] = sub["spectral"]
    out: Dict[str, Any] = {"params": P}
    if S:
        out["spectral"] = S
    return out
