"""FLINT motion prior — encoder + full temporal VAE (training).

Completes models/flint.py (decoder-only inference path) with the encoder and
VAE wrapper of the reference's ``L2lVqVae``
(/root/reference/third_party/inferno/inferno/models/temporal/motion_prior/L2lMotionPrior.py:33-360):

  * squasher: Conv1d(k5, s2, replicate pad) then (q-1) x [Conv1d(k5, s1) +
    MaxPool1d(2)] stages, each LeakyReLU(0.2)+BatchNorm1d -> T/2^q latents,
  * linear embed -> PE -> transformer encoder,
  * Gaussian head (mean/logvar linears) + reparameterised sample,
  * VAE loss: reconstruction MSE on exp/jaw sequences + beta * KL.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.positional import periodic_positional_encoding, sinusoidal_positional_encoding
from ..ops.transformer import TransformerEncoder
from .flint import FlintConfig, FlintDecoder, _LeakyBN


def _replicate_pad_1d(x: jax.Array, pad: int = 2) -> jax.Array:
    return jnp.concatenate([x[:, :1]] * pad + [x] + [x[:, -1:]] * pad, axis=1)


class FlintEncoder(nn.Module):
    """(B, T, in_dim) motion -> (B, T/2^q, D) latent features."""

    cfg: FlintConfig
    in_dim: int = 53
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c = self.cfg
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        # squasher stage 0: strided conv /2
        h = nn.Conv(c.feature_dim, (5,), strides=(2,), padding="VALID",
                    name="squasher_0_conv", **dd)(_replicate_pad_1d(x))
        h = _LeakyBN(c.feature_dim, name="squasher_0_post", **dd)(
            h, use_running_average=not train
        )
        for i in range(1, c.quant_factor):
            h = nn.Conv(c.feature_dim, (5,), padding="VALID",
                        name=f"squasher_{i}_conv", **dd)(_replicate_pad_1d(h))
            h = _LeakyBN(c.feature_dim, name=f"squasher_{i}_post", **dd)(
                h, use_running_average=not train
            )
            h = nn.max_pool(h, (2,), strides=(2,))
        h = nn.Dense(c.feature_dim, name="encoder_linear_embedding", **dd)(h)
        T = h.shape[1]
        if c.positional_encoding == "sinusoidal":
            h = h + sinusoidal_positional_encoding(T, c.feature_dim, self.dtype)[None]
        elif c.positional_encoding == "periodic":
            h = h + periodic_positional_encoding(
                T, c.feature_dim, c.pe_period, self.dtype
            )[None]
        return TransformerEncoder(
            num_layers=c.num_layers, d_model=c.feature_dim, nhead=c.nhead,
            dim_feedforward=c.intermediate_size, activation=c.activation,
            name="encoder_transformer", **dd,
        )(h)


class FlintVAE(nn.Module):
    """Gaussian temporal VAE over exp+jaw sequences (L2lVqVae, VAE mode)."""

    cfg: FlintConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.encoder = FlintEncoder(c, in_dim=c.out_dim, name="encoder", **dd)
        self.mean = nn.Dense(c.feature_dim, name="mean", **dd)
        self.logvar = nn.Dense(c.feature_dim, name="logvar", **dd)
        self.decoder = FlintDecoder(c, name="decoder", **dd)

    def encode(self, motion: jax.Array, train: bool = False):
        feats = self.encoder(motion, train=train)
        return self.mean(feats), self.logvar(feats)

    def decode(self, latents: jax.Array, train: bool = False) -> jax.Array:
        return self.decoder(latents, train=train)

    def __call__(
        self,
        motion: jax.Array,  # (B, T, out_dim), T multiple of 2^q
        rng: Optional[jax.Array] = None,
        train: bool = False,
        sample: bool = True,
    ):
        mu, logvar = self.encode(motion, train)
        if sample and rng is not None:
            std = jnp.exp(0.5 * logvar)
            z = mu + std * jax.random.normal(rng, mu.shape, mu.dtype)
        else:
            z = mu
        recon = self.decode(z, train)
        return {"reconstruction": recon, "mu": mu, "logvar": logvar, "z": z}

    def loss(
        self, motion: jax.Array, rng: jax.Array, kl_weight: float = 0.01,
        train: bool = False,
        # train=True requires apply(..., mutable=["batch_stats"]) to collect
        # the BatchNorm running-stat updates
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        out = self(motion, rng, train=train)
        recon = jnp.mean((out["reconstruction"] - motion) ** 2)
        kl = -0.5 * jnp.mean(
            1 + out["logvar"] - out["mu"] ** 2 - jnp.exp(out["logvar"])
        )
        loss = recon + kl_weight * kl
        return loss, {"loss": loss, "recon": recon, "kl": kl}


class VectorQuantizer(nn.Module):
    """VQ-VAE discretisation bottleneck (the reference's quantizer mode of
    the motion prior: inferno motion_prior/VectorQuantizer.py:10-132,
    learning2listen-style): nearest-codebook assignment, straight-through
    gradients, alignment ||sg[z]-e||^2 / commitment ||z-sg[e]||^2 terms and
    codebook-usage perplexity. Input is (B, T, D) feature sequences."""

    codebook_size: int
    vector_dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> Dict[str, jax.Array]:
        emb = self.param(
            "embedding",
            lambda rng: jax.random.uniform(
                rng, (self.codebook_size, self.vector_dim), self.param_dtype,
                -1.0 / self.codebook_size, 1.0 / self.codebook_size,
            ),
        )
        flat = z.reshape(-1, self.vector_dim)
        d = (
            jnp.sum(flat ** 2, axis=1, keepdims=True)
            + jnp.sum(emb ** 2, axis=1)[None]
            - 2.0 * flat @ emb.T
        )
        idx = jnp.argmin(d, axis=1)
        z_q = emb[idx].reshape(z.shape).astype(z.dtype)
        alignment = jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2)
        commitment = jnp.mean((z_q - jax.lax.stop_gradient(z)) ** 2)
        z_st = z + jax.lax.stop_gradient(z_q - z)  # straight-through
        one_hot = jax.nn.one_hot(idx, self.codebook_size, dtype=jnp.float32)
        e_mean = one_hot.mean(axis=0)
        perplexity = jnp.exp(-jnp.sum(e_mean * jnp.log(e_mean + 1e-10)))
        return {
            "quantized": z_st,
            "codes": idx.reshape(z.shape[:-1]),
            "alignment": alignment,
            "commitment": commitment,
            "perplexity": perplexity,
        }


class GumbelVectorQuantizer(nn.Module):
    """dVAE-style Gumbel-softmax quantizer (the reference's alternative
    quantizer type: inferno motion_prior/GumbelVectorQuantizer.py:34-113).
    The encoder output is treated as LOGITS over the codebook
    (vector dim == codebook_size upstream); soft assignments are
    softmax((logits + gumbel)/tau), z_q their linear combination of
    codebook vectors, plus a KL(uniform || assignments) regulariser.

    Perplexity here is computed from the hard argmax one-hots; the
    reference computes it on a never-filled zeros buffer
    (GumbelVectorQuantizer.py:97-101 — always exp(0)=1), which we treat as
    an upstream bug rather than behaviour to preserve."""

    codebook_size: int
    vector_dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, logits: jax.Array, rng: Optional[jax.Array] = None,
                 tau: float = 1.0) -> Dict[str, jax.Array]:
        emb = self.param(
            "embedding",
            lambda r: jax.random.uniform(
                r, (self.codebook_size, self.vector_dim), self.param_dtype,
                -1.0 / self.codebook_size, 1.0 / self.codebook_size,
            ),
        )
        B, T = logits.shape[:2]
        flat = logits.reshape(B * T, -1)
        if rng is not None:
            u = jax.random.uniform(rng, flat.shape, flat.dtype, 1e-10, 1.0)
            flat = flat + (-jnp.log(-jnp.log(u)))  # gumbel noise
        soft = jax.nn.softmax(flat / tau, axis=-1)
        z_q = (soft @ emb).reshape(B, T, self.vector_dim).astype(logits.dtype)
        uniform = 1.0 / self.codebook_size
        kl = jnp.mean(jnp.sum(
            uniform * (jnp.log(uniform + 1e-10) - jnp.log(soft + 1e-10)),
            axis=1))
        idx = jnp.argmax(soft, axis=-1)
        e_mean = jax.nn.one_hot(idx, self.codebook_size,
                                dtype=jnp.float32).mean(axis=0)
        perplexity = jnp.exp(-jnp.sum(e_mean * jnp.log(e_mean + 1e-10)))
        return {
            "quantized": z_q,
            "soft_assignments": soft,
            "codes": idx.reshape(B, T),
            "kl_divergence": kl,
            "perplexity": perplexity,
        }

    @staticmethod
    def codebook_entry(emb: jax.Array, indices: jax.Array) -> jax.Array:
        """Indices -> codebook vectors (get_codebook_entry, :122-138)."""
        return emb[indices]


class FlintVQVAE(nn.Module):
    """VQ mode of the motion prior (``L2lVqVae`` with a quantizer,
    L2lMotionPrior.py:54-73): encoder -> VectorQuantizer -> decoder.
    Loss follows the classic VQ-VAE weighting (VectorQuantizer.py:80-84:
    ``beta * codebook_alignment + codebook_commitment``):
    recon + ||z_q - sg[z]||^2 (codebook) + beta * ||sg[z_q] - z||^2
    (encoder commitment, beta=0.25)."""

    cfg: FlintConfig
    codebook_size: int = 256
    beta: float = 0.25
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.encoder = FlintEncoder(c, in_dim=c.out_dim, name="encoder", **dd)
        self.quantizer = VectorQuantizer(
            self.codebook_size, c.feature_dim, name="quantizer", **dd)
        self.decoder = FlintDecoder(c, name="decoder", **dd)

    def encode(self, motion: jax.Array, train: bool = False) -> Dict[str, jax.Array]:
        return self.quantizer(self.encoder(motion, train=train))

    def decode(self, latents: jax.Array, train: bool = False) -> jax.Array:
        return self.decoder(latents, train=train)

    def __call__(self, motion: jax.Array, train: bool = False):
        q = self.encode(motion, train)
        recon = self.decode(q["quantized"], train)
        return {"reconstruction": recon, **q}

    def loss(
        self, motion: jax.Array, train: bool = False
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        out = self(motion, train=train)
        recon = jnp.mean((out["reconstruction"] - motion) ** 2)
        loss = recon + out["commitment"] + self.beta * out["alignment"]
        return loss, {
            "loss": loss, "recon": recon, "alignment": out["alignment"],
            "commitment": out["commitment"], "perplexity": out["perplexity"],
        }
