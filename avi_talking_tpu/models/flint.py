"""FLINT motion-prior decoder (learning-to-listen style temporal VAE decoder).

Equivalent of ``L2lDecoder``
(/root/reference/third_party/inferno/inferno/models/temporal/motion_prior/L2lMotionPrior.py:361-495):
latent frames at T/2^q are upsampled back to frame rate by one
ConvTranspose1d(k5, s2) followed by (q-1) x [Conv1d(k5, replicate pad) +
repeat_interleave(2)], each stage LeakyReLU(0.2)+BatchNorm1d, then linear
embed -> PE -> transformer encoder -> Conv1d smoothing to the output
(exp 50 + jaw 3) sequence. The encoder half of FLINT is discarded at
inference by the reference (FaceFormerDecoder.py:1028); training the prior
itself is a later milestone, so only the decoder ships for the product path.

TPU notes: BatchNorm runs in inference mode by default (running stats are
imported from the torch ckpt, or identity when training from scratch we use
feature-axis LayerNorm-free init); convs are NLC `nn.Conv`s that XLA maps to
MXU; `repeat_interleave` is a reshape.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.positional import periodic_positional_encoding, sinusoidal_positional_encoding
from ..ops.transformer import TransformerEncoder


@dataclasses.dataclass(frozen=True)
class FlintConfig:
    feature_dim: int = 128
    bottleneck_dim: int = 128
    quant_factor: int = 3  # latent frame size = 2**quant_factor = 8
    num_layers: int = 1
    nhead: int = 8
    intermediate_size: int = 256
    activation: str = "gelu"
    out_dim: int = 53  # exp(50) + jaw(3)
    n_exp: int = 50
    positional_encoding: str = "none"  # none | sinusoidal | periodic
    pe_period: int = 30
    max_seq_len: int = 1200
    # optional projection heads some L2l configs enable
    # (L2lMotionPrior.py:434-455): post_transformer_linear runs BEFORE the
    # smoothing conv (feature_dim -> feature_dim when the conv exists),
    # post_conv_proj AFTER it (out_dim -> out_dim)
    post_transformer_proj: bool = False
    post_conv_proj: bool = False

    @property
    def latent_frame_size(self) -> int:
        return 2 ** self.quant_factor


class _LeakyBN(nn.Module):
    """LeakyReLU(0.2) + BatchNorm1d (inference mode, imported stats)."""

    features: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: bool = True) -> jax.Array:
        x = jax.nn.leaky_relu(x, negative_slope=0.2)
        return nn.BatchNorm(
            use_running_average=use_running_average,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="bn",
        )(x)


class FlintDecoder(nn.Module):
    cfg: FlintConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, latents: jax.Array, train: bool = False
    ) -> jax.Array:  # (B, T_latent, D) -> (B, T_latent * 2**q, out_dim)
        c = self.cfg
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = latents
        # expander stage 0: transposed conv, stride 2 (k5, p2, output_pad 1)
        x = nn.ConvTranspose(
            features=c.feature_dim,
            kernel_size=(5,),
            strides=(2,),
            # == torch ConvTranspose1d(k5, s2, p2, output_padding=1); the
            # (2, 3) padding + transpose_kernel mapping is pinned by
            # tests/test_flint.py::test_conv_transpose_matches_torch
            padding=((2, 3),),
            transpose_kernel=True,
            name="expander_0_conv",
            **dd,
        )(x)
        x = _LeakyBN(c.feature_dim, name="expander_0_post", **dd)(
            x, use_running_average=not train
        )
        for i in range(1, c.quant_factor):
            # replicate-padded conv (k5, s1), then 2x repeat_interleave
            pad = jnp.concatenate([x[:, :1]] * 2 + [x] + [x[:, -1:]] * 2, axis=1)
            x = nn.Conv(
                features=c.feature_dim,
                kernel_size=(5,),
                padding="VALID",
                name=f"expander_{i}_conv",
                **dd,
            )(pad)
            x = _LeakyBN(c.feature_dim, name=f"expander_{i}_post", **dd)(
                x, use_running_average=not train
            )
            x = jnp.repeat(x, 2, axis=1)

        x = nn.Dense(c.feature_dim, name="decoder_linear_embedding", **dd)(x)
        T = x.shape[1]
        if c.positional_encoding == "sinusoidal":
            x = x + sinusoidal_positional_encoding(T, c.feature_dim, self.dtype)[None]
        elif c.positional_encoding == "periodic":
            x = x + periodic_positional_encoding(
                T, c.feature_dim, c.pe_period, self.dtype
            )[None]

        x = TransformerEncoder(
            num_layers=c.num_layers,
            d_model=c.feature_dim,
            nhead=c.nhead,
            dim_feedforward=c.intermediate_size,
            activation=c.activation,
            name="decoder_transformer",
            **dd,
        )(x)

        if c.post_transformer_proj:  # L2lMotionPrior.py:487-489
            x = nn.Dense(c.feature_dim, name="post_transformer_linear", **dd)(x)
        # cross_smooth_layer: Conv1d(feature_dim -> out_dim, k5, p2)
        x = nn.Conv(
            features=c.out_dim,
            kernel_size=(5,),
            padding=((2, 2),),
            name="cross_smooth_layer",
            **dd,
        )(x)
        if c.post_conv_proj:  # L2lMotionPrior.py:492-493
            x = nn.Dense(c.out_dim, name="post_conv_proj", **dd)(x)
        return x

    def split_exp_jaw(self, decoded: jax.Array):
        return decoded[..., : self.cfg.n_exp], decoded[..., self.cfg.n_exp :]
