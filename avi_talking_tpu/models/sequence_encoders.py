"""Sequence encoders for the talking head (audio-feature -> decoder width).

The reference offers linear / transformer / GRU / TCN variants
(inferno/models/temporal/SequenceEncoders.py); EMOTE's shipped config uses
the linear one (sequence_encoder/linear_bertprior.yaml). All are provided so
configs beyond the default can be reproduced.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.positional import sinusoidal_positional_encoding
from ..ops.transformer import TransformerEncoder


class LinearSequenceEncoder(nn.Module):
    feature_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        return nn.Dense(self.feature_dim, dtype=self.dtype, name="linear")(x)


class SimpleTransformerSequenceEncoder(nn.Module):
    feature_dim: int
    num_layers: int = 1
    nhead: int = 8
    activation: str = "gelu"
    use_pe: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = nn.Dense(self.feature_dim, dtype=self.dtype, name="in_proj")(x)
        if self.use_pe:
            x = x + sinusoidal_positional_encoding(
                x.shape[1], self.feature_dim, self.dtype
            )[None]
        return TransformerEncoder(
            num_layers=self.num_layers, d_model=self.feature_dim,
            nhead=self.nhead, dim_feedforward=self.feature_dim,
            activation=self.activation, dtype=self.dtype, name="encoder",
        )(x, deterministic=deterministic)


class GRUSequenceEncoder(nn.Module):
    feature_dim: int
    bidirectional: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        B = x.shape[0]
        hidden = (
            self.feature_dim // 2 if self.bidirectional else self.feature_dim
        )
        fwd = nn.RNN(nn.GRUCell(hidden), name="gru_fwd")
        out = fwd(x)
        if self.bidirectional:
            bwd = nn.RNN(nn.GRUCell(hidden), reverse=True,
                         keep_order=True, name="gru_bwd")
            out = jnp.concatenate([out, bwd(x)], axis=-1)
        return out


class TCNSequenceEncoder(nn.Module):
    """Temporal conv stack (dilated causal convs, residual)."""

    feature_dim: int
    num_layers: int = 3
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = nn.Dense(self.feature_dim, dtype=self.dtype, name="in_proj")(x)
        for i in range(self.num_layers):
            dilation = 2**i
            pad = (self.kernel_size - 1) * dilation
            h = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
            h = nn.Conv(
                self.feature_dim, (self.kernel_size,), padding="VALID",
                kernel_dilation=(dilation,), dtype=self.dtype, name=f"conv{i}",
            )(h)
            x = x + jax.nn.gelu(h, approximate=False)
        return x


def sequence_encoder_from_name(name: str, feature_dim: int, **kw):
    return {
        "linear": LinearSequenceEncoder,
        "transformer": SimpleTransformerSequenceEncoder,
        "gru": GRUSequenceEncoder,
        "tcn": TCNSequenceEncoder,
    }[name](feature_dim=feature_dim, **kw)
