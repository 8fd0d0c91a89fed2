"""BrainNetwork ("voxel2clip"): CLIP text embedding -> 128-d style space.

Architecture parity with /root/reference/models/diffusion_prior.py:58-117:
768 -> 4096 (LayerNorm+GELU+Dropout), 4 residual MLP blocks, -> 128, plus an
optional projector head (contrastive branch) 128 -> 2048 -> 2048 -> 128.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class BrainNetwork(nn.Module):
    out_dim: int = 128
    in_dim: int = 768
    clip_size: int = 128
    hidden: int = 4096
    n_blocks: int = 4
    use_projector: bool = True
    dropout_rate: float = 0.5
    block_dropout_rate: float = 0.15
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = nn.Dense(self.hidden, name="lin0_dense", **dd)(x)
        x = nn.LayerNorm(name="lin0_norm", **dd)(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)

        residual = x
        for i in range(self.n_blocks):
            h = nn.Dense(self.hidden, name=f"mlp_{i}_dense", **dd)(x)
            h = nn.LayerNorm(name=f"mlp_{i}_norm", **dd)(h)
            h = jax.nn.gelu(h, approximate=False)
            h = nn.Dropout(self.block_dropout_rate)(h, deterministic=deterministic)
            x = h + residual
            residual = x

        x = nn.Dense(self.out_dim, name="lin1", **dd)(x)

        if not self.use_projector:
            return x, None
        p = x.reshape(x.shape[0], -1, self.clip_size)
        p = nn.LayerNorm(name="proj_norm0", **dd)(p)
        p = jax.nn.gelu(p, approximate=False)
        p = nn.Dense(2048, name="proj_dense1", **dd)(p)
        p = nn.LayerNorm(name="proj_norm1", **dd)(p)
        p = jax.nn.gelu(p, approximate=False)
        p = nn.Dense(2048, name="proj_dense2", **dd)(p)
        p = nn.LayerNorm(name="proj_norm2", **dd)(p)
        p = jax.nn.gelu(p, approximate=False)
        p = nn.Dense(self.clip_size, name="proj_dense3", **dd)(p)
        return x, p
