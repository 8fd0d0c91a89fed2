"""Camera projection helpers.

``batch_orth_proj`` follows DECA's weak-perspective convention
(/root/reference/BlendshapeVisualizer/EMOCA/gdl/utils/DecaUtils.py batch_orth_proj):
X_trans = scale * (X[..., :2] + t); the z coordinate is carried through
(negated by the renderer downstream).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def batch_orth_proj(X: jax.Array, camera: jax.Array) -> jax.Array:
    """Weak-perspective projection.

    Args:
        X: (B, N, 3) points.
        camera: (B, 3) = [scale, tx, ty].

    Returns:
        (B, N, 3): scaled translated xy, original z scaled too (DECA keeps
        z * scale for depth ordering).
    """
    camera = camera[:, None, :]
    X_trans = X[..., :2] + camera[..., 1:]
    X_trans = jnp.concatenate([X_trans, X[..., 2:]], axis=-1)
    return camera[..., :1] * X_trans
