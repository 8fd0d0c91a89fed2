"""Rotation representations (axis-angle, matrix, 6D) in pure jnp.

Semantics match the reference's torch versions so FLAME outputs agree:
``batch_rodrigues`` (/root/reference/BlendshapeVisualizer/EMOCA/gdl/utils/lbs.py:279-310)
and the 6D helpers used by EMOTE's jaw handling
(/root/reference/third_party/inferno/inferno/models/talkinghead/FaceFormerDecoder.py:853-868).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def batch_rodrigues(rot_vecs: jax.Array) -> jax.Array:
    """Axis-angle (N, 3) -> rotation matrices (N, 3, 3).

    Matches the reference exactly, including the ``+1e-8`` inside the norm
    (gdl/utils/lbs.py:294) which keeps the gradient finite at zero rotation.
    """
    angle = jnp.linalg.norm(rot_vecs + 1e-8, axis=1, keepdims=True)  # (N,1)
    rot_dir = rot_vecs / angle

    cos = jnp.cos(angle)[:, None]  # (N,1,1)
    sin = jnp.sin(angle)[:, None]

    rx, ry, rz = jnp.split(rot_dir, 3, axis=1)
    zeros = jnp.zeros_like(rx)
    K = jnp.concatenate(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=1
    ).reshape(-1, 3, 3)

    ident = jnp.eye(3, dtype=rot_vecs.dtype)[None]
    return ident + sin * K + (1.0 - cos) * (K @ K)


def rotation_6d_to_matrix(d6: jax.Array) -> jax.Array:
    """(..., 6) -> (..., 3, 3) via Gram-Schmidt (Zhou et al. 2019)."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True)
    a2_proj = jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2 - a2_proj
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(mat: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 6): first two rows flattened."""
    return mat[..., :2, :].reshape(*mat.shape[:-2], 6)


def rot_mat_to_euler_y(rot_mats: jax.Array) -> jax.Array:
    """Y-axis euler angle extraction used for FLAME dynamic contour
    landmarks (gdl/models/DecaFLAME.py rot_mat_to_euler):
    ``atan2(-R[2,0], sqrt(R[0,0]^2 + R[1,0]^2))``.
    """
    sy = jnp.sqrt(rot_mats[..., 0, 0] ** 2 + rot_mats[..., 1, 0] ** 2)
    return jnp.arctan2(-rot_mats[..., 2, 0], sy)


def axis_angle_to_matrix(aa: jax.Array) -> jax.Array:
    """(..., 3) axis-angle -> (..., 3, 3)."""
    flat = aa.reshape(-1, 3)
    return batch_rodrigues(flat).reshape(*aa.shape[:-1], 3, 3)
