"""DECA-style landmark losses (lip/eye distances, relative landmark loss).

jnp ports of the losses consumed by the stage-1 FaceFormer render/landmark
training path (/root/reference/models/faceformer.py:568-608 using
gdl/layers/losses/DecaLosses.py:158-300): distances are computed on the
68-point 2D landmark layout produced by core.flame.FlameModel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# 68-point iBUG landmark index groups (0-based)
_EYE_UP = (37, 38, 43, 44)
_EYE_DOWN = (41, 40, 47, 46)
_LIP_UP = (61, 62, 63)
_LIP_DOWN = (67, 66, 65)
_MOUTH_RIGHT = (48, 60)
_MOUTH_LEFT = (54, 64)


def eye_dis(landmarks: jax.Array) -> jax.Array:
    """(B, 68, >=2) -> (B, 4) vertical eye openings."""
    up = landmarks[:, _EYE_UP, :2]
    down = landmarks[:, _EYE_DOWN, :2]
    return jnp.sqrt(((up - down) ** 2).sum(-1))


def lip_dis(landmarks: jax.Array) -> jax.Array:
    """(B, 68, >=2) -> (B, 3) inner-lip openings."""
    up = landmarks[:, _LIP_UP, :2]
    down = landmarks[:, _LIP_DOWN, :2]
    return jnp.sqrt(((up - down) ** 2).sum(-1))


def mouth_corner_dis(landmarks: jax.Array) -> jax.Array:
    """(B, 68, >=2) -> (B, 2) mouth widths."""
    right = landmarks[:, _MOUTH_RIGHT, :2]
    left = landmarks[:, _MOUTH_LEFT, :2]
    return jnp.sqrt(((right - left) ** 2).sum(-1))


def eyed_loss(pred_landmarks: jax.Array, gt_landmarks: jax.Array) -> jax.Array:
    return jnp.abs(eye_dis(pred_landmarks) - eye_dis(gt_landmarks)).mean()


def lipd_loss(pred_landmarks: jax.Array, gt_landmarks: jax.Array) -> jax.Array:
    return jnp.abs(lip_dis(pred_landmarks) - lip_dis(gt_landmarks)).mean()


def mouth_corner_loss(pred_landmarks: jax.Array, gt_landmarks: jax.Array) -> jax.Array:
    return jnp.abs(
        mouth_corner_dis(pred_landmarks) - mouth_corner_dis(gt_landmarks)
    ).mean()


def landmark_loss(pred_landmarks: jax.Array, gt_landmarks: jax.Array) -> jax.Array:
    """Plain L2 over the 2D coordinates (DecaLosses.landmark_loss)."""
    return ((pred_landmarks[:, :, :2] - gt_landmarks[:, :, :2]) ** 2).mean()


def weighted_landmark_loss(pred_landmarks: jax.Array, gt_landmarks: jax.Array) -> jax.Array:
    """Landmark L1 with the DECA emphasis weights (nose x2/x6, mouth x4/x8)."""
    w = jnp.ones((68,))
    w = w.at[27:36].set(2.0).at[31].set(6.0).at[35].set(6.0)
    w = w.at[48:68].set(4.0).at[48].set(8.0).at[54].set(8.0)
    d = jnp.abs(pred_landmarks[:, :, :2] - gt_landmarks[:, :, :2]).sum(-1)
    return (d * w[None]).mean()
