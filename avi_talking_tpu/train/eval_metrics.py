"""Evaluation utilities: style diversity, vertex error, condition exchange.

- ``style_diversity``: the reference's --is_cal_diversity score — mean
  pairwise L2 over N style embeddings sampled for the same (text, audio)
  (train_diffusion_prior.py:714-728).
- ``vertex_l2``: per-frame mean vertex error (mm-scale parity metric).
- ``condition_exchange``: EMOTE's disentanglement batch-doubling
  (TalkingHeadBase.disentangle, TalkingHeadBase.py:258-435): the batch is
  duplicated with style conditions exchanged across a random permutation;
  exchanged halves feed the perceptual consistency losses.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def style_diversity(style_embs: jax.Array) -> jax.Array:
    """(N, D) sampled style embeddings -> mean pairwise L2 distance."""
    d = style_embs[:, None] - style_embs[None]
    dist = jnp.sqrt((d**2).sum(-1) + 1e-12)
    n = style_embs.shape[0]
    mask = 1.0 - jnp.eye(n)
    return (dist * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def vertex_l2(pred_vertices: jax.Array, gt_vertices: jax.Array) -> jax.Array:
    """(..., V, 3) -> scalar mean per-vertex euclidean error."""
    return jnp.sqrt(((pred_vertices - gt_vertices) ** 2).sum(-1)).mean()


def lip_vertex_error(
    pred_vertices: jax.Array, gt_vertices: jax.Array, mouth_mask: jax.Array
) -> jax.Array:
    """LVE-style metric: max per-frame lip vertex error, averaged over time."""
    err = jnp.sqrt(((pred_vertices - gt_vertices) ** 2).sum(-1))  # (..., V)
    lip_err = jnp.where(mouth_mask, err, 0.0)
    return lip_err.max(axis=-1).mean()


def condition_exchange(
    batch: Dict[str, jax.Array],
    rng: jax.Array,
    condition_keys: Tuple[str, ...] = ("expression", "intensity", "identity"),
) -> Tuple[Dict[str, jax.Array], jax.Array]:
    """Duplicate the batch with exchanged style conditions.

    Returns (doubled batch, permutation used for the exchanged half). The
    first half keeps original pairs; the second half has conditions drawn
    from OTHER samples (disentanglement supervision). The permutation is a
    derangement — the reference asserts no fixed points
    (TalkingHeadBase.py:414-419 reverses for B=2 / create_unique_permutation,
    FaceFormer.py:252-253 asserts condition_indices differ everywhere) — a
    fixed point would silently turn the disentangled term into the plain one.
    jit-friendly construction: conjugate a random 1-shift cycle by a random
    permutation (q∘roll∘q⁻¹ has no fixed points for any q, shift>=1).
    """
    B = next(iter(batch.values())).shape[0]
    r_q, r_s = jax.random.split(rng)
    q = jax.random.permutation(r_q, B)
    shift = jax.random.randint(r_s, (), 1, max(B, 2))
    rolled = (jnp.arange(B) + shift) % B
    perm = jnp.zeros((B,), q.dtype).at[q].set(q[rolled])
    out: Dict[str, jax.Array] = {}
    for k, v in batch.items():
        if k in condition_keys:
            out[k] = jnp.concatenate([v, v[perm]], axis=0)
        else:
            out[k] = jnp.concatenate([v, v], axis=0)
    return out, perm
