"""Training losses and retrieval metrics for the diffusion prior.

jnp ports of the driver's helpers (/root/reference/train_diffusion_prior.py):
soft_clip_loss :125-133, cosine_anneal :122, batchwise_cosine_similarity
:147-153, topk :139-145.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def soft_clip_loss(preds: jax.Array, targs: jax.Array, temp: float = 0.125) -> jax.Array:
    """Bidirectional soft-target InfoNCE between projected text embeddings
    and EMOTE style embeddings (both (B, D), expected pre-normalised)."""
    clip_clip = (targs @ targs.T) / temp
    brain_clip = (preds @ targs.T) / temp
    soft_targets = jax.nn.softmax(clip_clip, axis=-1)
    loss1 = -(jax.nn.log_softmax(brain_clip, axis=-1) * soft_targets).sum(-1).mean()
    loss2 = -(jax.nn.log_softmax(brain_clip.T, axis=-1) * soft_targets).sum(-1).mean()
    return (loss1 + loss2) / 2


def cosine_anneal(start: float, end: float, steps: int) -> jnp.ndarray:
    t = jnp.arange(steps)
    return end + (start - end) / 2 * (1 + jnp.cos(jnp.pi * t / (steps - 1)))


def batchwise_cosine_similarity(Z: jax.Array, B: jax.Array) -> jax.Array:
    """(n, d) x (b, d) -> (b, n) cosine similarity (reference layout)."""
    Bt = B.T
    z_norm = jnp.linalg.norm(Z, axis=1, keepdims=True)
    b_norm = jnp.linalg.norm(Bt, axis=0, keepdims=True)
    return ((Z @ Bt) / (z_norm @ b_norm)).T


def topk_accuracy(similarities: jax.Array, labels: jax.Array, k: int = 5) -> jax.Array:
    """Sum over top-i hits, i in [1..k] (reference ``topk`` semantics)."""
    k = min(k, similarities.shape[0])
    order = jnp.argsort(similarities, axis=1)
    top = 0.0
    for i in range(k):
        top = top + (order[:, -(i + 1)] == labels).mean()
    return top
