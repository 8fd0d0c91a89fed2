"""Diffusion-prior training: jitted DP train step, AdamW groups, OneCycle.

Mirrors the reference's training recipe (train_diffusion_prior.py:406-626,
:996-1004): loss = soft_clip_loss(projected text emb, style emb) + 30 x
prior DDPM MSE; AdamW with weight decay 1e-2 on non-bias/non-LayerNorm
params only; OneCycleLR. The whole step (CLIP-embed means are inputs) is one
jitted function; batch-axis sharding over the "dp" mesh axis is the DDP
equivalent (gradients all-reduce via XLA psum).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.brain import BrainNetwork
from ..models.diffusion import DiffusionPrior
from .losses import batchwise_cosine_similarity, soft_clip_loss, topk_accuracy


def one_cycle_schedule(
    max_lr: float, total_steps: int, pct_start: float = 0.3,
    div_factor: float = 25.0, final_div_factor: float = 1e4,
) -> optax.Schedule:
    """torch OneCycleLR (cos anneal) equivalent.

    optax's schedule divides by the warmup/decay interval lengths, which are
    ZERO (=> NaN learning rate for every step) when pct_start*total_steps<1;
    clamp so both phases span at least one step, and fall back to a constant
    schedule for degenerate totals."""
    if total_steps < 2:
        return optax.constant_schedule(max_lr)
    pct_start = min(max(pct_start, 1.0 / total_steps), (total_steps - 1.0) / total_steps)
    return optax.cosine_onecycle_schedule(
        transition_steps=total_steps, peak_value=max_lr,
        pct_start=pct_start, div_factor=div_factor,
        final_div_factor=final_div_factor,
    )


def _no_decay_mask(params) -> Any:
    """True where weight decay applies: skip biases and norm scales
    (reference no_decay list: bias, LayerNorm.{bias,weight})."""

    def decide(path, leaf):
        names = [str(getattr(k, "key", k)) for k in path]
        last = names[-1] if names else ""
        if last in ("bias", "scale", "g"):
            return False
        if any("norm" in n.lower() for n in names):
            return False
        return True

    return jax.tree_util.tree_map_with_path(decide, params)


def make_prior_optimizer(
    params, max_lr: float = 1e-4, total_steps: int = 10_000,
    weight_decay: float = 1e-2,
) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    sched = one_cycle_schedule(max_lr, total_steps)
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(
            sched, b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=weight_decay, mask=_no_decay_mask(params),
        ),
    )
    return tx, sched


from flax import struct


@struct.dataclass
class PriorTrainState:
    params: Dict[str, Any]  # {"brain": ..., "prior": ...}
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, params, tx):
        return cls(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


@dataclasses.dataclass
class PriorTrainer:
    brain: BrainNetwork
    prior: DiffusionPrior
    tx: optax.GradientTransformation
    prior_loss_weight: float = 30.0
    nce_temp: float = 0.006  # annealed 0.004->0.0075 over epochs in reference

    def loss_fn(
        self, params, voxel: jax.Array, style_target: jax.Array, rng: jax.Array,
        nce_temp: Optional[jax.Array] = None,
    ):
        """voxel (B, 768) CLIP text means; style_target (B, 128) frozen EMOTE
        style embeddings (the clip_target, train_diffusion_prior.py:195)."""
        temp = nce_temp if nce_temp is not None else self.nce_temp
        clip_voxels, proj = self.brain.apply(
            params["brain"], voxel, deterministic=False,
            rngs={"dropout": jax.random.fold_in(rng, 1)},
        )
        loss_prior, aligned = self.prior.loss(
            params["prior"], clip_voxels, style_target, jax.random.fold_in(rng, 2)
        )
        proj_flat = proj.reshape(proj.shape[0], -1)
        target_norm = style_target / jnp.linalg.norm(
            style_target, axis=-1, keepdims=True
        ).clip(1e-8)
        proj_norm = proj_flat / jnp.linalg.norm(
            proj_flat, axis=-1, keepdims=True
        ).clip(1e-8)
        loss_nce = soft_clip_loss(proj_norm, target_norm, temp=temp)
        loss = loss_nce + self.prior_loss_weight * loss_prior

        sims = batchwise_cosine_similarity(style_target, proj_flat)
        labels = jnp.arange(voxel.shape[0])
        metrics = {
            "loss": loss,
            "loss_nce": loss_nce,
            "loss_prior": loss_prior,
            "cosine_sim": jnp.mean(
                jnp.sum(proj_norm * target_norm, axis=-1)
            ),
            "top1_fwd": topk_accuracy(sims, labels, k=1),
            "top1_bwd": topk_accuracy(sims.T, labels, k=1),
        }
        return loss, metrics

    def train_step(self, state: PriorTrainState, voxel, style_target, rng, nce_temp=None):
        (loss, metrics), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
            state.params, voxel, style_target, rng, nce_temp
        )
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            PriorTrainState(params=params, opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    def jitted_train_step(self, donate: bool = True):
        return jax.jit(
            self.train_step, donate_argnums=(0,) if donate else ()
        )

    def eval_step(self, params, voxel, style_target, rng):
        _, metrics = self.loss_fn(params, voxel, style_target, rng)
        return metrics
