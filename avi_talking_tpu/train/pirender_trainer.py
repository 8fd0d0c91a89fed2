"""PIRender training: warp-pretrain + full-editing stages.

Port of the reference's FaceTrainer recipe
(/root/reference/third_party/pirender/trainers/face_trainer.py +
config/flame_wo_crop.yaml trainer block): stage 1 (first
``pretrain_warp_iteration`` steps) optimises only the warping path with
``weight_perceptual_warp``=2.5; stage 2 adds the editing net with
``weight_perceptual_final``=4 and gram-style loss (style_to_perceptual=250).
Adam(0.5, 0.999) @1e-4 with step decay, like gen_optimizer.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.pirender import FaceGenerator
from .perceptual import PerceptualLoss


def make_pirender_optimizer(
    lr: float = 1e-4, step_size: int = 300_000, gamma: float = 0.2
) -> optax.GradientTransformation:
    sched = optax.exponential_decay(
        lr, transition_steps=step_size, decay_rate=gamma, staircase=True
    )
    return optax.adam(sched, b1=0.5, b2=0.999)


@dataclasses.dataclass
class PIRenderTrainer:
    generator: FaceGenerator
    tx: optax.GradientTransformation
    perceptual_warp: PerceptualLoss  # use_style_loss=False
    perceptual_final: PerceptualLoss  # use_style_loss=True (style weight 250)
    vgg_params: Any
    weight_perceptual_warp: float = 2.5
    weight_perceptual_final: float = 4.0
    pretrain_warp_steps: int = 200_000

    def loss_fn(
        self, params, batch: Dict[str, jax.Array], warp_only: bool
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """batch: input_image (B,H,W,3) in [-1,1], coeff_window (B,27,coeff),
        target_image (B,H,W,3)."""
        out = self.generator.apply(
            params, batch["input_image"], batch["coeff_window"],
            stage="warp" if warp_only else None,
        )
        target = batch["target_image"]
        l_warp = self.perceptual_warp(self.vgg_params, out["warp_image"], target)
        loss = self.weight_perceptual_warp * l_warp
        metrics = {"perceptual_warp": l_warp}
        if not warp_only:
            l_final = self.perceptual_final(
                self.vgg_params, out["fake_image"], target
            )
            loss = loss + self.weight_perceptual_final * l_final
            metrics["perceptual_final"] = l_final
        metrics["loss"] = loss
        return loss, metrics

    def train_step(self, params, opt_state, batch, warp_only: bool):
        (loss, metrics), grads = jax.value_and_grad(
            self.loss_fn, has_aux=True
        )(params, batch, warp_only)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, metrics

    def jitted_train_step(self):
        return jax.jit(self.train_step, static_argnums=(3,))
