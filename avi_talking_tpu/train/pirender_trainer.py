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
    # Optional adversarial term. The reference BaseTrainer carries full
    # net_D/opt_D/sch_D plumbing (trainers/base.py:24-28) but the shipped
    # FaceTrainer never populates it; here the same interface is usable:
    # pass a discriminator (models.discriminator.MultiscaleDiscriminator),
    # its tx and weights to enable hinge GAN + feature matching.
    discriminator: Any = None
    tx_d: Any = None
    weight_gan: float = 1.0
    weight_feature_matching: float = 10.0
    gan_mode: str = "hinge"

    def loss_fn(
        self, params, batch: Dict[str, jax.Array], warp_only: bool,
        d_params=None,
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
            if d_params is not None:
                from .gan import feature_matching_loss, gan_loss_g

                fake_out = self.discriminator.apply(d_params, out["fake_image"])
                real_out = self.discriminator.apply(d_params, target)
                l_gan = gan_loss_g(fake_out, self.gan_mode)
                l_fm = feature_matching_loss(real_out, fake_out)
                loss = (loss + self.weight_gan * l_gan
                        + self.weight_feature_matching * l_fm)
                metrics.update(gan_g=l_gan, feature_matching=l_fm)
        metrics["loss"] = loss
        return loss, metrics

    def d_loss_fn(self, d_params, params, batch):
        """Discriminator objective on stop-gradiented fakes."""
        from .gan import gan_loss_d

        out = self.generator.apply(
            params, batch["input_image"], batch["coeff_window"])
        fake = jax.lax.stop_gradient(out["fake_image"])
        real_out = self.discriminator.apply(d_params, batch["target_image"])
        fake_out = self.discriminator.apply(d_params, fake)
        return gan_loss_d(real_out, fake_out, self.gan_mode)

    def train_step(self, params, opt_state, batch, warp_only: bool,
                   d_params=None):
        (loss, metrics), grads = jax.value_and_grad(
            self.loss_fn, has_aux=True
        )(params, batch, warp_only, d_params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, metrics

    def d_train_step(self, d_params, d_opt_state, params, batch):
        loss, grads = jax.value_and_grad(self.d_loss_fn)(
            d_params, params, batch)
        updates, d_opt_state = self.tx_d.update(grads, d_opt_state, d_params)
        return optax.apply_updates(d_params, updates), d_opt_state, loss

    def jitted_train_step(self):
        return jax.jit(self.train_step, static_argnums=(3,))

    def jitted_d_train_step(self):
        return jax.jit(self.d_train_step)
