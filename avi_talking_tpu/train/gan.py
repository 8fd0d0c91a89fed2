"""GAN objectives for the PatchGAN discriminator family.

The reference vendors the SPADE-style discriminators without a trainer
(/root/reference/third_party/pd_fgc_inference/lib/models/networks/discriminator.py;
the pd_fgc repo is inference-only — SURVEY.md §2.7). These are the standard
objectives those nets are built for (SPADE/pix2pixHD conventions), provided
so the discriminators are trainable here:

- hinge:  L_D = E[relu(1 - D(x))] + E[relu(1 + D(G(z)))],  L_G = -E[D(G(z))]
- lsgan:  MSE against 1 (real) / 0 (fake)
- vanilla: BCE-with-logits against 1 / 0
- feature matching: mean L1 over the discriminator's intermediate features
  (excluding input and logits), averaged over scales.

All functions take the MultiscaleDiscriminator output shape: a list (one
entry per scale) of per-stage feature lists [input, f1, ..., logits].
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp


def _logits(disc_out) -> List[jax.Array]:
    """Accept either raw logits, one feature list, or a multiscale list."""
    if isinstance(disc_out, jax.Array):
        return [disc_out]
    if isinstance(disc_out, (list, tuple)) and disc_out and isinstance(
            disc_out[0], (list, tuple)):
        return [scale[-1] for scale in disc_out]
    return [disc_out[-1]]


def gan_loss_d(real_out, fake_out, mode: str = "hinge") -> jax.Array:
    """Discriminator loss; ``fake_out`` must be on stop-gradiented fakes."""
    total = 0.0
    reals, fakes = _logits(real_out), _logits(fake_out)
    for r, f in zip(reals, fakes):
        if mode == "hinge":
            total += jnp.mean(jax.nn.relu(1.0 - r)) + jnp.mean(
                jax.nn.relu(1.0 + f))
        elif mode == "lsgan":
            total += jnp.mean((r - 1.0) ** 2) + jnp.mean(f ** 2)
        elif mode == "vanilla":
            total += jnp.mean(jax.nn.softplus(-r)) + jnp.mean(
                jax.nn.softplus(f))
        else:
            raise ValueError(mode)
    return total / len(reals)


def gan_loss_g(fake_out, mode: str = "hinge") -> jax.Array:
    """Generator adversarial loss on D(G(z)) logits."""
    total = 0.0
    fakes = _logits(fake_out)
    for f in fakes:
        if mode == "hinge":
            total += -jnp.mean(f)
        elif mode == "lsgan":
            total += jnp.mean((f - 1.0) ** 2)
        elif mode == "vanilla":
            total += jnp.mean(jax.nn.softplus(-f))
        else:
            raise ValueError(mode)
    return total / len(fakes)


def feature_matching_loss(real_out, fake_out) -> jax.Array:
    """pix2pixHD feature-matching: L1 over intermediate features (the GT
    side stop-gradiented), averaged per scale; skips the echoed input
    (index 0) and the logits (index -1)."""
    if not (isinstance(real_out, (list, tuple)) and real_out
            and isinstance(real_out[0], (list, tuple))):
        real_out, fake_out = [real_out], [fake_out]
    total = 0.0
    for r_scale, f_scale in zip(real_out, fake_out):
        inner = 0.0
        feats = list(zip(r_scale[1:-1], f_scale[1:-1]))
        for r, f in feats:
            inner += jnp.mean(jnp.abs(f - jax.lax.stop_gradient(r)))
        total += inner / max(len(feats), 1)
    return total / len(real_out)
