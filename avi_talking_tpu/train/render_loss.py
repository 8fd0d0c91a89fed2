"""Stage-1 PIRender render loss (the w_render_loss path).

Port of ``render2image`` + ``compute_render_loss``
(/root/reference/models/faceformer.py:488-566): de-normalised predicted
coefficients are assembled into PIRender motion descriptors
[exp50 | global-rot3 + pred-jaw3 | cam3] (59-d), a 27-frame window
(semantic radius 13, edge-clamped) is gathered around sampled frames, the
PIRender generator reenacts the reference image, and the warp/final outputs
are compared to the ground-truth frames with UPPER-FACE-masked perceptual
losses (the mouth is supervised by the coeff/landmark terms; the render loss
constrains the upper face).

With ``emonet`` set, the same generator forward also feeds the stage-1
emotion loss (``compute_emo_loss``, /root/reference/models/faceformer.py:
440-470): EmoNet feature distance between the PIRender ``fake_image`` and
the ground-truth frame, both mapped [-1,1] -> [0,1]; the call then returns
``{"render": ..., "emo": ...}`` so FaceFormerTrainer can weight the terms
independently (0.015 / 0.15 in the reference).

Plugs into FaceFormerTrainer.render_loss_fn.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..models.pirender import FaceGenerator
from .perceptual import PerceptualLoss


def obtain_seq_index(index: jax.Array, num_frames: int, radius: int = 13) -> jax.Array:
    """Edge-clamped window indices around ``index`` (faceformer.py:529-533)."""
    offs = jnp.arange(-radius, radius + 1)
    return jnp.clip(index + offs, 0, num_frames - 1)


def upper_face_mask_like(images: jax.Array) -> jax.Array:
    """1 above the horizontal midline, 0 below (NHWC; faceformer.py:549-551)."""
    H = images.shape[-3]
    rows = jnp.arange(H) < H // 2
    return jnp.broadcast_to(rows[:, None, None], images.shape[-3:]).astype(
        images.dtype
    )


@dataclasses.dataclass
class PIRenderRenderLoss:
    """Callable (pred_coeff, batch) -> scalar for FaceFormerTrainer.

    batch needs: 'pose' (B,T,>=3 global rot), 'cam' (B,T,3),
    'images' (B,T,H,W,3) GT frames in [-1,1], 'ref_images' (B,T,H,W,3)
    neutral-reference frames; coeff stats for de-normalisation.
    """

    generator: FaceGenerator
    generator_params: Any
    perceptual_warp: PerceptualLoss
    perceptual_final: PerceptualLoss
    vgg_params: Any
    coeff_mean: jax.Array
    coeff_std: jax.Array
    n_samples: int = 4
    weight_warp: float = 2.5
    weight_final: float = 4.0
    # optional stage-1 emotion term on the rendered frames
    # (models.emoca.EmoNetLoss + its variables)
    emonet: Any = None
    emonet_vars: Any = None

    def __call__(self, pred_coeff: jax.Array, batch: Dict[str, jax.Array],
                 rng: jax.Array | None = None):
        B, T = pred_coeff.shape[:2]
        d = pred_coeff.shape[-1]
        unnorm = pred_coeff * self.coeff_std[:d] + self.coeff_mean[:d]
        exp, jaw = unnorm[..., : d - 3], unnorm[..., d - 3 :]
        descr = jnp.concatenate(
            [exp, batch["pose"][..., :3], jaw, batch["cam"][..., :3]], axis=-1
        )  # (B, T, 59)

        if rng is None:
            rng = jax.random.PRNGKey(0)
        frame_idx = jax.random.randint(rng, (self.n_samples,), 0, T)

        # accept both our batch names and the reference's item names
        # (data_loader.py:374: img/ref_img)
        images = batch["images"] if "images" in batch else batch["img"]
        ref_images = (
            batch["ref_images"] if "ref_images" in batch else batch["ref_img"]
        )

        loss = 0.0
        emo = 0.0
        for i in range(self.n_samples):
            idx = frame_idx[i]
            win = obtain_seq_index(idx, T)  # (27,)
            window = jnp.take(descr, win, axis=1)  # (B, 27, 59)
            gt = jnp.take(images, idx, axis=1)  # (B, H, W, 3)
            ref = jnp.take(ref_images, idx, axis=1)
            out = self.generator.apply(self.generator_params, ref, window)
            mask = upper_face_mask_like(gt)[None]
            loss += self.weight_warp * self.perceptual_warp(
                self.vgg_params, out["warp_image"] * mask, gt * mask
            )
            loss += self.weight_final * self.perceptual_final(
                self.vgg_params, out["fake_image"] * mask, gt * mask
            )
            if self.emonet is not None:
                l_emo, _ = self.emonet(
                    self.emonet_vars,
                    out["fake_image"] * 0.5 + 0.5,
                    gt * 0.5 + 0.5,
                )
                emo += l_emo
        if self.emonet is not None:
            return {"render": loss / self.n_samples,
                    "emo": emo / self.n_samples}
        return loss / self.n_samples
