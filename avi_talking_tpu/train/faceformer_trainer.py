"""Stage-1 FaceFormer training: the reference's full loss stack, one jit.

Mirrors models/faceformer.py's forward_switch_frame training recipe
(/root/reference/models/faceformer.py:326-458 + :488-608):

  loss = lip_coeff_weight * coeff MSE                        (:414)
       + 10  * lip-landmark loss (FLAME lipd/eyed/corner)    (:430-438)
       + 0.015 * render loss (PIRender + VGG perceptual)     (:425-428)
       + emo loss (EmoNet feature distance)                  (:440+)

The geometric terms (coeff MSE + FLAME landmark distances) run fully
on-device in one jitted step. The neural-perceptual terms are pluggable
callables (train.perceptual.PerceptualLoss over models.pirender renders;
models.emoca.EmoNetLoss) — enabled when their weights are imported, exactly
like the reference gates them behind w_render_loss / w_emo_loss flags.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.flame import FlameModel
from ..models.faceformer import FaceFormerCoeff
from .landmark_losses import eyed_loss, lipd_loss, mouth_corner_loss


@dataclasses.dataclass
class FaceFormerTrainer:
    model: FaceFormerCoeff
    tx: optax.GradientTransformation
    flame: Optional[FlameModel] = None
    coeff_mean: Optional[jax.Array] = None  # (D,) denormalisation stats
    coeff_std: Optional[jax.Array] = None
    lip_coeff_weight: float = 1.0
    ldmk_weight: float = 10.0
    lipd_weight: float = 1.0
    eyed_weight: float = 0.0
    # (pred_coeff, batch) -> scalar, or {"render": ..., "emo": ...} when the
    # render pass also feeds the EmoNet term (render_loss.PIRenderRenderLoss)
    render_loss_fn: Optional[Callable] = None
    render_weight: float = 0.015
    emo_loss_fn: Optional[Callable] = None
    emo_weight: float = 0.15  # faceformer.py:448

    def _denorm(self, coeff: jax.Array) -> jax.Array:
        if self.coeff_mean is None:
            return coeff
        d = coeff.shape[-1]
        return coeff * self.coeff_std[:d] + self.coeff_mean[:d]

    def _landmarks(self, coeff_norm: jax.Array) -> jax.Array:
        """Normalised (N, 53+) coeffs -> FLAME 68-pt 2D landmarks."""
        ne = self.flame.n_exp
        c = self._denorm(coeff_norm)
        N = c.shape[0]
        pose = jnp.concatenate(
            [jnp.zeros((N, 3), c.dtype), c[:, ne : ne + 3]], axis=1
        )
        _, lmk2d, _ = self.flame(
            jnp.zeros((N, self.flame.n_shape), c.dtype), c[:, :ne], pose
        )
        return lmk2d

    def loss_fn(self, params, batch: Dict[str, Any], rng: jax.Array):
        pred = self.model.apply(
            params,
            batch["audio"],
            batch["coeff"],
            batch.get("eye_embed"),
            batch.get("emo_embed"),
            batch.get("ref_coeff"),
        )
        gt = batch["coeff"]
        d = min(pred.shape[-1], 53)
        loss_coeff = jnp.mean((pred[..., :d] - gt[..., :d]) ** 2)
        loss = self.lip_coeff_weight * loss_coeff
        metrics = {"coeff": loss_coeff}

        if self.flame is not None and self.ldmk_weight > 0:
            B, T = pred.shape[:2]
            lmk_pred = self._landmarks(pred.reshape(B * T, -1)[:, :d])
            lmk_gt = jax.lax.stop_gradient(
                self._landmarks(gt.reshape(B * T, -1)[:, :d])
            )
            # the lip/eye losses index the 68-point iBUG layout; smaller
            # (synthetic) landmark sets would silently clamp the gathers
            assert lmk_pred.shape[1] >= 68, (
                f"landmark losses need the 68-point FLAME embedding, got "
                f"{lmk_pred.shape[1]} landmarks"
            )
            l_lip = lipd_loss(lmk_pred, lmk_gt) + mouth_corner_loss(lmk_pred, lmk_gt)
            l_ldmk = self.lipd_weight * l_lip
            if self.eyed_weight:
                l_ldmk += self.eyed_weight * eyed_loss(lmk_pred, lmk_gt)
            loss += self.ldmk_weight * l_ldmk
            metrics["ldmk"] = l_ldmk

        if self.render_loss_fn is not None:
            l_render = self.render_loss_fn(pred, batch)
            if isinstance(l_render, dict):
                loss += self.render_weight * l_render["render"]
                loss += self.emo_weight * l_render["emo"]
                metrics.update(l_render)
            else:
                loss += self.render_weight * l_render
                metrics["render"] = l_render
        if self.emo_loss_fn is not None:
            l_emo = self.emo_loss_fn(pred, batch)
            loss += self.emo_weight * l_emo
            metrics["emo"] = l_emo

        metrics["loss"] = loss
        return loss, metrics

    def train_step(self, params, opt_state, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
            params, batch, rng
        )
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    def jitted_train_step(self, donate: bool = False):
        """``donate=True`` donates (params, opt_state) — see
        TalkingHeadTrainer.jitted_train_step for the caller contract."""
        kw = {"donate_argnums": (0, 1)} if donate else {}
        return jax.jit(self.train_step, **kw)
