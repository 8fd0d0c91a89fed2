"""EMOCA/DECA coarse self-supervised training (encoder -> FLAME -> render).

The in-framework equivalent of the reference's EMOCA training step
(gdl/models/DECA.py: encode :780-900, decode :940-1050, _compute_loss
:1776-2010): encode images to DECA codes, FLAME-decode + weak-perspective
project, SH-lit textured render through viz.rasterizer, and optimize the
coarse self-supervised loss set (train.deca_losses) — landmark/photometric
consistency plus the shading/albedo/code regularizers.

TPU posture: the whole step (encoder fwd, FLAME, rasterizer with the
custom-vjp backward, losses, grads, adam update) is ONE jitted graph; batch
is shardable over dp (the encoder is a plain ResNet — no cross-sample
state except BatchNorm running stats, which train in inference mode here
like the reference's frozen-BN fine-tune mode).

``train_exp_only`` reproduces EMOCA's staging: DECA's coarse tower is
frozen and only the expression tower trains (EMOCA paper / gdl configs'
E_expression fine-tune), via optax.masked zeroing of coarse grads.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.flame import FlameModel, FlameTex
from ..core.projection import batch_orth_proj
from ..models.emoca import EmocaEncoder
from ..viz.shading import render_textured
from .deca_losses import DecaLossWeights, coarse_losses


@dataclasses.dataclass
class EmocaTrainer:
    """Owns the frozen geometry/render plumbing around the trainable
    EmocaEncoder."""

    encoder: EmocaEncoder
    flame: FlameModel
    uv_coords: jax.Array  # (Tv, 2)
    uv_faces: jax.Array  # (F, 3)
    flame_tex: Optional[FlameTex] = None  # PCA albedo; None -> flat grey
    image_size: int = 224
    weights: DecaLossWeights = dataclasses.field(default_factory=DecaLossWeights)
    train_exp_only: bool = False
    raster_chunk: int = 2048
    # EMOCA's defining addition over DECA: emotion consistency between the
    # input image and the render through a frozen EmoNet
    # (DECA.py:1221-1226 _compute_emonet_loss_wrapper; weights.emonet
    # gates it — EMOCA cfg use_emonet_loss)
    emonet: Optional[object] = None  # models.emoca.EmoNetLoss
    emonet_variables: Optional[Dict] = None

    # -- decode ------------------------------------------------------------

    def decode(self, codes: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        """codes -> codedict with renders/landmarks (DECA.decode semantics:
        batch_orth_proj + y/z flip at :969-973, SRenderY render :987)."""
        shape = codes["shape"][:, : self.flame.n_shape]
        exp = codes["exp"][:, : self.flame.n_exp]
        pose, cam = codes["pose"], codes["cam"]
        verts, lmk2d, _ = self.flame(shape, exp, pose)
        trans = batch_orth_proj(verts, cam)
        ndc = jnp.stack([trans[..., 0], -trans[..., 1], -trans[..., 2]],
                        axis=-1)
        plmk = batch_orth_proj(lmk2d, cam)[..., :2]
        plmk = jnp.stack([plmk[..., 0], -plmk[..., 1]], axis=-1)

        light = codes["light"].reshape(codes["light"].shape[0], 9, 3)
        if self.flame_tex is not None:
            albedo = self.flame_tex(codes["tex"])
        else:
            albedo = jnp.full((shape.shape[0], 8, 8, 3), 0.6, shape.dtype)
        imgs, aux = render_textured(
            ndc, self.flame.assets.faces, self.uv_coords, self.uv_faces,
            albedo, self.image_size, self.image_size, sh_coeff=light,
            chunk=self.raster_chunk, return_aux=True)
        return {
            "verts": verts,
            "trans_verts": ndc,
            "predicted_landmarks": plmk,
            "predicted_images": imgs,
            "shading": aux["shading"],
            "albedo": albedo,
            "alpha": aux["alpha_images"],
            "shapecode": shape,
            "expcode": exp,
            "texcode": codes["tex"],
            "lightcode": light,
            "posecode": pose,
        }

    # -- loss --------------------------------------------------------------

    def loss_fn(
        self,
        params: Dict[str, Any],
        static_cols: Dict[str, Any],  # batch_stats etc. (frozen)
        batch: Dict[str, jax.Array],
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """batch: images (B,H,W,3) in [0,1], lmk (B,68,2) in [-1,1] NDC,
        masks (B,H,W,1) skin mask (defaults to the render alpha)."""
        variables = {"params": params, **static_cols}
        codes = self.encoder.apply(variables, batch["images"], train=False)
        codedict = self.decode(codes)
        masks = batch.get("masks")
        if masks is None:
            # no segmentation labels: compare inside the render coverage
            # (the reference's useSeg=False path masks by rend_mask)
            masks = codedict["alpha"][..., None].astype(batch["images"].dtype)
        codedict.update(
            images=batch["images"], lmk=batch["lmk"], masks=masks)
        terms = coarse_losses(codedict, self.weights)
        if self.emonet is not None and self.weights.emonet:
            emo_loss, _ = self.emonet(
                self.emonet_variables, codedict["predicted_images"],
                batch["images"])
            terms["emotion"] = emo_loss * self.weights.emonet
        total = sum(terms.values())
        return total, terms

    # -- optimizer ---------------------------------------------------------

    def make_tx(self, lr: float = 1e-4) -> optax.GradientTransformation:
        tx = optax.adam(lr)
        if self.train_exp_only:
            def labels(params):
                return jax.tree_util.tree_map_with_path(
                    lambda path, _: "freeze" if any(
                        getattr(k, "key", None) == "coarse" for k in path)
                    else "train",
                    params)

            tx = optax.multi_transform(
                {"train": tx, "freeze": optax.set_to_zero()}, labels)
        return tx

    def jitted_train_step(
        self, tx: optax.GradientTransformation, donate: bool = True
    ) -> Callable:
        """(params, opt_state, static_cols, batch) -> (params, opt, terms).
        ``static_cols`` carries the frozen non-param collections
        (batch_stats run in inference mode, matching the reference's
        frozen-BN posture)."""

        def step(params, opt_state, static_cols, batch):
            (loss, terms), grads = jax.value_and_grad(
                self.loss_fn, has_aux=True)(params, static_cols, batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            terms = dict(terms, total=loss)
            return params, opt_state, terms

        kw = {"donate_argnums": (0, 1)} if donate else {}
        return jax.jit(step, **kw)


@dataclasses.dataclass
class DecaDetailTrainer:
    """DECA/EMOCA DETAIL-stage training (gdl/models/DECA.py decode
    :1060-1127 + _compute_loss detail branch :2033-2210): the frozen coarse
    pipeline plus the trainable E_detail tower and D_detail generator.

    Loss set: masked photometric L1 on the detail render (photow=2),
    face-patch L1 (+ optional IDMRF) between the detail-shaded UV texture
    and the UV-unwrapped input (sfsw=[5,0,0] / mrfwr=0.05), and the
    displacement regularizers z_reg/z_diff/z_sym (0.005 each) — the
    default_detail_expdeca_emonet.yaml weights."""

    encoder: EmocaEncoder  # with_detail=True
    detail_model: object  # models.deca_detail.DecaDetailModel (generator+UVs)
    flame: FlameModel
    flame_tex: Optional[FlameTex] = None
    image_size: int = 224
    photow: float = 2.0
    sfsw: tuple = (5.0, 0.0, 0.0)
    mrfwr: float = 0.05
    zregw: float = 0.005
    zdiffw: float = 0.005
    zsymw: float = 0.005
    use_idmrf: bool = False
    vgg_apply: Optional[Callable] = None  # images -> {tap: feat} for IDMRF
    raster_chunk: int = 2048

    def loss_fn(self, train_params, frozen, batch):
        """``train_params``: {"detail": E_detail params, "generator":
        D_detail variables}; ``frozen``: full coarse encoder variables.
        batch: images (B,H,W,3) in [0,1], optional masks (B,H,W,1)."""
        import math as _math

        from ..models.deca_detail import world2uv
        from ..models.pirender import grid_sample_bilinear
        from ..viz.rasterizer import compute_vertex_normals
        from ..viz.shading import add_sh_light, render_detailed
        from .deca_losses import (
            detail_patch_losses,
            photometric_loss,
            shading_smooth_loss,
            z_reg,
            z_symmetry_loss,
        )

        images = batch["images"]
        B = images.shape[0]
        # frozen coarse encode (+ trainable detail tower grafted in)
        enc_vars = jax.tree.map(jax.lax.stop_gradient, frozen)
        enc_vars = {
            **enc_vars,
            "params": {**enc_vars["params"],
                       "detail": train_params["detail"]},
        }
        codes = self.encoder.apply(enc_vars, images, train=False)
        shape = jax.lax.stop_gradient(codes["shape"][:, : self.flame.n_shape])
        exp = jax.lax.stop_gradient(codes["exp"][:, : self.flame.n_exp])
        pose = jax.lax.stop_gradient(codes["pose"])
        cam = jax.lax.stop_gradient(codes["cam"])
        light = jax.lax.stop_gradient(
            codes["light"].reshape(B, 9, 3))
        verts = self.flame(shape, exp, pose)[0]
        trans = batch_orth_proj(verts, cam)
        ndc = jnp.stack([trans[..., 0], -trans[..., 1], -trans[..., 2]],
                        axis=-1)
        if self.flame_tex is not None:
            albedo = jax.lax.stop_gradient(self.flame_tex(codes["tex"]))
        else:
            albedo = jnp.full((B, 8, 8, 3), 0.6, images.dtype)

        # detail decode (DecaDetailModel with the trainable generator)
        dm = dataclasses.replace(self.detail_model,
                                 variables=train_params["generator"])
        uv_detail_normals, uv_z = dm.decode(
            pose[:, 3:], exp, codes["detail"], verts)
        uv_shading = add_sh_light(uv_detail_normals, light)
        S = uv_shading.shape[1]
        alb_uv = jax.image.resize(albedo, (B, S, S, 3), "bilinear")
        uv_texture = jnp.clip(alb_uv * uv_shading / _math.pi, 0.0, 1.0)

        # detail render
        pred = render_detailed(
            ndc, self.flame.assets.faces, dm.uv_coords, dm.uv_faces,
            albedo, uv_detail_normals, self.image_size, self.image_size,
            sh_coeff=light, chunk=self.raster_chunk)

        # UV-unwrapped GT + visibility (DECA.py:1115-1127)
        def unwrap(v):
            return world2uv(v, self.flame.assets.faces, dm.uv_coords,
                            dm.uv_faces, dm.uv_size)

        uv_pverts = jax.lax.stop_gradient(jax.vmap(unwrap)(ndc))
        masks = batch.get("masks")
        if masks is None:
            masks = jnp.ones(images.shape[:3] + (1,), images.dtype)
        img_mask = jnp.concatenate([images, masks], axis=-1)
        uv_gt = grid_sample_bilinear(img_mask, uv_pverts[..., :2])
        uv_texture_gt = jax.lax.stop_gradient(uv_gt[..., :3])
        uv_mask_gt = jax.lax.stop_gradient(uv_gt[..., 3:])
        normals = compute_vertex_normals(ndc, self.flame.assets.faces)
        uv_pnorm = jax.lax.stop_gradient(jax.vmap(unwrap)(normals))
        uv_mask = (uv_pnorm[..., 2:] < -0.05).astype(images.dtype)
        uv_vis_mask = uv_mask_gt * uv_mask

        terms = {
            "photometric_detailed": photometric_loss(pred, images, masks)
            * self.photow,
            "z_reg": z_reg(uv_z) * self.zregw,
            "z_diff": shading_smooth_loss(uv_shading) * self.zdiffw,
            "z_sym": z_symmetry_loss(uv_z, uv_vis_mask) * self.zsymw,
        }
        idmrf = None
        if self.use_idmrf and self.vgg_apply is not None:
            from .deca_losses import IDMRFLoss

            idmrf = IDMRFLoss()
        terms.update(detail_patch_losses(
            uv_texture, uv_texture_gt, uv_vis_mask, sfsw=self.sfsw,
            patch_size=min(256, self.image_size), idmrf=idmrf,
            vgg_apply=self.vgg_apply, mrfwr=self.mrfwr))
        total = sum(terms.values())
        return total, dict(terms, total=total)

    def jitted_train_step(self, tx, donate: bool = True):
        def step(train_params, opt_state, frozen, batch):
            (loss, terms), grads = jax.value_and_grad(
                self.loss_fn, has_aux=True)(train_params, frozen, batch)
            updates, opt_state = tx.update(grads, opt_state, train_params)
            train_params = optax.apply_updates(train_params, updates)
            return train_params, opt_state, terms

        kw = {"donate_argnums": (0, 1)} if donate else {}
        return jax.jit(step, **kw)


def train_emoca(
    trainer: EmocaTrainer,
    variables: Dict[str, Any],
    batches: Iterator[Dict[str, jax.Array]],
    steps: int,
    lr: float = 1e-4,
    log_every: int = 50,
    log_fn: Callable[[int, Dict[str, float]], None] = None,
) -> Dict[str, Any]:
    """Run the coarse training loop; returns final variables + metrics."""
    params = variables["params"]
    static_cols = {k: v for k, v in variables.items() if k != "params"}
    tx = trainer.make_tx(lr)
    opt_state = tx.init(params)
    step = trainer.jitted_train_step(tx)
    terms = {}
    for i in range(steps):
        params, opt_state, terms = step(params, opt_state, static_cols,
                                        next(batches))
        if log_every and (i + 1) % log_every == 0:
            vals = {k: float(v) for k, v in terms.items()}
            if log_fn is not None:
                log_fn(i + 1, vals)
            else:
                print(f"step {i + 1}: total={vals['total']:.4f} "
                      f"photo={vals.get('photometric', 0):.4f} "
                      f"lmk={vals.get('landmark', 0):.4f}")
    return {
        "variables": {"params": params, **static_cols},
        "metrics": {k: float(v) for k, v in terms.items()},
    }
