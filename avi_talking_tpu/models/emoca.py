"""EMOCA/DECA coefficient encoder + EmoNet-style emotion module (flax).

Ports of the reference's image->FLAME-code stack
(/root/reference/BlendshapeVisualizer/EMOCA/gdl/models/DECA.py):

  * ``DecaEncoder`` (ResnetEncoder): ResNet-50 -> Linear(2048,1024) -> ReLU
    -> Linear(1024, n_param); DECA code layout
    [shape 100 | tex 50 | exp 50 | pose 6 | cam 3 | light 27] = 236.
  * ``EmocaEncoder``: the DECA coarse encoder plus EMOCA v2's dedicated
    expression encoder whose output replaces the exp block.
  * ``EmocaPreprocessor`` equivalent: encode video frames to pseudo-GT
    (landmark-validity-weighted average shape code, zeroed global pose —
    inferno/models/temporal/Preprocessors.py:330-489). Used to build
    training targets for the talking head; the product wav->face path does
    not need it (test-time uses zero GT).
  * ``EmotionRecognitionModule`` (EmoCnnModule): ResNet-50 features ->
    expression logits (8) + valence + arousal; the EMOTE/stage-1 emotion
    loss compares the 2048-d features (emo_feat_2) by MSE
    (create_emo_loss usage, models/faceformer.py:206-218).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..infra.torch_compat import linear_params
from .resnet import ResNet50, resnet50_params_from_torch

DECA_CODE_SPLITS = {
    "shape": 100, "tex": 50, "exp": 50, "pose": 6, "cam": 3, "light": 27,
}


def split_deca_code(code: jax.Array, splits=None) -> Dict[str, jax.Array]:
    splits = splits or DECA_CODE_SPLITS
    out = {}
    i = 0
    for k, n in splits.items():
        out[k] = code[..., i : i + n]
        i += n
    return out


class DecaEncoder(nn.Module):
    """ResNet-50 + 2-layer MLP head -> n_param code vector."""

    outsize: int = 236
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False) -> jax.Array:
        feat = ResNet50(self.dtype, name="encoder")(images, train)
        h = nn.Dense(1024, dtype=self.dtype, name="layers_0")(feat)
        h = jax.nn.relu(h)
        return nn.Dense(self.outsize, dtype=self.dtype, name="layers_2")(h)


class EmocaEncoder(nn.Module):
    """DECA coarse encoder + EMOCA expression encoder (exp replaced).

    ``with_detail`` adds DECA's E_detail (a third ResNet-50+MLP tower ->
    ``n_detail``-d displacement latent, gdl/models/DECA.py E_detail /
    encode ``detailcode``) feeding models.deca_detail.DetailGenerator."""

    n_exp: int = 50
    with_detail: bool = False
    n_detail: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False) -> Dict[str, jax.Array]:
        code = DecaEncoder(236, self.dtype, name="coarse")(images, train)
        codes = split_deca_code(code)
        exp = DecaEncoder(self.n_exp, self.dtype, name="expression")(images, train)
        codes["exp"] = exp
        if self.with_detail:
            codes["detail"] = DecaEncoder(
                self.n_detail, self.dtype, name="detail")(images, train)
        return codes


def emoca_pseudo_gt(
    codes: Dict[str, jax.Array],  # per-frame codes, each (T, n)
    landmark_validity: Optional[jax.Array] = None,  # (T,)
) -> Dict[str, jax.Array]:
    """EmocaPreprocessor semantics (Preprocessors.py:405-489): zero global
    rotation, per-clip validity-weighted average shape."""
    T = codes["shape"].shape[0]
    if landmark_validity is None:
        w = jnp.full((T, 1), 1.0 / T)
    else:
        w = landmark_validity[:, None] / jnp.maximum(landmark_validity.sum(), 1e-6)
    shape = (codes["shape"] * w).sum(axis=0)
    pose = codes["pose"]
    jaw = pose[:, 3:]
    return {
        "gt_shape": shape,
        "gt_exp": codes["exp"],
        "gt_jaw": jaw,
        "gt_tex": codes.get("tex", jnp.zeros((T, 50)))[0],
    }


class EmotionRecognitionModule(nn.Module):
    """EmoCnnModule: ResNet-50 -> expression/valence/arousal + features."""

    n_expression: int = 8
    predict_va: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False) -> Dict[str, jax.Array]:
        feat = ResNet50(self.dtype, name="backbone")(images, train)
        out_dim = self.n_expression + (2 if self.predict_va else 0)
        pred = nn.Dense(out_dim, dtype=self.dtype, name="linear")(feat)
        out = {
            "emo_feat_2": feat,
            "expr_classification": pred[..., : self.n_expression],
        }
        if self.predict_va:
            out["valence"] = pred[..., self.n_expression]
            out["arousal"] = pred[..., self.n_expression + 1]
        return out


@dataclasses.dataclass
class EmoNetLoss:
    """create_emo_loss defaults (emo_feat_loss='mse_loss', dual=False,
    normalize_features=False): MSE on emo_feat_2 + va/expression terms."""

    module: EmotionRecognitionModule
    feat_weight: float = 1.0
    valence_weight: float = 0.0
    arousal_weight: float = 0.0
    expression_weight: float = 0.0

    def __call__(self, variables, pred_images: jax.Array, gt_images: jax.Array):
        p = self.module.apply(variables, pred_images)
        g = self.module.apply(variables, gt_images)
        return self.from_outputs(p, g)

    def from_outputs(self, p, g):
        """Loss from precomputed tower outputs (batch dims arbitrary — all
        terms mean over every dim), so callers that also need the features
        elsewhere (video-emotion loss, condition-exchange permutations) run
        the tower once per distinct video set. ``g`` is stop-gradded here."""
        g = jax.tree.map(jax.lax.stop_gradient, g)
        loss = self.feat_weight * jnp.mean((p["emo_feat_2"] - g["emo_feat_2"]) ** 2)
        metrics = {"emo_feat": loss}
        if self.valence_weight and "valence" in p:
            lv = jnp.mean((p["valence"] - g["valence"]) ** 2)
            loss += self.valence_weight * lv
            metrics["valence"] = lv
        if self.arousal_weight and "arousal" in p:
            la = jnp.mean((p["arousal"] - g["arousal"]) ** 2)
            loss += self.arousal_weight * la
            metrics["arousal"] = la
        return loss, metrics


# --- torch import ----------------------------------------------------------


def deca_encoder_params_from_torch(sd: Mapping[str, Any], prefix: str = ""):
    """DECA ResnetEncoder state dict (encoder.* + layers.{0,2}.*) -> params."""
    rn = resnet50_params_from_torch(sd, prefix=f"{prefix}encoder.")
    return {
        "params": {
            "encoder": rn["params"],
            "layers_0": linear_params(sd, f"{prefix}layers.0."),
            "layers_2": linear_params(sd, f"{prefix}layers.2."),
        },
        "batch_stats": {"encoder": rn["batch_stats"]},
    }


def emoca_encoder_params_from_torch(
    sd: Mapping[str, Any], prefix: str = "", with_detail: bool = False
):
    """EMOCA/DECA checkpoint -> EmocaEncoder variables: the coarse tower
    from ``E_flame.*``, EMOCA's expression tower from ``E_expression.*``
    and (``with_detail``) the displacement tower from ``E_detail.*`` —
    all ResnetEncoder layouts (gdl/models/DECA.py attribute names)."""
    towers = [("coarse", "E_flame."), ("expression", "E_expression.")]
    if with_detail:
        towers.append(("detail", "E_detail."))
    P: Dict[str, Any] = {}
    S: Dict[str, Any] = {}
    for name, pref in towers:
        sub = deca_encoder_params_from_torch(sd, prefix=f"{prefix}{pref}")
        P[name], S[name] = sub["params"], sub["batch_stats"]
    return {"params": P, "batch_stats": S}


def emotion_module_params_from_torch(sd: Mapping[str, Any], prefix: str = ""):
    rn = resnet50_params_from_torch(sd, prefix=f"{prefix}backbone.")
    return {
        "params": {
            "backbone": rn["params"],
            "linear": linear_params(sd, f"{prefix}linear."),
        },
        "batch_stats": {"backbone": rn["batch_stats"]},
    }
