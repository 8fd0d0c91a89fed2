"""Stage-1 FaceFormer, vertex-space + disentanglement variant.

Covers the reference's ``models/faceformer_vert.py`` and
``models/faceformer_disentangle.py`` (one parameterised module — the two
reference files share the skeleton and differ in conditioning/style):

  * predicts 5023x3 vertex OFFSETS from the FLAME template
    (faceformer_disentangle.py:448-449,481: tokens are offsets, output adds
    the template back),
  * one-hot subject style via a bias-free linear ``obj_vector``
    (:179,633-635) used as the AR start token and added to feedback tokens,
  * conditioning: concat[learnable eye embed (6), emotion embed (30 — from
    PD-FGC FanEncoder on lip-masked frames or a vertex encoder), audio(D)]
    -> ``v_merge2hidden`` (:693),
  * ``convert_coeff2verts``: de-normalised coeff -> FLAME verts with zero
    global pose (:425-433),
  * cross-modal shuffle losses with eye/mouth region masks from template
    geometry thresholds (FLAMESelector :136-155) in
    ``disentangle_losses``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..audio.wav2vec2 import Wav2Vec2Config, Wav2Vec2Model
from ..core.flame import FlameAssets, FlameModel
from ..ops.positional import (
    enc_dec_alignment_bias,
    faceformer_bias,
    periodic_positional_encoding,
)
from ..ops.transformer import TransformerDecoder


@dataclasses.dataclass(frozen=True)
class FlameRegionSelector:
    """Vertex region masks from template geometry (FLAMESelector port).

    Thresholds act on the template vertex coordinates; eyeball vertices are
    excluded from the eye region when eyeball masks are provided (the
    reference colors them in head_template_eyes.obj; here they can come from
    FLAME's lbs_weights on the eye joints).
    """

    frontal: np.ndarray  # (V,) bool
    mouth: np.ndarray
    eye: np.ndarray

    @classmethod
    def from_template(
        cls,
        v_template: np.ndarray,
        eyeball_mask: Optional[np.ndarray] = None,
        frontal_z: float = 0.035,
        face_y: float = 1.4,
        mouth_y_max: float = 1.5,
        eye_y_min: float = 1.49,
        eye_y_max: float = 1.57,
        eye_z: float = 0.030,
    ) -> "FlameRegionSelector":
        v = np.asarray(v_template)
        frontal = (v[:, 2] > frontal_z) & (v[:, 1] > face_y)
        mouth = frontal & (v[:, 1] < mouth_y_max)
        eye = (v[:, 2] > eye_z) & (v[:, 1] > eye_y_min) & (v[:, 1] < eye_y_max)
        if eyeball_mask is not None:
            eye = eye & ~np.asarray(eyeball_mask, bool)
        return cls(frontal=frontal, mouth=mouth, eye=eye)

    @classmethod
    def from_assets(cls, assets: FlameAssets, eye_weight_thresh: float = 0.5,
                    **kw) -> "FlameRegionSelector":
        """Eyeball detection from LBS weights of the two eye joints (4, 5)."""
        w = np.asarray(assets.lbs_weights)
        eyeball = None
        if w.shape[1] >= 5:
            eyeball = (w[:, 3] > eye_weight_thresh) | (w[:, 4] > eye_weight_thresh)
        return cls.from_template(np.asarray(assets.v_template), eyeball, **kw)

    def unfold(self, name: str) -> np.ndarray:
        """(V,) -> (V*3,) per-coordinate mask (reference *_unfold)."""
        m = getattr(self, name)
        return np.stack([m] * 3, axis=-1).reshape(-1)


@dataclasses.dataclass(frozen=True)
class FaceFormerVertConfig:
    vertice_dim: int = 15069  # 5023 * 3
    feature_dim: int = 64
    period: int = 30
    nhead: int = 4
    num_train_subjects: int = 1
    eye_dim: int = 6
    emo_dim: int = 30
    concat_mode: bool = False  # is_concat_mode: widen tokens by eye+emo dims
    wav2vec2: Wav2Vec2Config = dataclasses.field(default_factory=Wav2Vec2Config)

    @property
    def d_model(self) -> int:
        return self.feature_dim + (self.eye_dim + self.emo_dim if self.concat_mode else 0)

    @classmethod
    def tiny(cls) -> "FaceFormerVertConfig":
        return cls(vertice_dim=30, feature_dim=32, period=5,
                   wav2vec2=Wav2Vec2Config.tiny())


class FaceFormerVert(nn.Module):
    cfg: FaceFormerVertConfig
    template: Optional[jax.Array] = None  # (vertice_dim,) flattened
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        d = c.d_model
        self.audio_encoder = Wav2Vec2Model(c.wav2vec2, name="audio_encoder", **dd)
        self.audio_feature_map = nn.Dense(c.feature_dim, name="audio_feature_map", **dd)
        self.vertice_map = nn.Dense(d, name="vertice_map", **dd)
        self.vertice_map_r = nn.Dense(
            c.vertice_dim, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, name="vertice_map_r", **dd,
        )
        self.obj_vector = nn.Dense(d, use_bias=False, name="obj_vector", **dd)
        self.learnable_eye_embed = self.param(
            "learnable_eye_embed", nn.initializers.zeros, (c.eye_dim,), self.param_dtype
        )
        if not c.concat_mode:
            self.v_merge2hidden = nn.Dense(d, name="v_merge2hidden", **dd)
        self.transformer_decoder = TransformerDecoder(
            num_layers=1, d_model=d, nhead=c.nhead,
            dim_feedforward=d + c.feature_dim, activation="relu",
            name="transformer_decoder", **dd,
        )

    def _template(self) -> jax.Array:
        if self.template is None:
            return jnp.zeros((self.cfg.vertice_dim,), self.dtype)
        return self.template.reshape(-1).astype(self.dtype)

    def build_memory(
        self,
        audio: jax.Array,  # (B, samples)
        frame_num: int,
        emo_embed: jax.Array,  # (B, T, 30)
    ) -> jax.Array:
        c = self.cfg
        feats = self.audio_encoder(audio, output_len=frame_num)
        hidden_a = self.audio_feature_map(feats)
        B, T = hidden_a.shape[:2]
        eye = jnp.broadcast_to(
            self.learnable_eye_embed.astype(self.dtype)[None, None], (B, T, c.eye_dim)
        )
        hidden = jnp.concatenate([eye, emo_embed.astype(self.dtype), hidden_a], axis=-1)
        if c.concat_mode:
            return hidden
        return self.v_merge2hidden(hidden)

    def __call__(
        self,
        audio: jax.Array,
        gt_verts: jax.Array,  # (B, T, vertice_dim) absolute vertices
        emo_embed: jax.Array,
        one_hot: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        """Teacher-forced: returns absolute vertices (B, T, vertice_dim)."""
        c = self.cfg
        B, T = gt_verts.shape[:2]
        memory = self.build_memory(audio, T, emo_embed)
        if one_hot is None:
            one_hot = jnp.zeros((B, c.num_train_subjects), self.dtype).at[:, 0].set(1.0)
        style = self.obj_vector(one_hot)[:, None]  # (B, 1, d)

        template = self._template()
        shifted = jnp.concatenate(
            [jnp.broadcast_to(template[None, None], (B, 1, c.vertice_dim)),
             gt_verts[:, :-1]],
            axis=1,
        )
        offsets = shifted - template[None, None]
        x = self.vertice_map(offsets) + style
        x = x + periodic_positional_encoding(T, c.d_model, c.period, x.dtype)[None]
        tgt_bias = faceformer_bias(c.nhead, T, c.period, dtype=jnp.float32)
        mem_bias = enc_dec_alignment_bias(T, T, 1, dtype=jnp.float32)
        out = self.transformer_decoder(
            x, memory, tgt_bias, mem_bias, deterministic=deterministic
        )
        return self.vertice_map_r(out) + template[None, None]

    def predict(
        self,
        audio: jax.Array,
        frame_num: int,
        emo_embed: jax.Array,
        one_hot: Optional[jax.Array] = None,
    ) -> jax.Array:
        from .ar_decode import ar_decode

        c = self.cfg
        memory = self.build_memory(audio, frame_num, emo_embed)
        B = memory.shape[0]
        if one_hot is None:
            one_hot = jnp.zeros((B, c.num_train_subjects), self.dtype).at[:, 0].set(1.0)
        style = self.obj_vector(one_hot)  # (B, d)
        params = self.variables["params"]
        outs = ar_decode(
            params["transformer_decoder"]["layers_0"],
            memory,
            token0=style,
            out_proj=params["vertice_map_r"],
            feedback_proj=params["vertice_map"],
            n_heads=c.nhead,
            period=c.period,
            style_emb=style,
        )
        return outs + self._template()[None, None]


def convert_coeff2verts(
    flame: FlameModel,
    coeff_norm: jax.Array,  # (N, 53) normalised [exp50, jaw3]
    mean: jax.Array,
    std: jax.Array,
    shape_params: Optional[jax.Array] = None,
) -> jax.Array:
    """Denormalise coeffs -> FLAME verts with zero global rotation
    (faceformer_disentangle.py:425-433). Returns (N, V*3)."""
    d = coeff_norm.shape[-1]
    coeff = coeff_norm * std[:d] + mean[:d]
    N = coeff.shape[0]
    ne = flame.n_exp  # 50 for real FLAME (reference's [exp50, jaw3] layout)
    if shape_params is None:
        shape_params = jnp.zeros((N, flame.n_shape), coeff.dtype)
    pose = jnp.concatenate(
        [jnp.zeros((N, 3), coeff.dtype), coeff[:, ne : ne + 3]], axis=1
    )
    verts = flame.vertices_only(shape_params, coeff[:, :ne], pose)
    return verts.reshape(N, -1)


def disentangle_losses(
    model: FaceFormerVert,
    params,
    audio: jax.Array,
    gt_verts: jax.Array,
    emo_embed: jax.Array,
    selector: FlameRegionSelector,
    rng: jax.Array,
) -> Dict[str, jax.Array]:
    """Cross-modal shuffle losses (faceformer_disentangle.py:701-717):
    with shuffled audio the eye region must still match (emotion drives it);
    with shuffled emotion the mouth region must still match (audio drives
    it). Plus the base vertex MSE."""
    pred = model.apply(params, audio, gt_verts, emo_embed)
    loss_verts = jnp.mean((pred - gt_verts) ** 2)

    r1, r2 = jax.random.split(rng)
    perm_e = jax.random.permutation(r1, emo_embed.shape[0])
    perm_a = jax.random.permutation(r2, audio.shape[0])
    pred_shuf_emo = model.apply(params, audio, gt_verts, emo_embed[perm_e])
    pred_shuf_aud = model.apply(params, audio[perm_a], gt_verts, emo_embed)

    eye = jnp.asarray(selector.unfold("eye"), gt_verts.dtype)
    mouth = jnp.asarray(selector.unfold("mouth"), gt_verts.dtype)
    loss_eye = jnp.mean(((pred_shuf_aud - gt_verts) * eye) ** 2)
    loss_mouth = jnp.mean(((pred_shuf_emo - gt_verts) * mouth) ** 2)
    return {
        "verts": loss_verts,
        "verts_eye_area": loss_eye,
        "verts_mouth_area": loss_mouth,
    }
