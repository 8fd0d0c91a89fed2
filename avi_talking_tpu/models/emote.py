"""EMOTE-style talking head: audio + 128-d style -> FLAME exp/jaw -> vertices.

TPU-native equivalent of the reference's pretrained EMOTE pipeline
(TalkingHeadWrapper + TalkingHeadBase.forward + BertPriorDecoder + FLINT,
/root/reference/third_party/inferno/.../TalkingHeadWrapper.py:76-166,
TalkingHeadBase.py:503-553, FaceFormerDecoder.py:987-1224), with the default
EMOTE configuration (bertprior_wild.yaml): feature_dim 128, nhead 8,
1 bert layer (gelu), no positional encoding, no temporal bias, style op
'add', squash_after with stack_linear squasher, FLINT motion prior,
post_bug_fix=True.

Forward dataflow (one jitted function, static frame count T):
    raw_audio (B, T, 640) -> flatten -> wav2vec2 (resampled to T) (B,T,768)
    -> linear seq encoder -> (B,T,128) -> + style (B,1,128)
    -> 1-layer transformer encoder -> Dense(128->128) per frame
    -> StackLinearSquash: (B, T/8, 8*128) -> (B, T/8, 128) latents
    -> FLINT decoder -> (B, T, 53) -> exp (B,T,50), jaw (B,T,3)
    -> FLAME(shape, exp, [0,jaw]) -> vertices (B,T,V,3)

The style embedding either comes from ``EmotionStyleEncoder`` (one-hot
conditions; the ``only_style_emb`` training-target path) or is injected
externally (the diffusion-prior product path,
``is_external_style_emb=True``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..audio.wav2vec2 import Wav2Vec2Config, Wav2Vec2Model
from ..core.flame import FlameAssets, FlameModel
from .conditioning import EmotionStyleEncoder, StyleCondition
from .flint import FlintConfig, FlintDecoder
from ..ops.transformer import TransformerEncoder


class ConvSquasher(nn.Module):
    """create_squasher (L2lMotionPrior.py:107-122): (B, T, F) -> (B, T/2^q, out).

    Stage 0: Conv1d(k5, s2, replicate pad) + LeakyReLU(0.2) + BatchNorm1d;
    stages 1..q-1: Conv1d(k5, s1) + LeakyReLU + BatchNorm1d + MaxPool1d(2).
    Frozen-BN by default (the reference squashers train their BNs, but the
    imported-checkpoint path always runs eval-mode stats).
    """

    out_dim: int
    quant_factor: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        for i in range(self.quant_factor):
            pad = jnp.pad(x, ((0, 0), (2, 2), (0, 0)), mode="edge")
            x = nn.Conv(
                self.out_dim, (5,), strides=2 if i == 0 else 1,
                padding="VALID", name=f"stage{i}_conv", **dd,
            )(pad)
            x = nn.leaky_relu(x, 0.2)
            x = nn.BatchNorm(
                use_running_average=not train, name=f"stage{i}_bn", **dd
            )(x)
            if i > 0:
                x = nn.max_pool(x, (2,), strides=(2,))
        return x


@dataclasses.dataclass(frozen=True)
class EmoteConfig:
    feature_dim: int = 128
    nhead: int = 8
    num_layers: int = 1
    activation: str = "gelu"
    dropout: float = 0.25
    style_op: str = "add"  # add | cat
    # squasher placement/type (FaceFormerDecoder.py:1040-1064 + :953-985):
    # EMOTE (bertprior_wild.yaml) = squash_after + stack_linear; the
    # bertprior.yaml variant = squash_before + conv
    squash_type: str = "stack_linear"  # stack_linear | conv
    squash_before: bool = False  # True: squash pre-bert (on feature_dim)
    n_shape: int = 300
    n_exp: int = 50
    flint: FlintConfig = dataclasses.field(default_factory=FlintConfig)
    wav2vec2: Wav2Vec2Config = dataclasses.field(default_factory=Wav2Vec2Config)
    audio_trainable: bool = True

    @classmethod
    def tiny(cls) -> "EmoteConfig":
        """Test-sized config (structure identical, dims shrunk)."""
        return cls(
            feature_dim=32,
            nhead=4,
            flint=FlintConfig(
                feature_dim=32, bottleneck_dim=32, quant_factor=2, nhead=4,
                intermediate_size=64, out_dim=9, n_exp=6,
            ),
            n_shape=8,
            n_exp=6,
            wav2vec2=Wav2Vec2Config.tiny(),
        )


class EmoteTalkingHead(nn.Module):
    """Audio + style -> FLAME coefficient sequences (+ vertices).

    ``flame`` is optional: without assets the model returns exp/jaw only
    (vertices require the external FLAME download).
    """

    cfg: EmoteConfig
    flame_assets: Optional[FlameAssets] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.audio_encoder = Wav2Vec2Model(
            c.wav2vec2, name="audio_encoder", **dd
        )
        self.sequence_encoder = nn.Dense(c.feature_dim, name="sequence_encoder", **dd)
        self.style_encoder = EmotionStyleEncoder(
            c.feature_dim, name="style_encoder", **dd
        )
        dim_factor = 2 if c.style_op == "cat" else 1
        d = c.feature_dim * dim_factor
        if c.num_layers > 0:
            self.bert_decoder = TransformerEncoder(
                num_layers=c.num_layers,
                d_model=d,
                nhead=c.nhead,
                dim_feedforward=d,
                activation=c.activation,
                dropout_rate=c.dropout,  # active only when deterministic=False
                name="bert_decoder",
                **dd,
            )
        else:
            self.bert_decoder = None
        self.decoder = nn.Dense(c.flint.bottleneck_dim, name="decoder", **dd)
        # squasher placement + type (FaceFormerDecoder.py:1040-1064)
        sq_dim = d if c.squash_before else c.flint.bottleneck_dim
        if c.squash_type == "stack_linear":
            self.squasher = nn.Dense(sq_dim if c.squash_before else
                                     c.flint.bottleneck_dim,
                                     name="squasher", **dd)
        elif c.squash_type == "conv":
            self.squasher = ConvSquasher(
                sq_dim, c.flint.quant_factor, name="squasher", **dd
            )
        else:
            raise ValueError(c.squash_type)
        self.motion_prior = FlintDecoder(c.flint, name="motion_prior", **dd)

    # ----- style ---------------------------------------------------------

    def style_embedding(self, condition: StyleCondition) -> jax.Array:
        """(B, 128) style embedding from one-hot conditions — what the
        diffusion prior is trained to regress (only_style_emb path)."""
        cond = condition.concat().astype(self.dtype)
        return self.style_encoder(cond)

    # ----- main forward ---------------------------------------------------

    def __call__(
        self,
        raw_audio: jax.Array,  # (B, T, 640) int16/float frames @25fps
        condition: Optional[StyleCondition] = None,
        style_emb: Optional[jax.Array] = None,  # (B, 128) external
        gt_shape: Optional[jax.Array] = None,  # (B, n_shape)
        deterministic: bool = True,
        valid_len: Optional[jax.Array] = None,  # (B,) valid frames (padding mask)
    ):
        c = self.cfg
        B, T = raw_audio.shape[:2]
        lfs = c.flint.latent_frame_size
        assert T % lfs == 0, (
            f"frame count {T} must be a multiple of the FLINT latent frame "
            f"size {lfs}; pad the audio (audio.frontend.frame_audio "
            f"pad_to_multiple)"
        )
        flat = raw_audio.reshape(B, -1).astype(self.dtype)
        feats = self.audio_encoder(flat, output_len=T, valid_len=valid_len)
        if not c.audio_trainable:
            feats = jax.lax.stop_gradient(feats)
        hidden = self.sequence_encoder(feats)  # (B, T, D)

        if style_emb is None:
            assert condition is not None, "need condition or style_emb"
            style_emb = self.style_embedding(condition)
        if style_emb.ndim == 2:
            style_emb = style_emb[:, None]
        if c.style_op == "add":
            styled = hidden + style_emb
        elif c.style_op == "cat":
            styled = jnp.concatenate(
                [hidden, jnp.broadcast_to(style_emb, hidden.shape)], axis=-1
            )
        else:
            raise ValueError(c.style_op)

        def squash(x):
            if c.squash_type == "conv":
                return self.squasher(x)
            return self.squasher(
                x.reshape(B, x.shape[1] // lfs, lfs * x.shape[-1])
            )

        if c.squash_before:  # FaceFormerDecoder.py:1195-1200 (_decode order)
            styled = squash(styled)
        if self.bert_decoder is not None:
            decoded = self.bert_decoder(styled, deterministic=deterministic)
        else:
            decoded = styled
        decoded = self.decoder(decoded)  # (B, T, bottleneck) [post_bug_fix=True]

        latents = decoded if c.squash_before else squash(decoded)
        out = self.motion_prior(latents)  # (B, T, 53)
        exp, jaw = self.motion_prior.split_exp_jaw(out)

        result = {"exp": exp, "jaw": jaw, "style_emb": style_emb[:, 0]}
        if self.flame_assets is not None:
            flame = FlameModel(self.flame_assets, n_shape=c.n_shape, n_exp=c.n_exp)
            if gt_shape is None:
                gt_shape = jnp.zeros((B, c.n_shape), self.dtype)
            shape_bt = jnp.broadcast_to(gt_shape[:, None], (B, T, c.n_shape))
            pose = jnp.concatenate([jnp.zeros_like(jaw), jaw], axis=-1)
            verts = flame.vertices_only(
                shape_bt.reshape(B * T, -1),
                exp.reshape(B * T, -1).astype(jnp.float32),
                pose.reshape(B * T, -1).astype(jnp.float32),
            ).reshape(B, T, -1, 3)
            result["vertices"] = verts
        return result
