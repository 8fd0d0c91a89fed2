"""Stage-1 FaceFormer: autoregressive audio -> FLAME-coefficient decoder.

TPU-native rebuild of the reference's FaceFormer family
(/root/reference/models/faceformer.py:128-733 coeff variant; the vertex
variant differs only in ``vertice_dim`` and template handling). The AR core:

  audio -> wav2vec2 (resampled to frame count) -> Dense(768->D) memory
  optional conditioning merge: concat[eye(6), emo(30), audio(D), ref-style(6)]
      -> Dense(->D)   (v_merge2hidden, faceformer.py:185,371-372)
  decode: token t-1 -> Dense(coeff->D) -> PPE -> 1-layer transformer decoder
      with periodised-ALiBi self-attn bias + diagonal audio alignment mask
      -> Dense(D->coeff, zero-init)

The reference's inference re-runs the full prefix every frame — O(T^2)
decoder forwards (faceformer.py:393-409). Here ``predict`` is a KV-cached
``lax.scan``: memory K/V are projected once, each step does O(1) new-token
work against the cache — the honest TPU-idiomatic replacement (SURVEY.md §7).

The image-based conditioning encoders (PD-FGC FanEncoder) are a separate
host/model component; this module accepts their (B, T, 6)/(B, T, 30)
embeddings as inputs.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..audio.wav2vec2 import Wav2Vec2Config, Wav2Vec2Model
from ..ops.positional import (
    enc_dec_alignment_bias,
    faceformer_bias,
    periodic_positional_encoding,
)
from ..ops.transformer import TransformerDecoder


@dataclasses.dataclass(frozen=True)
class FaceFormerConfig:
    vertice_dim: int = 53  # 50 exp + 3 jaw (normalised coeff space)
    feature_dim: int = 128
    period: int = 25
    nhead: int = 4
    num_decoder_layers: int = 1
    max_seq_len: int = 600
    with_condition_merge: bool = True  # w_fan==1 path
    eye_dim: int = 6
    emo_dim: int = 30
    style_dim: int = 6
    wav2vec2: Wav2Vec2Config = dataclasses.field(default_factory=Wav2Vec2Config)

    @classmethod
    def tiny(cls) -> "FaceFormerConfig":
        return cls(
            vertice_dim=9,
            feature_dim=32,
            period=5,
            max_seq_len=64,
            wav2vec2=Wav2Vec2Config.tiny(),
        )


class FaceFormerCoeff(nn.Module):
    cfg: FaceFormerConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.audio_encoder = Wav2Vec2Model(c.wav2vec2, name="audio_encoder", **dd)
        self.audio_feature_map = nn.Dense(c.feature_dim, name="audio_feature_map", **dd)
        self.vertice_map = nn.Dense(c.feature_dim, name="vertice_map", **dd)
        self.vertice_map_r = nn.Dense(
            c.vertice_dim,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="vertice_map_r",
            **dd,
        )
        self.obj_embedding = self.param(
            "obj_embedding", nn.initializers.zeros, (1, c.feature_dim), self.param_dtype
        )
        self.transformer_decoder = TransformerDecoder(
            num_layers=c.num_decoder_layers,
            d_model=c.feature_dim,
            nhead=c.nhead,
            dim_feedforward=2 * c.feature_dim,
            activation="relu",
            name="transformer_decoder",
            **dd,
        )
        if c.with_condition_merge:
            self.coeff2style = nn.Dense(c.style_dim, name="coeff2style", **dd)
            self.v_merge2hidden = nn.Dense(c.feature_dim, name="v_merge2hidden", **dd)

    # ----- shared encode --------------------------------------------------

    def encode_audio(self, audio: jax.Array, frame_num: int) -> jax.Array:
        """(B, samples) normalised audio -> (B, frame_num, D) memory."""
        feats = self.audio_encoder(audio, output_len=frame_num)
        return self.audio_feature_map(feats)

    def merge_condition(
        self,
        hidden_audio: jax.Array,  # (B, T, D)
        eye_embed: jax.Array,  # (B, T, 6)
        emo_embed: jax.Array,  # (B, T, 30)
        ref_coeff: jax.Array,  # (B, 1, vertice_dim)
    ) -> jax.Array:
        ref_style = self.coeff2style(ref_coeff)
        ref_style = jnp.broadcast_to(
            ref_style, hidden_audio.shape[:2] + (ref_style.shape[-1],)
        )
        merged = jnp.concatenate(
            [eye_embed, emo_embed, hidden_audio, ref_style], axis=-1
        )
        return self.v_merge2hidden(merged)

    # ----- teacher-forced training forward ---------------------------------

    def __call__(
        self,
        audio: jax.Array,  # (B, samples) normalised
        coeffs: jax.Array,  # (B, T, vertice_dim) normalised targets
        eye_embed: Optional[jax.Array] = None,
        emo_embed: Optional[jax.Array] = None,
        ref_coeff: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        c = self.cfg
        B, T = coeffs.shape[:2]
        memory = self.encode_audio(audio, T)
        if c.with_condition_merge and eye_embed is not None:
            memory = self.merge_condition(memory, eye_embed, emo_embed, ref_coeff)

        shifted = jnp.concatenate(
            [jnp.zeros_like(coeffs[:, :1]), coeffs[:, :-1]], axis=1
        )
        x = self.vertice_map(shifted)
        x = x + periodic_positional_encoding(T, c.feature_dim, c.period, x.dtype)[None]
        tgt_bias = faceformer_bias(c.nhead, T, c.period, dtype=jnp.float32)
        mem_bias = enc_dec_alignment_bias(T, T, 1, dtype=jnp.float32)
        out = self.transformer_decoder(
            x, memory, tgt_bias, mem_bias, deterministic=deterministic
        )
        return self.vertice_map_r(out)

    # ----- KV-cached autoregressive inference ------------------------------

    def predict(
        self,
        audio: jax.Array,  # (B, samples)
        frame_num: int,
        eye_embed: Optional[jax.Array] = None,
        emo_embed: Optional[jax.Array] = None,
        ref_coeff: Optional[jax.Array] = None,
    ) -> jax.Array:
        """(B, frame_num, vertice_dim) via one lax.scan with a KV cache.

        Matches the reference AR semantics (faceformer.py:393-409): step 0
        token = obj_embedding; later tokens = vertice_map(previous output);
        every token gets the PPE of its position.
        """
        c = self.cfg
        T = frame_num
        memory = self.encode_audio(audio, T)
        if c.with_condition_merge and eye_embed is not None:
            memory = self.merge_condition(memory, eye_embed, emo_embed, ref_coeff)
        B = memory.shape[0]
        assert c.num_decoder_layers == 1, "KV-cached decode is built for 1 layer"
        from .ar_decode import ar_decode

        params = self.variables["params"]
        token0 = jnp.broadcast_to(
            self.obj_embedding.astype(memory.dtype), (B, c.feature_dim)
        )
        return ar_decode(
            params["transformer_decoder"]["layers_0"],
            memory,
            token0,
            out_proj=params["vertice_map_r"],
            feedback_proj=params["vertice_map"],
            n_heads=c.nhead,
            period=c.period,
        )
