"""wav2vec2 audio encoder in flax.linen, TPU-first.

Re-implementation of the HF ``Wav2Vec2Model`` (post-LN "base" layout) with
the reference's 50->25 fps temporal resampling between the conv feature
extractor and the feature projection — the layout used by both the stage-1
FaceFormer (/root/reference/models/lib/wav2vec.py:76-156) and EMOTE's
Wav2Vec2ModelResampled
(/root/reference/third_party/inferno/inferno/models/temporal/AudioEncoders.py:27-101).

TPU notes:
  * the 7-layer conv frontend runs as `lax.conv_general_dilated` NLC convs —
    XLA lowers these onto the MXU; strides are static so shapes stay static
    under jit (16000*k samples -> 50*k frames -> resample to 25*k),
  * the transformer is 12 post-LN layers at width 768 (95M params); packed
    QKV is not used here to keep HF weight import 1:1, but all four
    projections are plain Dense -> single MXU matmuls,
  * everything takes an optional ``output_len`` (static int) so the whole
    audio->features stage jits once per length bucket.

Parity: tests/test_wav2vec2_parity.py imports weights from a
randomly-initialised torch HF model and requires <1e-4 agreement.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resample import linear_interpolate


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    """Subset of HF Wav2Vec2Config needed for the base (post-LN) model."""

    conv_dim: Sequence[int] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5
    feat_extract_norm: str = "group"  # "group" for base, "layer" for large
    do_stable_layer_norm: bool = False
    # Fused Pallas key-bias attention (Pallas fwd + XLA bwd custom_vjp) on
    # TPU. Measured crossover (v5e sweep, H=12 d=64, ratio = xla/pallas):
    #   B=4 T=200 0.70 | B=8 T=200 0.77 | B=16 T=200 0.89 | B=4 T=552 0.69
    #   B=8 T=552 1.23 | B=16 T=384 1.45 | B=32 T=200 1.73 | B=16 T=552 1.77
    # "auto" (default) enables the kernel when the static grid is big
    # enough to win: B*H*T >= 48_000 AND T >= 384. The T floor is an r5
    # WHOLE-MODEL finding: the isolated-kernel sweep says B=32 T=200 wins
    # 1.73x, but inside the full wav2vec2 grad the kernel LOSES there
    # (B=32: 86.9 ms auto vs 84.5 forced-XLA; B=64: 191.4 vs 180.9 —
    # the un-fused kernel boundary costs more than the kernel saves at
    # short T, where XLA fuses softmax with its neighbours). True/False
    # force. Ignored off-TPU (tests/CPU take the XLA path either way).
    use_pallas_attention: Any = "auto"  # "auto" | True | False

    @classmethod
    def tiny(cls, hidden: int = 32, layers: int = 2, heads: int = 4) -> "Wav2Vec2Config":
        """Small config for tests (matches an HF config with the same fields)."""
        return cls(
            conv_dim=(16, 16, 16),
            conv_kernel=(10, 3, 3),
            conv_stride=(5, 2, 2),
            hidden_size=hidden,
            num_hidden_layers=layers,
            num_attention_heads=heads,
            intermediate_size=hidden * 4,
            num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=2,
        )


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


class _ConvLayer(nn.Module):
    cfg: Wav2Vec2Config
    layer_id: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, L, C_in)
        c = self.cfg
        x = nn.Conv(
            features=c.conv_dim[self.layer_id],
            kernel_size=(c.conv_kernel[self.layer_id],),
            strides=(c.conv_stride[self.layer_id],),
            padding="VALID",
            use_bias=c.conv_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)
        if self.layer_id == 0 and c.feat_extract_norm == "group":
            # HF GroupNorm(num_groups=C, num_channels=C): per-channel norm
            # over the time axis.
            x = nn.GroupNorm(
                num_groups=c.conv_dim[0],
                epsilon=c.layer_norm_eps,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="layer_norm",
            )(x)
        elif c.feat_extract_norm == "layer":
            x = nn.LayerNorm(
                epsilon=c.layer_norm_eps,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="layer_norm",
            )(x)
        return _gelu(x)


class FeatureExtractor(nn.Module):
    cfg: Wav2Vec2Config
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_values: jax.Array) -> jax.Array:  # (B, samples)
        x = input_values[..., None].astype(self.dtype)  # (B, L, 1)
        for i in range(len(self.cfg.conv_dim)):
            x = _ConvLayer(
                self.cfg, i, self.dtype, self.param_dtype, name=f"conv_layers_{i}"
            )(x)
        return x  # (B, frames, conv_dim[-1])


class FeatureProjection(nn.Module):
    cfg: Wav2Vec2Config
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.LayerNorm(
            epsilon=self.cfg.layer_norm_eps,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="layer_norm",
        )(x)
        return nn.Dense(
            self.cfg.hidden_size,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="projection",
        )(x)


class _GroupUnrolledConv1d(nn.Module):
    """Grouped 1-D conv with the SAME params/math as
    ``nn.Conv(feature_group_count=groups)`` — kernel (k, in/groups, out),
    output block i consuming input slice i — but computed as ``groups``
    plain convs, because XLA's SPMD partitioner mis-partitions a grouped
    conv's kernel gradient on a 2-axis (dp, tp) mesh: with the batch
    sharded over dp and tp idle on this op, the gradient comes back exactly
    tp-times too large (verified dp=4 x tp=2 -> 2.0x). Plain convs
    partition correctly on every mesh we use."""

    features: int
    kernel_size: int
    groups: int
    padding: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, T, D)
        D = x.shape[-1]
        dg_in = D // self.groups
        dg_out = self.features // self.groups
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, dg_in, self.features), self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), self.param_dtype,
        )
        dn = ("NHC", "HIO", "NHC")
        outs = []
        for gi in range(self.groups):
            xg = x[..., gi * dg_in : (gi + 1) * dg_in]
            kg = kernel[:, :, gi * dg_out : (gi + 1) * dg_out]
            outs.append(
                jax.lax.conv_general_dilated(
                    xg.astype(self.dtype), kg.astype(self.dtype), (1,),
                    [(self.padding, self.padding)], dimension_numbers=dn,
                )
            )
        return jnp.concatenate(outs, axis=-1) + bias.astype(self.dtype)


class PositionalConvEmbedding(nn.Module):
    cfg: Wav2Vec2Config
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, T, D)
        c = self.cfg
        k = c.num_conv_pos_embeddings
        h = _GroupUnrolledConv1d(
            features=c.hidden_size,
            kernel_size=k,
            groups=c.num_conv_pos_embedding_groups,
            padding=k // 2,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)
        if k % 2 == 0:
            h = h[:, :-1]  # HF Wav2Vec2SamePadLayer removes one for even kernels
        return _gelu(h)


class EncoderLayer(nn.Module):
    """Post-LN transformer layer (HF Wav2Vec2EncoderLayer, base model)."""

    cfg: Wav2Vec2Config
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        deterministic: bool = True,
        attn_bias: "Optional[jax.Array]" = None,  # (B, 1, 1, T) additive
    ) -> jax.Array:
        c = self.cfg
        d, h = c.hidden_size, c.num_attention_heads
        head_dim = d // h

        q = nn.Dense(d, dtype=self.dtype, param_dtype=self.param_dtype, name="attn_q")(x)
        k = nn.Dense(d, dtype=self.dtype, param_dtype=self.param_dtype, name="attn_k")(x)
        v = nn.Dense(d, dtype=self.dtype, param_dtype=self.param_dtype, name="attn_v")(x)
        B, T = x.shape[:2]
        q = q.reshape(B, T, h, head_dim).transpose(0, 2, 1, 3) * (head_dim**-0.5)
        k = k.reshape(B, T, h, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, h, head_dim).transpose(0, 2, 1, 3)
        mode = c.use_pallas_attention
        # auto: grid big enough AND sequence long enough (see the config
        # docstring — short-T shapes lose whole-model even when the
        # isolated kernel wins)
        want = mode is True or (
            mode == "auto" and B * h * T >= 48_000 and T >= 384)
        use_pallas = False
        if want and (
            attn_bias is None or attn_bias.shape[1] == attn_bias.shape[2] == 1
        ):
            from ..ops.pallas.attention import pallas_available

            use_pallas = pallas_available()
        if use_pallas:
            from ..ops.pallas.attention import keybias_attention

            kb = (jnp.zeros((B, T), self.dtype) if attn_bias is None
                  else attn_bias.reshape(B, T).astype(self.dtype))
            ctx = keybias_attention(q, k, v, kb)
        else:
            logits = jnp.einsum(
                "bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32)
            if attn_bias is not None:
                logits = logits + attn_bias.astype(logits.dtype)
            attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            ctx = jnp.einsum("bhts,bhsd->bhtd", attn, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, d)
        ctx = nn.Dense(d, dtype=self.dtype, param_dtype=self.param_dtype, name="attn_out")(ctx)

        x = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=self.dtype, param_dtype=self.param_dtype,
            name="layer_norm",
        )(x + ctx)
        ff = nn.Dense(
            c.intermediate_size, dtype=self.dtype, param_dtype=self.param_dtype,
            name="intermediate_dense",
        )(x)
        ff = _gelu(ff)
        ff = nn.Dense(
            d, dtype=self.dtype, param_dtype=self.param_dtype, name="output_dense"
        )(ff)
        return nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=self.dtype, param_dtype=self.param_dtype,
            name="final_layer_norm",
        )(x + ff)


class Wav2Vec2Model(nn.Module):
    """Conv extractor -> (optional resample) -> projection -> transformer.

    ``__call__(input_values (B, samples), output_len)`` returns features
    (B, output_len or native frames, hidden_size).
    """

    cfg: Wav2Vec2Config
    model_expected_fps: int = 50
    target_fps: int = 25
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_values: jax.Array,
        output_len: Optional[int] = None,
        resample: bool = True,
        deterministic: bool = True,
        mask_time_indices: Optional[jax.Array] = None,  # (B, T) bool
        valid_len: Optional[jax.Array] = None,  # (B,) valid OUTPUT frames
    ) -> jax.Array:
        """``valid_len`` masks padded tail frames out of self-attention (the
        HF attention_mask path) so bucket-padded serving batches do not leak
        padding into valid frames."""
        c = self.cfg
        x = FeatureExtractor(c, self.dtype, self.param_dtype, name="feature_extractor")(
            input_values
        )
        if resample and (
            self.model_expected_fps != self.target_fps or output_len is not None
        ):
            if output_len is None:
                output_len = int(
                    x.shape[1] / self.model_expected_fps * self.target_fps
                )
            x = linear_interpolate(x, output_len, axis=1)
        x = FeatureProjection(c, self.dtype, self.param_dtype, name="feature_projection")(x)

        if mask_time_indices is not None:
            # SpecAugment-style time masking: replace masked frames with the
            # learned mask embedding (reference models/lib/wav2vec.py:123-133;
            # indices come from audio.specaugment.compute_mask_indices)
            masked_embed = self.param(
                "masked_spec_embed",
                nn.initializers.uniform(1.0),
                (c.hidden_size,),
                self.param_dtype,
            ).astype(x.dtype)
            x = jnp.where(mask_time_indices[..., None], masked_embed[None, None], x)

        attn_bias = None
        if valid_len is not None:
            frame_ids = jnp.arange(x.shape[1])[None, :]
            key_valid = frame_ids < valid_len[:, None]  # (B, T)
            # zero padded features (HF zeroes masked hidden states) and mask
            # them out of every attention's keys
            x = jnp.where(key_valid[..., None], x, 0.0)
            attn_bias = jnp.where(key_valid, 0.0, -1e9)[:, None, None, :]

        pos = PositionalConvEmbedding(c, self.dtype, self.param_dtype, name="pos_conv_embed")(x)
        x = x + pos
        x = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=self.dtype, param_dtype=self.param_dtype,
            name="encoder_layer_norm",
        )(x)
        for i in range(c.num_hidden_layers):
            x = EncoderLayer(c, self.dtype, self.param_dtype, name=f"layers_{i}")(
                x, deterministic, attn_bias
            )
        return x
