"""PyTorch state-dict -> JAX param-tree conversion.

The reference ships its pretrained weights as torch checkpoints (EMOTE ckpt,
diffusion-prior ``last.pth``, HF wav2vec2/CLIP, PIRender ``net_G`` — see
/root/reference/README.md "Pretrained Model" and
/root/reference/train_diffusion_prior.py:238-251). This module converts those
layouts into the parameter trees of our linen modules so a user can load the
reference's checkpoints into the TPU framework unchanged.

Everything here runs on host (numpy); nothing is jitted.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def to_np(t) -> np.ndarray:
    """torch.Tensor | np.ndarray -> float numpy array on host."""
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()


def linear_params(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """torch nn.Linear -> flax nn.Dense params (kernel transposed)."""
    out = {"kernel": to_np(sd[f"{prefix}weight"]).T}
    if f"{prefix}bias" in sd:
        out["bias"] = to_np(sd[f"{prefix}bias"])
    return out


def layernorm_params(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": to_np(sd[f"{prefix}weight"]),
        "bias": to_np(sd[f"{prefix}bias"]),
    }


def mha_params(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """torch nn.MultiheadAttention -> ops.transformer.MultiHeadAttention."""
    return {
        "in_proj_weight": to_np(sd[f"{prefix}in_proj_weight"]),
        "in_proj_bias": to_np(sd[f"{prefix}in_proj_bias"]),
        "out_proj_weight": to_np(sd[f"{prefix}out_proj.weight"]),
        "out_proj_bias": to_np(sd[f"{prefix}out_proj.bias"]),
    }


def encoder_layer_params(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """torch nn.TransformerEncoderLayer -> ops.transformer.TransformerEncoderLayer."""
    return {
        "self_attn": mha_params(sd, f"{prefix}self_attn."),
        "linear1": linear_params(sd, f"{prefix}linear1."),
        "linear2": linear_params(sd, f"{prefix}linear2."),
        "norm1": layernorm_params(sd, f"{prefix}norm1."),
        "norm2": layernorm_params(sd, f"{prefix}norm2."),
    }


def decoder_layer_params(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """torch nn.TransformerDecoderLayer -> ops.transformer.TransformerDecoderLayer."""
    return {
        "self_attn": mha_params(sd, f"{prefix}self_attn."),
        "multihead_attn": mha_params(sd, f"{prefix}multihead_attn."),
        "linear1": linear_params(sd, f"{prefix}linear1."),
        "linear2": linear_params(sd, f"{prefix}linear2."),
        "norm1": layernorm_params(sd, f"{prefix}norm1."),
        "norm2": layernorm_params(sd, f"{prefix}norm2."),
        "norm3": layernorm_params(sd, f"{prefix}norm3."),
    }


def encoder_params(sd: Mapping[str, Any], prefix: str, num_layers: int) -> Dict[str, Any]:
    """torch nn.TransformerEncoder -> ops.transformer.TransformerEncoder."""
    return {
        f"layers_{i}": encoder_layer_params(sd, f"{prefix}layers.{i}.")
        for i in range(num_layers)
    }


def decoder_params(sd: Mapping[str, Any], prefix: str, num_layers: int) -> Dict[str, Any]:
    """torch nn.TransformerDecoder -> ops.transformer.TransformerDecoder."""
    return {
        f"layers_{i}": decoder_layer_params(sd, f"{prefix}layers.{i}.")
        for i in range(num_layers)
    }


def conv1d_params(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """torch nn.Conv1d (O, I, K) -> flax nn.Conv kernel (K, I, O)."""
    out = {"kernel": to_np(sd[f"{prefix}weight"]).transpose(2, 1, 0)}
    if f"{prefix}bias" in sd:
        out["bias"] = to_np(sd[f"{prefix}bias"])
    return out


def conv_transpose1d_params(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """torch nn.ConvTranspose1d (I, O, K) -> flax nn.ConvTranspose with
    ``transpose_kernel=True``: kernel layout (K, O, I)."""
    out = {"kernel": np.ascontiguousarray(to_np(sd[f"{prefix}weight"]).transpose(2, 1, 0))}
    if f"{prefix}bias" in sd:
        out["bias"] = to_np(sd[f"{prefix}bias"])
    return out


def groupnorm_params(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": to_np(sd[f"{prefix}weight"]),
        "bias": to_np(sd[f"{prefix}bias"]),
    }


def embedding_params(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"embedding": to_np(sd[f"{prefix}weight"])}


def batchnorm1d_params(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """torch nn.BatchNorm1d -> flax nn.BatchNorm params + batch_stats."""
    return {
        "params": {
            "scale": to_np(sd[f"{prefix}weight"]),
            "bias": to_np(sd[f"{prefix}bias"]),
        },
        "batch_stats": {
            "mean": to_np(sd[f"{prefix}running_mean"]),
            "var": to_np(sd[f"{prefix}running_var"]),
        },
    }
