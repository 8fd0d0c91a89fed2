"""HF torch Wav2Vec2Model state-dict -> our linen param tree.

Handles the weight-norm parameterisation of the positional conv
(``weight_g``/``weight_v``, normalised over dims (0, 1) per kernel position)
by materialising the effective kernel on host — the runtime model stores a
plain conv kernel.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from ..infra.torch_compat import layernorm_params, linear_params, to_np
from .wav2vec2 import Wav2Vec2Config


def _conv_kernel(sd: Mapping[str, Any], key: str) -> np.ndarray:
    # torch Conv1d weight (O, I/groups, K) -> flax (K, I/groups, O)
    return to_np(sd[key]).transpose(2, 1, 0)


def _pos_conv_kernel(sd: Mapping[str, Any], prefix: str) -> np.ndarray:
    if f"{prefix}weight" in sd:
        w = to_np(sd[f"{prefix}weight"])
    else:
        # weight-norm: w = g * v / ||v|| over dims (0,1) (torch dim=2)
        for gk, vk in (
            (f"{prefix}weight_g", f"{prefix}weight_v"),
            (f"{prefix}parametrizations.weight.original0", f"{prefix}parametrizations.weight.original1"),
        ):
            if gk in sd:
                g = to_np(sd[gk])
                v = to_np(sd[vk])
                norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
                w = g * v / norm
                break
        else:
            raise KeyError(f"no pos-conv weight under {prefix!r}")
    return w.transpose(2, 1, 0)


def wav2vec2_params_from_torch(
    sd: Mapping[str, Any], cfg: Wav2Vec2Config, prefix: str = ""
) -> Dict[str, Any]:
    """Convert an HF ``Wav2Vec2Model.state_dict()`` into params for
    audio.wav2vec2.Wav2Vec2Model. ``prefix`` strips e.g. ``wav2vec2.``."""
    p = prefix
    params: Dict[str, Any] = {}

    fe: Dict[str, Any] = {}
    for i in range(len(cfg.conv_dim)):
        layer: Dict[str, Any] = {
            "conv": {"kernel": _conv_kernel(sd, f"{p}feature_extractor.conv_layers.{i}.conv.weight")}
        }
        if f"{p}feature_extractor.conv_layers.{i}.conv.bias" in sd:
            layer["conv"]["bias"] = to_np(sd[f"{p}feature_extractor.conv_layers.{i}.conv.bias"])
        ln_key = f"{p}feature_extractor.conv_layers.{i}.layer_norm.weight"
        if ln_key in sd:
            layer["layer_norm"] = {
                "scale": to_np(sd[ln_key]),
                "bias": to_np(sd[f"{p}feature_extractor.conv_layers.{i}.layer_norm.bias"]),
            }
        fe[f"conv_layers_{i}"] = layer
    params["feature_extractor"] = fe

    params["feature_projection"] = {
        "layer_norm": layernorm_params(sd, f"{p}feature_projection.layer_norm."),
        "projection": linear_params(sd, f"{p}feature_projection.projection."),
    }

    params["pos_conv_embed"] = {
        "conv": {
            "kernel": _pos_conv_kernel(sd, f"{p}encoder.pos_conv_embed.conv."),
            "bias": to_np(sd[f"{p}encoder.pos_conv_embed.conv.bias"]),
        }
    }
    params["encoder_layer_norm"] = layernorm_params(sd, f"{p}encoder.layer_norm.")

    for i in range(cfg.num_hidden_layers):
        lp = f"{p}encoder.layers.{i}."
        params[f"layers_{i}"] = {
            "attn_q": linear_params(sd, f"{lp}attention.q_proj."),
            "attn_k": linear_params(sd, f"{lp}attention.k_proj."),
            "attn_v": linear_params(sd, f"{lp}attention.v_proj."),
            "attn_out": linear_params(sd, f"{lp}attention.out_proj."),
            "layer_norm": layernorm_params(sd, f"{lp}layer_norm."),
            "intermediate_dense": linear_params(sd, f"{lp}feed_forward.intermediate_dense."),
            "output_dense": linear_params(sd, f"{lp}feed_forward.output_dense."),
            "final_layer_norm": layernorm_params(sd, f"{lp}final_layer_norm."),
        }
    return params
