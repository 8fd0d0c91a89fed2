"""Checkpointing: orbax save/restore + reference torch-checkpoint import.

Replaces the reference's three checkpoint mechanisms (SURVEY.md §5.4):
driver ``save_ckpt``/``resume_ckpt`` .pth dicts
(train_diffusion_prior.py:155-170,238-251), Lightning ModelCheckpoint, and
PIRender BaseTrainer — with one orbax-backed store, plus importers that read
the reference's .pth files into our param trees so users can bring the
published weights.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Optional


def save_checkpoint(path: str, state: Any, force: bool = True) -> None:
    """Save a pytree (params / train state) with orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=force)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        return ckptr.restore(path, target=target)
    return ckptr.restore(path)


# --------- reference .pth importers --------------------------------------


def load_torch_state_dict(path: str) -> Mapping[str, Any]:
    """Load a torch checkpoint on host (CPU, weights only when possible)."""
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        obj = torch.load(path, map_location="cpu")
    if isinstance(obj, dict) and "model_state_dict" in obj:
        return obj["model_state_dict"]
    if isinstance(obj, dict) and "state_dict" in obj:
        return obj["state_dict"]
    return obj


def import_prior_checkpoint(path: str, brain_cfg=None) -> Dict[str, Any]:
    """Reference driver last.pth/best.pth -> {"brain": ..., "prior": ...}.

    Layout (train_diffusion_prior.py:160-168): model_state_dict holds
    ``voxel2clip.*`` (BrainNetwork) and ``net.*`` (prior transformer).
    """
    from . import torch_compat as tc

    sd = load_torch_state_dict(path)
    brain = _brain_from_torch({k[len("voxel2clip."):]: v for k, v in sd.items()
                               if k.startswith("voxel2clip.")})
    prior = _prior_net_from_torch({k[len("net."):]: v for k, v in sd.items()
                                   if k.startswith("net.")})
    return {"brain": {"params": brain}, "prior": {"params": prior}}


def _brain_from_torch(sd: Mapping[str, Any]) -> Dict[str, Any]:
    from . import torch_compat as tc

    p: Dict[str, Any] = {
        "lin0_dense": tc.linear_params(sd, "lin0.0."),
        "lin0_norm": tc.layernorm_params(sd, "lin0.1."),
        "lin1": tc.linear_params(sd, "lin1."),
    }
    i = 0
    while f"mlp.{i}.0.weight" in sd:
        p[f"mlp_{i}_dense"] = tc.linear_params(sd, f"mlp.{i}.0.")
        p[f"mlp_{i}_norm"] = tc.layernorm_params(sd, f"mlp.{i}.1.")
        i += 1
    if "projector.0.weight" in sd:
        p.update(
            proj_norm0=tc.layernorm_params(sd, "projector.0."),
            proj_dense1=tc.linear_params(sd, "projector.2."),
            proj_norm1=tc.layernorm_params(sd, "projector.3."),
            proj_dense2=tc.linear_params(sd, "projector.5."),
            proj_norm2=tc.layernorm_params(sd, "projector.6."),
            proj_dense3=tc.linear_params(sd, "projector.8."),
        )
    return p


def _prior_net_from_torch(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """dalle2 VersatileDiffusionPriorNetwork state dict -> our params.

    Mapping notes: torch Sequential time-embed MLP
    (to_time_embeds.0.1.net.{0,2,4}); causal transformer layers
    (causal_transformer.layers.{i}.{0,1} = attention, feedforward).
    """
    from . import torch_compat as tc

    p: Dict[str, Any] = {
        "null_brain_embeds": tc.to_np(sd["null_brain_embeds"]),
        "null_image_embed": tc.to_np(sd["null_image_embed"]),
        "learned_query": tc.to_np(sd["learned_query"]),
        "to_time_embeds": {
            "dense0": tc.linear_params(sd, "to_time_embeds.0.1.net.0.0."),
            "dense1": tc.linear_params(sd, "to_time_embeds.0.1.net.1.0."),
            "dense_out": tc.linear_params(sd, "to_time_embeds.0.1.net.2."),
        },
    }
    ct: Dict[str, Any] = {
        "rel_pos_bias": {
            "relative_attention_bias": tc.to_np(
                sd["causal_transformer.rel_pos_bias.relative_attention_bias.weight"]
            )
        },
        "norm_out": {"g": tc.to_np(sd["causal_transformer.norm.g"])},
        "project_out": {
            "kernel": tc.to_np(sd["causal_transformer.project_out.weight"]).T
        },
    }
    i = 0
    while f"causal_transformer.layers.{i}.0.to_q.weight" in sd:
        ap = f"causal_transformer.layers.{i}.0."
        fp = f"causal_transformer.layers.{i}.1."
        ct[f"attn_{i}"] = {
            "norm": {"g": tc.to_np(sd[f"{ap}norm.g"])},
            "null_kv": tc.to_np(sd[f"{ap}null_kv"]),
            "to_q": {"kernel": tc.to_np(sd[f"{ap}to_q.weight"]).T},
            "to_kv": {"kernel": tc.to_np(sd[f"{ap}to_kv.weight"]).T},
            "to_out": {"kernel": tc.to_np(sd[f"{ap}to_out.0.weight"]).T},
            "out_norm": {"g": tc.to_np(sd[f"{ap}to_out.1.g"])},
        }
        ct[f"ff_{i}"] = {
            "norm": {"g": tc.to_np(sd[f"{fp}0.g"]) if f"{fp}0.g" in sd
                     else tc.to_np(sd[f"{fp}net.0.g"])},
            "dense_in": {
                "kernel": tc.to_np(
                    sd[f"{fp}1.weight"] if f"{fp}1.weight" in sd
                    else sd[f"{fp}net.1.weight"]
                ).T
            },
            "dense_out": {
                "kernel": tc.to_np(
                    sd[f"{fp}5.weight"] if f"{fp}5.weight" in sd
                    else sd[f"{fp}net.5.weight"]
                ).T
            },
        }
        i += 1
    p["causal_transformer"] = ct
    return p
