"""EMOTE checkpoint importer: inferno TalkingHead .ckpt -> EmoteTalkingHead.

Maps the pretrained EMOTE layout (inferno TalkingHeadBase attribute tree,
Lightning 'state_dict' with 'talking_head_model.' / bare prefixes —
TalkingHeadWrapper.load path, inferno_apps/TalkingHead/utils/load.py:28-41):

    audio_model.model.*                       -> audio_encoder (wav2vec2)
    sequence_encoder.linear.*                 -> sequence_encoder
    sequence_decoder.obj_vector.map.*         -> style_encoder.map
    sequence_decoder.bert_decoder.layers.*    -> bert_decoder
    sequence_decoder.decoder.*                -> decoder
    sequence_decoder.squasher_2.linear.*      -> squasher (stack_linear)
    sequence_decoder.motion_prior.motion_decoder.* -> motion_prior (FLINT)

Best-effort: prefix variants are probed; anything missing raises with the
unmatched keys listed so real checkpoints can be mapped incrementally.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Mapping, Tuple

from ..audio.import_hf import wav2vec2_params_from_torch
from ..models.emote import EmoteConfig
from . import torch_compat as tc


class _TrackedDict(dict):
    """Dict view that records every key it serves (with its full original
    prefix), so the importer can prove it consumed the whole checkpoint."""

    def __init__(self, data: Mapping[str, Any], consumed: set, prefix: str = ""):
        super().__init__(data)
        self._consumed = consumed
        self._prefix = prefix

    def __getitem__(self, k):
        self._consumed.add(self._prefix + k)
        return super().__getitem__(k)


def _strip(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    data = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    if isinstance(sd, _TrackedDict):
        return _TrackedDict(data, sd._consumed, sd._prefix + prefix)
    return data


# checkpoint families a full EMOTE .ckpt carries that the inference graph
# deliberately does not use (encoder half discarded at load,
# FaceFormerDecoder.py:1028; masks are non-learned buffers; BN step
# counters are bookkeeping)
IGNORED_KEY_PATTERNS: Tuple[str, ...] = (
    r"\.num_batches_tracked$",
    r"(^|\.)motion_prior\.motion_encoder\.",
    r"(^|\.)motion_prior\.motion_quantizer\.",
    r"(^|\.)motion_prior\.preprocessor\.",
    r"(^|\.)preprocessor\.",  # TalkingHeadBase pseudo-GT preprocessor
    r"(^|\.)motion_prior\..*\.attention_mask",
    r"(^|\.)motion_prior\..*decoder_pos_embedding",
    r"(^|\.)biased_mask",
    r"(^|\.)flame\.",  # motion_prior.get_flame() buffers (template etc.)
    r"masked_spec_embed$",  # wav2vec2 specaugment embedding (train-only)
)


def _is_ignored(key: str) -> bool:
    return any(re.search(p, key) for p in IGNORED_KEY_PATTERNS)


def _first_prefix(sd: Mapping[str, Any], cands) -> str:
    for c in cands:
        if any(k.startswith(c) for k in sd):
            return c
    raise KeyError(f"none of the prefixes {cands} found; keys look like "
                   f"{list(sd)[:5]}")


def _flint_decoder_params(
    sd: Mapping[str, Any], quant_factor: int, flint_cfg=None
) -> Dict[str, Any]:
    p: Dict[str, Any] = {}
    # expander 0: ConvTranspose1d; expander i>0: Conv1d (each Sequential
    # [conv, LeakyReLU, BatchNorm1d])
    p["expander_0_conv"] = tc.conv_transpose1d_params(sd, "expander.0.0.")
    bn = tc.batchnorm1d_params(sd, "expander.0.2.")
    p["expander_0_post"] = {"bn": bn["params"]}
    stats = {"expander_0_post": {"bn": bn["batch_stats"]}}
    for i in range(1, quant_factor):
        p[f"expander_{i}_conv"] = tc.conv1d_params(sd, f"expander.{i}.0.")
        bn = tc.batchnorm1d_params(sd, f"expander.{i}.2.")
        p[f"expander_{i}_post"] = {"bn": bn["params"]}
        stats[f"expander_{i}_post"] = {"bn": bn["batch_stats"]}
    p["decoder_linear_embedding"] = tc.linear_params(sd, "decoder_linear_embedding.")
    n_layers = 0
    while f"decoder_transformer.layers.{n_layers}.self_attn.in_proj_weight" in sd:
        n_layers += 1
    p["decoder_transformer"] = tc.encoder_params(sd, "decoder_transformer.", n_layers)
    # optional projection heads (L2lMotionPrior.py:434-455); the matching
    # FlintConfig flags must be set or the graft would silently drop them
    for torch_name, cfg_flag in (("post_transformer_linear",
                                  "post_transformer_proj"),
                                 ("post_conv_proj", "post_conv_proj")):
        if any(k.startswith(torch_name + ".") for k in sd):
            if flint_cfg is not None and not getattr(flint_cfg, cfg_flag):
                raise ValueError(
                    f"checkpoint has motion_prior {torch_name} weights but "
                    f"FlintConfig.{cfg_flag} is False — the graft would "
                    "silently drop them"
                )
            p[torch_name] = tc.linear_params(sd, torch_name + ".")
    p["cross_smooth_layer"] = tc.conv1d_params(sd, "cross_smooth_layer.")
    return {"params": p, "batch_stats": stats}


def emote_params_from_torch(
    sd: Mapping[str, Any], cfg: EmoteConfig, return_report: bool = False
):
    """Full EMOTE state dict -> variables for models.emote.EmoteTalkingHead.

    With ``return_report=True`` also returns a consumption report
    ``{"consumed", "ignored", "leftover"}`` over the checkpoint's keys:
    ``leftover`` lists tensors the graft neither mapped nor recognises as a
    deliberately-unused family (IGNORED_KEY_PATTERNS) — the
    inventory-enumeration test pins this to empty, so a release checkpoint
    with renamed/extra keys fails loudly instead of half-loading.
    """
    all_keys = list(sd.keys())
    consumed: set = set()
    sd = _TrackedDict(sd, consumed)
    base = _first_prefix(sd, ("talking_head_model.", ""))
    sd = _strip(sd, base) if base else sd

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    audio_sd = _strip(sd, _first_prefix(sd, ("audio_model.model.", "audio_model.")))
    params["audio_encoder"] = wav2vec2_params_from_torch(audio_sd, cfg.wav2vec2)

    seq_prefix = _first_prefix(sd, ("sequence_encoder.linear.", "sequence_encoder."))
    params["sequence_encoder"] = tc.linear_params(sd, seq_prefix)

    dec = _strip(sd, "sequence_decoder.")
    params["style_encoder"] = {"map": tc.linear_params(dec, "obj_vector.map.")}
    if any(k.startswith("bert_decoder.") for k in dec):
        params["bert_decoder"] = tc.encoder_params(dec, "bert_decoder.", cfg.num_layers)
    params["decoder"] = tc.linear_params(dec, "decoder.")

    sq = _squasher_params(dec, cfg)
    params["squasher"] = sq["params"]
    if sq["batch_stats"]:
        stats["squasher"] = sq["batch_stats"]

    # nesting covers both prior families: L2l VQ-VAE and FLINT VAE keep the
    # decoder under motion_prior.motion_decoder (MotionPrior.py:131-136);
    # leftover motion_encoder./motion_quantizer./preprocessor. keys from a
    # checkpoint saved before discard_encoder are ignored.
    flint_sd = _strip(dec, _first_prefix(
        dec, ("motion_prior.motion_decoder.", "motion_prior.decoder.")
    ))
    flint = _flint_decoder_params(flint_sd, cfg.flint.quant_factor, cfg.flint)
    params["motion_prior"] = flint["params"]
    stats["motion_prior"] = flint["batch_stats"]

    variables = {"params": params, "batch_stats": stats}
    if not return_report:
        return variables
    leftover: List[str] = []
    ignored: List[str] = []
    for k in all_keys:
        if k in consumed:
            continue
        (ignored if _is_ignored(k) else leftover).append(k)
    return variables, {
        "consumed": sorted(consumed),
        "ignored": sorted(ignored),
        "leftover": sorted(leftover),
    }


def _squasher_params(dec: Mapping[str, Any], cfg: EmoteConfig) -> Dict[str, Any]:
    """Both squasher placements and both types (FaceFormerDecoder.py:1040-1064):

    - ``squasher_2.linear.*``  -> squash_after  + stack_linear (EMOTE release)
    - ``squasher.linear.*``    -> squash_before + stack_linear
    - ``squasher_2.squasher.N.{0,2}.*`` -> squash_after  + conv
    - ``squasher.squasher.N.{0,2}.*``  -> squash_before + conv

    The matching EmoteConfig (squash_type/squash_before) is validated so a
    layout/config mismatch fails loudly instead of mis-grafting.
    """
    for base, before in (("squasher_2.", False), ("squasher.", True)):
        if any(k.startswith(base + "linear.") for k in dec):
            kind = "stack_linear"
        elif any(k.startswith(base + "squasher.") for k in dec):
            kind = "conv"
        else:
            continue
        if cfg.squash_type != kind or cfg.squash_before != before:
            raise ValueError(
                f"checkpoint squasher is {kind} (squash_before={before}) but "
                f"EmoteConfig has squash_type={cfg.squash_type!r} "
                f"squash_before={cfg.squash_before}"
            )
        if kind == "stack_linear":
            return {"params": tc.linear_params(dec, base + "linear."),
                    "batch_stats": {}}
        p: Dict[str, Any] = {}
        s: Dict[str, Any] = {}
        for i in range(cfg.flint.quant_factor):
            p[f"stage{i}_conv"] = tc.conv1d_params(dec, f"{base}squasher.{i}.0.")
            bn = tc.batchnorm1d_params(dec, f"{base}squasher.{i}.2.")
            p[f"stage{i}_bn"] = bn["params"]
            s[f"stage{i}_bn"] = bn["batch_stats"]
        return {"params": p, "batch_stats": s}
    raise KeyError(
        "no squasher weights found (expected squasher_2.linear/squasher.linear"
        "/[squasher|squasher_2].squasher.N); keys look like "
        f"{sorted(dec)[:5]}"
    )
