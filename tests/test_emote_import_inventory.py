"""Enumerated-layout EMOTE importer fixture (verdict r2 carry-over risk).

The round-2 importer fixture was hand-built torch modules; key-name drift
between the fixture and the real release layout was itself unobserved. Here
the expected state-dict key set is ENUMERATED from a table transcribed from
inferno's module tree:

  * TalkingHeadBase attributes: audio_model / sequence_encoder /
    sequence_decoder (TalkingHeadBase.py:44-46)
  * audio_model.model = HF Wav2Vec2Model (AudioEncoders.py:150) — the HF
    key set is taken from transformers itself (authoritative)
  * LinearSequenceEncoder.linear (SequenceEncoders.py:180-187)
  * FeedForwardDecoder.obj_vector = LinearEmotionCondition.map
    (FaceFormerDecoder.py:261-267)
  * BertPriorDecoder: bert_decoder (torch TransformerEncoder),
    decoder (Linear), squasher_2 = StackLinearSquash.linear
    (FaceFormerDecoder.py:987-1064, :967-983)
  * motion_prior.motion_decoder = L2lDecoder: expander Sequentials
    [ConvTranspose1d/Conv1d, LeakyReLU, BatchNorm1d],
    decoder_linear_embedding, decoder_transformer, cross_smooth_layer,
    optional post_transformer_linear / post_conv_proj
    (L2lMotionPrior.py:361-495)

Tests assert (a) the hand-built torch fixture produces EXACTLY this key
set, and (b) the importer consumes every key — zero leftovers — via
emote_params_from_torch(..., return_report=True).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from avi_talking_tpu.infra.emote_import import emote_params_from_torch  # noqa: E402
from avi_talking_tpu.models.emote import EmoteConfig  # noqa: E402
from test_emote_import_parity import _build_torch_emote  # noqa: E402


def _torch_transformer_encoder_keys(prefix, n_layers):
    """torch.nn.TransformerEncoder state-dict names (batch_first layer)."""
    keys = []
    for i in range(n_layers):
        lp = f"{prefix}layers.{i}."
        keys += [lp + k for k in (
            "self_attn.in_proj_weight", "self_attn.in_proj_bias",
            "self_attn.out_proj.weight", "self_attn.out_proj.bias",
            "linear1.weight", "linear1.bias",
            "linear2.weight", "linear2.bias",
            "norm1.weight", "norm1.bias",
            "norm2.weight", "norm2.bias",
        )]
    return keys


def _bn1d_keys(prefix):
    return [prefix + k for k in (
        "weight", "bias", "running_mean", "running_var",
        "num_batches_tracked",
    )]


def expected_emote_state_dict_keys(
    cfg: EmoteConfig,
    audio_keys,
    prefix="talking_head_model.",
    post_transformer_proj=False,
    post_conv_proj=False,
):
    """The full EMOTE checkpoint inventory, from the transcribed table."""
    keys = [f"{prefix}audio_model.model.{k}" for k in audio_keys]
    keys += [f"{prefix}sequence_encoder.linear.{k}"
             for k in ("weight", "bias")]
    d = f"{prefix}sequence_decoder."
    keys += [f"{d}obj_vector.map.{k}" for k in ("weight", "bias")]
    keys += _torch_transformer_encoder_keys(f"{d}bert_decoder.",
                                            cfg.num_layers)
    keys += [f"{d}decoder.{k}" for k in ("weight", "bias")]
    keys += [f"{d}squasher_2.linear.{k}" for k in ("weight", "bias")]
    m = f"{d}motion_prior.motion_decoder."
    # expander.0 = Sequential[ConvTranspose1d, LeakyReLU, BatchNorm1d]
    keys += [f"{m}expander.0.0.{k}" for k in ("weight", "bias")]
    keys += _bn1d_keys(f"{m}expander.0.2.")
    for i in range(1, cfg.flint.quant_factor):
        keys += [f"{m}expander.{i}.0.{k}" for k in ("weight", "bias")]
        keys += _bn1d_keys(f"{m}expander.{i}.2.")
    keys += [f"{m}decoder_linear_embedding.{k}" for k in ("weight", "bias")]
    keys += _torch_transformer_encoder_keys(f"{m}decoder_transformer.",
                                            cfg.flint.num_layers)
    if post_transformer_proj:
        keys += [f"{m}post_transformer_linear.{k}" for k in ("weight", "bias")]
    keys += [f"{m}cross_smooth_layer.{k}" for k in ("weight", "bias")]
    if post_conv_proj:
        keys += [f"{m}post_conv_proj.{k}" for k in ("weight", "bias")]
    return sorted(keys)


def test_fixture_matches_enumerated_inventory():
    """The hand-built torch fixture's key set == the transcribed inventory
    (key-name drift between fixture and table is itself under test)."""
    cfg = EmoteConfig.tiny()
    sd, mods = _build_torch_emote(cfg)
    audio_keys = sorted(mods["audio"].state_dict().keys())
    expected = expected_emote_state_dict_keys(cfg, audio_keys)
    assert sorted(sd.keys()) == expected


def test_importer_consumes_every_inventory_key():
    """Zero unmatched / leftover keys against the inventory."""
    cfg = EmoteConfig.tiny()
    sd, _ = _build_torch_emote(cfg)
    variables, report = emote_params_from_torch(sd, cfg, return_report=True)
    assert report["leftover"] == [], report["leftover"]
    # everything is either mapped into variables or a documented-unused
    # family (BN step counters here)
    assert set(report["consumed"]) | set(report["ignored"]) == set(sd.keys())
    assert all(k.endswith("num_batches_tracked") or "masked_spec_embed" in k
               for k in report["ignored"]), report["ignored"]


def test_vq_leftovers_are_ignored_not_leftover():
    cfg = EmoteConfig.tiny()
    sd, _ = _build_torch_emote(cfg, vq_leftovers=True)
    _, report = emote_params_from_torch(sd, cfg, return_report=True)
    assert report["leftover"] == [], report["leftover"]
    assert any("motion_quantizer" in k for k in report["ignored"])


def test_renamed_key_is_reported_as_leftover():
    """A release checkpoint with an extra/renamed tensor fails the zero-
    leftover gate instead of half-loading silently."""
    cfg = EmoteConfig.tiny()
    sd, _ = _build_torch_emote(cfg)
    sd["talking_head_model.sequence_decoder.mystery_head.weight"] = (
        torch.zeros(3, 3))
    _, report = emote_params_from_torch(sd, cfg, return_report=True)
    assert report["leftover"] == [
        "talking_head_model.sequence_decoder.mystery_head.weight"]


def test_flint_post_proj_heads_import_and_match():
    """Optional L2l post_transformer_linear / post_conv_proj heads
    (L2lMotionPrior.py:434-455): imported with cfg flags set, bit parity
    with the torch decoder; without the flags the import refuses."""
    import dataclasses

    import jax.numpy as jnp

    from avi_talking_tpu.models.flint import FlintConfig, FlintDecoder

    cfg = EmoteConfig.tiny()
    fl = cfg.flint
    sd, mods = _build_torch_emote(cfg)
    torch.manual_seed(3)
    ptl = tnn.Linear(fl.feature_dim, fl.feature_dim)
    pcp = tnn.Linear(fl.out_dim, fl.out_dim)
    m = "talking_head_model.sequence_decoder.motion_prior.motion_decoder."
    for k, v in ptl.state_dict().items():
        sd[f"{m}post_transformer_linear.{k}"] = v
    for k, v in pcp.state_dict().items():
        sd[f"{m}post_conv_proj.{k}"] = v

    with pytest.raises(ValueError, match="post_transformer_proj"):
        emote_params_from_torch(sd, cfg)

    fl2 = dataclasses.replace(fl, post_transformer_proj=True,
                              post_conv_proj=True)
    cfg2 = dataclasses.replace(cfg, flint=fl2)
    variables, report = emote_params_from_torch(sd, cfg2, return_report=True)
    assert report["leftover"] == [], report["leftover"]

    # forward parity of the motion-prior subtree vs torch
    flint_t = mods["flint"]
    latents = np.random.default_rng(0).standard_normal(
        (2, 3, fl.feature_dim)).astype(np.float32)
    with torch.no_grad():
        # reference order: transformer -> post_transformer -> smooth conv ->
        # post_conv (L2lMotionPrior.py:484-494); the fixture decoder has no
        # heads, so recompute the chain with them inline:
        x = torch.from_numpy(latents)
        for i, mod in enumerate(flint_t.expander):
            x = mod(x.permute(0, 2, 1)).permute(0, 2, 1)
            if i > 0:
                x = x.repeat_interleave(2, dim=1)
        x = flint_t.decoder_linear_embedding(x)
        x = flint_t.decoder_transformer(x)
        x = ptl(x)
        x = flint_t.cross_smooth_layer(x.permute(0, 2, 1)).permute(0, 2, 1)
        t_ref = pcp(x).numpy()

    dec = FlintDecoder(FlintConfig(
        feature_dim=fl.feature_dim, bottleneck_dim=fl.bottleneck_dim,
        quant_factor=fl.quant_factor, nhead=fl.nhead,
        intermediate_size=fl.intermediate_size, out_dim=fl.out_dim,
        n_exp=fl.n_exp, post_transformer_proj=True, post_conv_proj=True))
    mp_vars = {"params": variables["params"]["motion_prior"],
               "batch_stats": variables["batch_stats"]["motion_prior"]}
    ours = np.asarray(dec.apply(mp_vars, jnp.asarray(latents)))
    assert np.allclose(ours, t_ref, atol=2e-5), np.abs(ours - t_ref).max()
