"""Flagship parity: full EMOTE forward vs a torch oracle with one shared
state dict, exercising infra.emote_import end to end (audio encoder ->
style add -> bert -> bottleneck -> stack-linear squash -> FLINT decode)."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from avi_talking_tpu.infra.emote_import import emote_params_from_torch
from avi_talking_tpu.models.conditioning import StyleCondition
from avi_talking_tpu.models.emote import EmoteConfig, EmoteTalkingHead

transformers = pytest.importorskip("transformers")


def _build_torch_emote(cfg: EmoteConfig, squash: str = "stacklinear_after",
                       prefix: str = "talking_head_model.",
                       vq_leftovers: bool = False):
    """torch modules named like the inferno EMOTE checkpoint layout.

    ``squash``: "stacklinear_after" (EMOTE release, squasher_2.linear) or
    "conv_before" (bertprior.yaml variant, squasher.squasher conv stack).
    ``vq_leftovers`` adds motion_encoder/motion_quantizer/preprocessor keys
    as a VQ-VAE checkpoint saved before discard_encoder would carry.
    """
    w = cfg.wav2vec2
    hf_cfg = transformers.Wav2Vec2Config(
        conv_dim=list(w.conv_dim), conv_kernel=list(w.conv_kernel),
        conv_stride=list(w.conv_stride), conv_bias=w.conv_bias,
        hidden_size=w.hidden_size, num_hidden_layers=w.num_hidden_layers,
        num_attention_heads=w.num_attention_heads,
        intermediate_size=w.intermediate_size,
        num_conv_pos_embeddings=w.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=w.num_conv_pos_embedding_groups,
        feat_extract_norm="group", do_stable_layer_norm=False,
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        layerdrop=0.0, apply_spec_augment=False,
    )
    torch.manual_seed(0)
    audio = transformers.Wav2Vec2Model(hf_cfg).eval()
    d = cfg.feature_dim
    fl = cfg.flint
    seq_lin = tnn.Linear(w.hidden_size, d)
    obj_map = tnn.Linear(8 + 3 + 4 + cfg.n_shape, d)  # cond dim of the test
    bert_layer = tnn.TransformerEncoderLayer(
        d_model=d, nhead=cfg.nhead, dim_feedforward=d, activation="gelu",
        dropout=0.0, batch_first=True,
    )
    bert = tnn.TransformerEncoder(bert_layer, num_layers=cfg.num_layers)
    decoder = tnn.Linear(d, fl.bottleneck_dim)
    if squash == "stacklinear_after":
        squasher = tnn.Linear(fl.bottleneck_dim * fl.latent_frame_size,
                              fl.bottleneck_dim)
    else:  # conv_before: create_squasher (L2lMotionPrior.py:107-122)
        stages = [tnn.Sequential(
            tnn.Conv1d(d, d, 5, stride=2, padding=2, padding_mode="replicate"),
            tnn.LeakyReLU(0.2, True), tnn.BatchNorm1d(d))]
        for _ in range(1, fl.quant_factor):
            stages.append(tnn.Sequential(
                tnn.Conv1d(d, d, 5, stride=1, padding=2, padding_mode="replicate"),
                tnn.LeakyReLU(0.2, True), tnn.BatchNorm1d(d), tnn.MaxPool1d(2)))

        class _ConvSquasher(tnn.Module):
            def __init__(self):
                super().__init__()
                self.squasher = tnn.Sequential(*stages)

            def forward(self, x):  # (B, T, F)
                return self.squasher(x.transpose(1, 2)).transpose(1, 2)

        squasher = _ConvSquasher().eval()
        for mod in squasher.modules():
            if isinstance(mod, tnn.BatchNorm1d):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.7, 1.4)

    class FlintDec(tnn.Module):
        def __init__(self):
            super().__init__()
            mods = [tnn.Sequential(
                tnn.ConvTranspose1d(fl.feature_dim, fl.feature_dim, 5, stride=2,
                                    padding=2, output_padding=1),
                tnn.LeakyReLU(0.2, True), tnn.BatchNorm1d(fl.feature_dim))]
            for _ in range(1, fl.quant_factor):
                mods.append(tnn.Sequential(
                    tnn.Conv1d(fl.feature_dim, fl.feature_dim, 5, stride=1,
                               padding=2, padding_mode="replicate"),
                    tnn.LeakyReLU(0.2, True), tnn.BatchNorm1d(fl.feature_dim)))
            self.expander = tnn.ModuleList(mods)
            self.decoder_linear_embedding = tnn.Linear(fl.feature_dim, fl.feature_dim)
            layer = tnn.TransformerEncoderLayer(
                d_model=fl.feature_dim, nhead=fl.nhead,
                dim_feedforward=fl.intermediate_size, activation=fl.activation,
                dropout=0.0, batch_first=True)
            self.decoder_transformer = tnn.TransformerEncoder(layer, 1)
            self.cross_smooth_layer = tnn.Conv1d(fl.feature_dim, fl.out_dim, 5,
                                                 padding=2)

        def forward(self, x):
            for i, m in enumerate(self.expander):
                x = m(x.permute(0, 2, 1)).permute(0, 2, 1)
                if i > 0:
                    x = x.repeat_interleave(2, dim=1)
            x = self.decoder_linear_embedding(x)
            x = self.decoder_transformer(x)
            return self.cross_smooth_layer(x.permute(0, 2, 1)).permute(0, 2, 1)

    flint = FlintDec().eval()

    sd = {}
    for k, v in audio.state_dict().items():
        sd[f"talking_head_model.audio_model.model.{k}"] = v
    for k, v in seq_lin.state_dict().items():
        sd[f"talking_head_model.sequence_encoder.linear.{k}"] = v
    for k, v in obj_map.state_dict().items():
        sd[f"talking_head_model.sequence_decoder.obj_vector.map.{k}"] = v
    for k, v in bert.state_dict().items():
        sd[f"talking_head_model.sequence_decoder.bert_decoder.{k}"] = v
    for k, v in decoder.state_dict().items():
        sd[f"talking_head_model.sequence_decoder.decoder.{k}"] = v
    sq_base = ("sequence_decoder.squasher_2.linear."
               if squash == "stacklinear_after"
               else "sequence_decoder.squasher.")
    for k, v in squasher.state_dict().items():
        sd[f"talking_head_model.{sq_base}{k}"] = v
    for k, v in flint.state_dict().items():
        sd[f"talking_head_model.sequence_decoder.motion_prior.motion_decoder.{k}"] = v
    if vq_leftovers:
        # keys a VQ-VAE motion-prior checkpoint retains (MotionPrior.py:131-136)
        sd["talking_head_model.sequence_decoder.motion_prior.motion_encoder.squasher.0.0.weight"] = torch.zeros(4, 4, 5)
        sd["talking_head_model.sequence_decoder.motion_prior.motion_quantizer.codebook.weight"] = torch.zeros(16, fl.bottleneck_dim)
        sd["talking_head_model.sequence_decoder.motion_prior.preprocessor.mean"] = torch.zeros(3)
        sd["talking_head_model.preprocessor.some_buffer"] = torch.zeros(1)
    if prefix != "talking_head_model.":
        sd = {prefix + k[len("talking_head_model."):]: v for k, v in sd.items()}

    mods = dict(audio=audio, seq_lin=seq_lin, obj_map=obj_map, bert=bert,
                decoder=decoder, squasher=squasher, flint=flint)
    return sd, mods


@pytest.mark.slow
def test_full_emote_forward_parity():
    cfg = EmoteConfig.tiny()
    sd, m = _build_torch_emote(cfg)
    fl = cfg.flint

    B, T = 2, 8
    rng = np.random.default_rng(0)
    frames = rng.standard_normal((B, T, 640)).astype(np.float32)
    cond = StyleCondition.make(
        emotion_idx=3, intensity_idx=1, identity_idx=2, batch=B,
        n_identities=4, shape_dim=cfg.n_shape,
    )

    # ---- torch oracle chain --------------------------------------------
    with torch.no_grad():
        flat = torch.from_numpy(frames.reshape(B, -1))
        feats = m["audio"].feature_extractor(flat).transpose(1, 2)
        feats = TF.interpolate(feats.transpose(1, 2), size=T, mode="linear",
                               align_corners=True).transpose(1, 2)
        hid, _ = m["audio"].feature_projection(feats)
        hid = m["audio"].encoder(hid).last_hidden_state
        hid = m["seq_lin"](hid)
        style = m["obj_map"](torch.from_numpy(np.asarray(cond.concat(), np.float32)))
        styled = hid + style[:, None]
        dec = m["bert"](styled)
        dec = m["decoder"](dec)
        lat = m["squasher"](dec.reshape(B, T // fl.latent_frame_size, -1))
        ref = m["flint"](lat).numpy()

    # ---- ours via the importer ------------------------------------------
    head = EmoteTalkingHead(cfg)
    variables = emote_params_from_torch(sd, cfg)
    out = head.apply(variables, jnp.asarray(frames), cond)
    got = np.concatenate([np.asarray(out["exp"]), np.asarray(out["jaw"])], axis=-1)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_full_emote_forward_parity_conv_before():
    """bertprior.yaml variant: squash_before + ConvSquasher
    (FaceFormerDecoder.py:1040-1047 squasher placement, :953-965 conv type,
    L2lMotionPrior.py:107-122 layout)."""
    import dataclasses

    cfg = dataclasses.replace(
        EmoteConfig.tiny(), squash_type="conv", squash_before=True
    )
    sd, m = _build_torch_emote(cfg, squash="conv_before")
    fl = cfg.flint

    B, T = 2, 8
    rng = np.random.default_rng(1)
    frames = rng.standard_normal((B, T, 640)).astype(np.float32)
    cond = StyleCondition.make(
        emotion_idx=3, intensity_idx=1, identity_idx=2, batch=B,
        n_identities=4, shape_dim=cfg.n_shape,
    )
    with torch.no_grad():
        flat = torch.from_numpy(frames.reshape(B, -1))
        feats = m["audio"].feature_extractor(flat).transpose(1, 2)
        feats = TF.interpolate(feats.transpose(1, 2), size=T, mode="linear",
                               align_corners=True).transpose(1, 2)
        hid, _ = m["audio"].feature_projection(feats)
        hid = m["audio"].encoder(hid).last_hidden_state
        hid = m["seq_lin"](hid)
        style = m["obj_map"](torch.from_numpy(np.asarray(cond.concat(), np.float32)))
        styled = hid + style[:, None]
        # _decode order with squash_before (FaceFormerDecoder.py:1195-1207)
        styled = m["squasher"](styled)
        dec = m["bert"](styled)
        dec = m["decoder"](dec)
        ref = m["flint"](dec).numpy()

    head = EmoteTalkingHead(cfg)
    variables = emote_params_from_torch(sd, cfg)
    out = head.apply(variables, jnp.asarray(frames), cond)
    got = np.concatenate([np.asarray(out["exp"]), np.asarray(out["jaw"])], axis=-1)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)


def test_import_tolerates_vq_leftovers_and_bare_prefix():
    """Keys a VQ-VAE checkpoint retains (motion_encoder/quantizer/
    preprocessor) must be ignored, and a bare (non-Lightning-prefixed)
    state dict must import identically."""
    cfg = EmoteConfig.tiny()
    sd_plain, _ = _build_torch_emote(cfg)
    sd_left, _ = _build_torch_emote(cfg, vq_leftovers=True)
    sd_bare, _ = _build_torch_emote(cfg, prefix="")
    v_plain = emote_params_from_torch(sd_plain, cfg)
    v_left = emote_params_from_torch(sd_left, cfg)
    v_bare = emote_params_from_torch(sd_bare, cfg)
    for a, b in ((v_left, v_plain), (v_bare, v_plain)):
        la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
        assert len(la) == len(lb)
        for x, y in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_import_squasher_config_mismatch_raises():
    cfg = EmoteConfig.tiny()  # stack_linear config
    sd, _ = _build_torch_emote(cfg, squash="conv_before")
    with pytest.raises(ValueError, match="squasher"):
        emote_params_from_torch(sd, cfg)


def test_cli_import_emote(tmp_path):
    """`cli import-emote --tiny` converts a synthetic inferno-layout ckpt
    into an orbax checkpoint matching emote_params_from_torch."""
    import torch as _torch

    from avi_talking_tpu.cli import main
    from avi_talking_tpu.infra.checkpoint import restore_checkpoint
    from avi_talking_tpu.infra.emote_import import emote_params_from_torch

    cfg = EmoteConfig.tiny()
    sd, _ = _build_torch_emote(cfg)
    path = str(tmp_path / "emote.ckpt")
    _torch.save({"state_dict": sd}, path)
    out = str(tmp_path / "orbax")
    assert main(["import-emote", "--ckpt", path, "--out", out, "--tiny"]) == 0
    ref = emote_params_from_torch(sd, cfg)
    got = restore_checkpoint(out, target=ref)
    import jax

    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
