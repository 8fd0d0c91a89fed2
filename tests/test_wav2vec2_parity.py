"""Parity of audio.wav2vec2 against HF torch Wav2Vec2Model (random init).

Builds a tiny HF config locally (no downloads), imports its random weights
via audio.import_hf, and compares full forwards — this pins the conv
frontend (incl. per-channel group norm), weight-normed positional conv,
post-LN encoder and the reference's resample placement (between extractor
and projection, AudioEncoders.py:55-67).
"""

import numpy as np
import pytest
import torch

from avi_talking_tpu.audio import (
    Wav2Vec2Config,
    Wav2Vec2Model,
    frame_audio,
    normalize_audio,
    wav2vec2_params_from_torch,
)

transformers = pytest.importorskip("transformers")


def _tiny_pair():
    cfg = Wav2Vec2Config.tiny()
    hf_cfg = transformers.Wav2Vec2Config(
        conv_dim=list(cfg.conv_dim),
        conv_kernel=list(cfg.conv_kernel),
        conv_stride=list(cfg.conv_stride),
        conv_bias=cfg.conv_bias,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
        feat_extract_norm="group",
        do_stable_layer_norm=False,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
    )
    torch.manual_seed(0)
    hf = transformers.Wav2Vec2Model(hf_cfg).eval()
    return cfg, hf


def test_forward_parity_no_resample():
    cfg, hf = _tiny_pair()
    model = Wav2Vec2Model(cfg)
    params = {"params": wav2vec2_params_from_torch(hf.state_dict(), cfg)}
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((2, 2000)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(audio)).last_hidden_state.numpy()
    got = np.asarray(model.apply(params, audio, resample=False))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_forward_parity_with_resample():
    cfg, hf = _tiny_pair()
    model = Wav2Vec2Model(cfg)
    params = {"params": wav2vec2_params_from_torch(hf.state_dict(), cfg)}
    rng = np.random.default_rng(1)
    audio = rng.standard_normal((1, 4000)).astype(np.float32)

    # reference ordering: extractor -> interpolate to output_len -> projection
    # -> encoder (models/lib/wav2vec.py:97-149)
    out_len = 7
    with torch.no_grad():
        feats = hf.feature_extractor(torch.from_numpy(audio)).transpose(1, 2)
        feats = (
            torch.nn.functional.interpolate(
                feats.transpose(1, 2), size=out_len, align_corners=True, mode="linear"
            ).transpose(1, 2)
        )
        hid, _ = hf.feature_projection(feats)
        ref = hf.encoder(hid).last_hidden_state.numpy()

    got = np.asarray(model.apply(params, audio, output_len=out_len))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_frontend_framing():
    rng = np.random.default_rng(2)
    wav = rng.uniform(-1, 1, 16000 * 2 + 300).astype(np.float32)  # 2s + tail
    frames = frame_audio(wav)
    assert frames.shape == (50, 640)
    assert frames.dtype == np.int16
    # tail dropped, content preserved
    ref = (wav.astype(np.float64) * 32768).astype(np.int16)[: 50 * 640]
    np.testing.assert_array_equal(frames.reshape(-1), ref)

    padded = frame_audio(wav, pad_to_multiple=8)
    assert padded.shape[0] == 56
    assert (padded[50:] == 0).all()

    norm = normalize_audio(frames)
    assert abs(norm.mean()) < 1e-4 and abs(norm.std() - 1) < 1e-3


def test_processor_normalization_matches_hf():
    tf = pytest.importorskip("transformers")
    proc = tf.Wav2Vec2FeatureExtractor(
        feature_size=1, sampling_rate=16000, do_normalize=True,
        return_attention_mask=False,
    )
    rng = np.random.default_rng(3)
    frames = frame_audio(rng.uniform(-1, 1, 16000).astype(np.float32))
    ref = proc(frames.reshape(-1).astype(np.float32), sampling_rate=16000).input_values[0]
    got = normalize_audio(frames)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_valid_len_masks_padding():
    """valid_len removes padded-tail attention leakage.

    Mechanism test with a layer-norm conv extractor and no resampling (conv
    is local + per-frame LN), where padded+masked must equal the unpadded
    forward on valid frames. (The "group"-norm base extractor normalises
    over the full time axis, so padded batching is inherently approximate
    there — the same caveat HF documents for wav2vec2-base.)
    """
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    cfg = dc.replace(Wav2Vec2Config.tiny(), feat_extract_norm="layer",
                     conv_bias=True)
    model = Wav2Vec2Model(cfg, model_expected_fps=25, target_fps=25)
    rng = np.random.default_rng(5)
    n_valid = 2000
    audio = rng.standard_normal((1, n_valid)).astype(np.float32)
    padded = np.concatenate([audio, np.zeros((1, n_valid), np.float32)], axis=1)
    params = model.init(jax.random.PRNGKey(0), padded, resample=False)

    ref = model.apply(params, audio, resample=False)
    T_valid = ref.shape[1]
    got = model.apply(
        params, padded, resample=False, valid_len=jnp.asarray([T_valid])
    )
    np.testing.assert_allclose(
        np.asarray(got[:, :T_valid]), np.asarray(ref), rtol=1e-4, atol=1e-4
    )
    # without valid_len the padded tail leaks into the valid region
    unmasked = model.apply(params, padded, resample=False)
    assert not np.allclose(
        np.asarray(unmasked[:, :T_valid]), np.asarray(ref), atol=1e-3
    )


def test_wav2vec2_ser_head():
    import jax

    from avi_talking_tpu.audio.ser import Wav2Vec2SER

    cfg = Wav2Vec2Config.tiny()
    ser = Wav2Vec2SER(cfg, num_labels=8, classifier_proj_size=16)
    audio = np.random.default_rng(0).standard_normal((2, 3200)).astype(np.float32)
    params = ser.init(jax.random.PRNGKey(0), audio, output_len=5)
    logits = ser.apply(params, audio, output_len=5)
    assert logits.shape == (2, 8)
