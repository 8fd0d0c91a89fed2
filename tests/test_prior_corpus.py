"""Real-corpus prior-training bridge (prepare_train_data equivalent).

Reference behavior: train_diffusion_prior.py:172-197 (frozen EMOTE style
targets from MEAD filename conditions) + :422-449 (frozen CLIP mean over 77
tokens -> voxel, batched into the prior trainer). The round-2 verdict's
done-criterion: an overfit run on an on-disk corpus drives fwd/bwd
retrieval toward 1.0 with the frozen towers jitted and batched.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avi_talking_tpu.data.caption_gen import TalkClipGenerator
from avi_talking_tpu.data.prior_corpus import (
    PriorCorpusFeaturizer,
    load_corpus_items,
    make_val_batches,
    prior_corpus_batches,
    split_items,
)
from avi_talking_tpu.models.clip_text import ClipTextConfig, ClipTextModel
from avi_talking_tpu.models.conditioning import EmotionStyleEncoder

JSON_DIR = "/root/repo/experiments/json_dir"
WAV_DIR = "/root/repo/experiments/wav_dir"


def _hash_tokenizer(vocab_size=99, max_length=16):
    """Deterministic stand-in tokenizer (ids immaterial for random CLIP)."""

    def tok(texts):
        out = np.zeros((len(texts), max_length), np.int32)
        for i, t in enumerate(texts):
            words = t.lower().split()[: max_length]
            for j, w in enumerate(words):
                import zlib

                out[i, j] = zlib.crc32(w.encode()) % vocab_size
        return out

    return tok


def _mead_corpus(tmp_path, n_emotions=8, n_identities=2):
    """Synthetic on-disk MEAD/EMOCA tree + caption JSON: one clip per
    (emotion, identity), 2 frames of tiny npys each."""
    idents = ("M003", "M005")[:n_identities]
    emotions = ("neutral", "happy", "sad", "surprised", "fear", "disgusted",
                "angry", "contempt")[:n_emotions]
    root = tmp_path / "mead"
    names = []
    for ident in idents:
        for k, emo in enumerate(emotions):
            lvl = (k % 3) + 1
            name = f"{ident}_front_{emo}_level{lvl}_001"
            names.append(name)
            for fr in range(2):
                fd = root / name / "EMOCA_v2_lr_mse_20" / f"{fr:06d}_000"
                fd.mkdir(parents=True)
                np.save(fd / "exp.npy", np.zeros(50, np.float32))
                np.save(fd / "pose.npy", np.zeros(6, np.float32))
                np.save(fd / "shape.npy", np.zeros(100, np.float32))
                np.save(fd / "cam.npy", np.zeros(3, np.float32))
    caps = TalkClipGenerator(seed=0).build_captions(names, per_clip=1)
    cap_path = tmp_path / "captions.json"
    cap_path.write_text(json.dumps(caps))
    return str(root), str(cap_path), names


def _featurizer(style_dim=16, shape_dim=8, max_length=16):
    cfg = ClipTextConfig(vocab_size=99, hidden_size=24, num_layers=1,
                         num_heads=2, intermediate_size=32,
                         max_position_embeddings=max_length)
    clip = ClipTextModel(cfg)
    rng = jax.random.PRNGKey(0)
    clip_p = clip.init(rng, jnp.zeros((1, max_length), jnp.int32))
    enc = EmotionStyleEncoder(style_dim)
    enc_p = enc.init(rng, jnp.zeros((1, 9 + 3 + 32 + shape_dim)))
    return PriorCorpusFeaturizer(
        clip_model=clip, clip_params=clip_p, style_encoder=enc,
        style_params=enc_p, tokenizer=_hash_tokenizer(99, max_length),
        shape_dim=shape_dim,
    ), cfg


def test_load_corpus_items_json_dir():
    """Fixture corpus loads with MEAD conditions parsed from mm_paths."""
    items = load_corpus_items(json_dir=JSON_DIR, wav_dir=WAV_DIR)
    assert len(items) == 4
    for it in items:
        # M012_front_neutral_level1_017: M012 is index 5, neutral 0, level1 0
        assert (it.identity_idx, it.emotion_idx, it.intensity_idx) == (5, 0, 0)
        assert it.caption and "###" not in it.caption
    # distinct fixture rows keep distinct names (split can separate them)
    assert len({it.name for it in items}) == 4


def test_load_corpus_items_mead_root(tmp_path):
    root, cap_path, names = _mead_corpus(tmp_path)
    items = load_corpus_items(mead_root=root, captions_path=cap_path)
    assert len(items) == len(names) == 16
    assert len({(i.identity_idx, i.emotion_idx, i.intensity_idx)
                for i in items}) == 16
    # caption-db fallback path (no captions JSON) also yields items
    items2 = load_corpus_items(mead_root=root)
    assert len(items2) == 16
    assert all(it.caption for it in items2)


def test_split_items_stable_and_grouped(tmp_path):
    root, cap_path, _ = _mead_corpus(tmp_path)
    items = load_corpus_items(mead_root=root, captions_path=cap_path)
    tr, va = split_items(items, val_fraction=0.25, seed=0)
    assert len(va) == 4 and len(tr) == 12
    tr2, va2 = split_items(items, val_fraction=0.25, seed=0)
    assert [i.name for i in va] == [i.name for i in va2]
    assert not ({i.name for i in tr} & {i.name for i in va})
    # tiny corpora still get both sides
    tr3, va3 = split_items(items[:2], val_fraction=0.1, seed=0)
    assert len(tr3) >= 1 and len(va3) >= 1


def test_featurizer_shapes_and_batching(tmp_path):
    root, cap_path, _ = _mead_corpus(tmp_path)
    items = load_corpus_items(mead_root=root, captions_path=cap_path)
    feat, cfg = _featurizer()
    batches = list(prior_corpus_batches(items, feat, batch_size=6, steps=5))
    assert len(batches) == 5
    for b in batches:
        assert b["voxel"].shape == (6, cfg.hidden_size)
        assert b["style_target"].shape == (6, 16)
        assert np.isfinite(np.asarray(b["voxel"])).all()
    # wrap-around keeps static shapes with batch > corpus
    big = next(iter(prior_corpus_batches(items[:4], feat, 10, 1)))
    assert big["voxel"].shape[0] == 10


@pytest.mark.slow
def test_prior_corpus_overfit_retrieval(tmp_path):
    """The verdict's done-criterion: training the prior on an on-disk MEAD
    caption corpus via the bridge drives fwd/bwd retrieval toward 1.0."""
    from avi_talking_tpu.train.driver import PriorTrainingConfig, train_prior

    root, cap_path, _ = _mead_corpus(tmp_path)
    items = load_corpus_items(mead_root=root, captions_path=cap_path)
    feat, cfg = _featurizer()
    n = len(items)  # 16 distinct (caption, condition) pairs
    tcfg = PriorTrainingConfig(
        clip_size=16, in_dim=cfg.hidden_size, depth=1, heads=2, dim_head=8,
        timesteps=5, brain_hidden=64, total_steps=250, batch_size=n,
        max_lr=4e-3, log_every=1000, val_every=125, val_steps=1,
    )
    res = train_prior(
        tcfg,
        batches=prior_corpus_batches(items, feat, n, tcfg.total_steps),
        val_batches=make_val_batches(items, feat, n, max_batches=1),
    )
    # assert on the eval-mode validation pass (train-batch metrics carry
    # dropout noise): retrieval over the 16-pair corpus reaches ~1.0
    final = res["val_history"][-1]
    assert final["top1_fwd"] >= 0.9, final
    assert final["top1_bwd"] >= 0.9, final
    assert np.isfinite(res["best_val_loss"])
    assert res["val_history"][-1]["loss"] < res["val_history"][0]["loss"]


def test_cli_train_prior_json_dir(capsys):
    """cli train-prior --json-dir exercises the full bridge end to end."""
    from avi_talking_tpu.cli import main

    rc = main([
        "train-prior", "--tiny", "--steps", "6", "--batch-size", "4",
        "--val-every", "3", "--val-steps", "1",
        "--json-dir", JSON_DIR, "--wav-dir", WAV_DIR,
        "--val-fraction", "0.25",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "corpus: 4 caption pairs" in out
    assert "split: 3 train / 1 val" in out
