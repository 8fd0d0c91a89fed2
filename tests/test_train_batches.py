"""Real-data training batches: EMOTE + stage-1 FaceFormer bridges.

Reference behavior: dataset/data_loader.py:229-374 (TalkDataset batches),
models/faceformer.py:334-373 (in-loop frozen-FanEncoder conditioning: eye
embeds from raw crops, emo embeds from lip-masked shuffled frames, ref
style coeff from one random frame).
"""

import wave

import numpy as np
import pytest

from avi_talking_tpu.data import MeadEmocaDataset
from avi_talking_tpu.data.train_batches import (
    EmoteBatchBuilder,
    FaceFormerBatchBuilder,
    FanConditioner,
    emote_batches,
)


def _write_wav(path, seconds, sr=16000):
    t = np.linspace(0, seconds, int(sr * seconds), endpoint=False)
    data = (np.sin(2 * np.pi * 220 * t) * 0.3 * 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(data.tobytes())


N_FRAMES = 20
IMG = 64


@pytest.fixture(scope="module")
def mead_root(tmp_path_factory):
    """6-clip MEAD tree (2 identities x 3 emotions) with coeffs, wavs and
    detection crops."""
    from avi_talking_tpu.viz.pngio import write_png

    root = tmp_path_factory.mktemp("mead_train")
    rng = np.random.default_rng(0)
    names = [
        f"{ident}_front_{emo}_level{lvl}_001"
        for ident in ("M003", "W009")
        for emo, lvl in (("neutral", 1), ("happy", 2), ("angry", 3))
    ]
    for name in names:
        frames = root / name / "EMOCA_v2_lr_mse_20"
        for i in range(N_FRAMES):
            fd = frames / f"{i:06d}_000"
            fd.mkdir(parents=True)
            np.save(fd / "exp.npy", rng.standard_normal(50).astype(np.float32))
            np.save(fd / "pose.npy",
                    rng.standard_normal(6).astype(np.float32) * 0.1)
            np.save(fd / "shape.npy",
                    rng.standard_normal(100).astype(np.float32))
            np.save(fd / "cam.npy", rng.standard_normal(3).astype(np.float32))
        _write_wav(root / name / f"{name}.wav", seconds=N_FRAMES / 25)
        det = frames / "processed_x" / "detections"
        det.mkdir(parents=True)
        for i in range(N_FRAMES):
            img = np.full((IMG, IMG, 3), i * 8 % 256, np.uint8)
            write_png(str(det / f"{i:06d}_000.png"), img)
    return str(root)


def test_emote_batch_builder(mead_root):
    ds = MeadEmocaDataset(root=mead_root, seq_length=8, split="val")
    b = EmoteBatchBuilder(ds, frames=8, n_exp=6, n_shape=8)
    assert len(b) == 6
    item = b[0]
    assert item["raw_audio"].shape == (8, 640)
    assert item["gt_exp"].shape == (8, 6)
    assert item["gt_jaw"].shape == (8, 3)
    assert item["expression"].shape == (9,) and item["expression"].sum() == 1
    assert item["identity"].shape == (32,) and item["identity"].sum() == 1
    assert item["intensity"].shape == (3,)
    assert item["shape"].shape == (8,)
    assert (item["frame_mask"] == 1).all()  # 20-frame clips fill 8 frames
    # gt_exp is DENORMALISED (raw EMOCA exp, not the z-scored coeff); with
    # split="val" the window is the leading crop, so frame 0 == frame file 0
    raw = np.load(
        f"{mead_root}/{ds.index[b.valid[0]]['name']}/EMOCA_v2_lr_mse_20"
        f"/000000_000/exp.npy"
    )
    assert np.allclose(item["gt_exp"][0], raw[:6], atol=1e-5)

    batch = next(emote_batches(b, 4, epochs=1))
    assert batch["raw_audio"].shape == (4, 8, 640)
    assert batch["gt_exp"].shape == (4, 8, 6)
    assert batch["frame_mask"].shape == (4, 8)


def test_emote_batch_builder_pads_short_windows(mead_root):
    ds = MeadEmocaDataset(root=mead_root, seq_length=32)
    b = EmoteBatchBuilder(ds, frames=32, n_exp=6, n_shape=8)
    item = b[0]  # clips are 20 frames -> 12 padded
    assert item["frame_mask"].sum() == N_FRAMES
    assert (item["gt_exp"][N_FRAMES:] == 0).all()
    assert (item["raw_audio"][N_FRAMES:] == 0).all()


def test_emote_builder_split(mead_root):
    ds = MeadEmocaDataset(root=mead_root, seq_length=8)
    b = EmoteBatchBuilder(ds, frames=8, n_exp=6, n_shape=8)
    tr, va = b.split(0.34)
    assert len(tr) + len(va) == len(b)
    assert len(va) >= 1 and len(tr) >= 1
    assert not (set(tr.valid) & set(va.valid))
    tr2, va2 = b.split(0.34)
    assert va.valid == va2.valid  # deterministic
    assert va.ds.split == "val"  # leading-window, not random crop


def test_masked_geometric_losses():
    """frame_mask excludes padded frames from the geometric means."""
    import jax
    import jax.numpy as jnp
    import optax

    from avi_talking_tpu.models.emote import EmoteConfig, EmoteTalkingHead
    from avi_talking_tpu.train.talking_head import TalkingHeadTrainer

    cfg = EmoteConfig.tiny()
    head = EmoteTalkingHead(cfg)
    T = 8
    rng = np.random.default_rng(0)
    base = {
        "raw_audio": jnp.asarray(
            rng.standard_normal((2, T, 640)).astype(np.float32)),
        "expression": jnp.asarray(np.eye(9, dtype=np.float32)[[1, 2]]),
        "intensity": jnp.asarray(np.eye(3, dtype=np.float32)[[0, 1]]),
        "identity": jnp.asarray(np.eye(32, dtype=np.float32)[[0, 1]]),
        "shape": jnp.zeros((2, cfg.n_shape)),
        "gt_exp": jnp.asarray(
            rng.standard_normal((2, T, cfg.flint.n_exp)).astype(np.float32)),
        "gt_jaw": jnp.asarray(
            rng.standard_normal((2, T, 3)).astype(np.float32)),
    }
    from avi_talking_tpu.models.conditioning import StyleCondition

    cond = StyleCondition(base["expression"], base["intensity"],
                          base["identity"], base["shape"])
    params = head.init(jax.random.PRNGKey(0), base["raw_audio"], cond)
    trainer = TalkingHeadTrainer(head=head, tx=optax.sgd(1e-3))
    key = jax.random.PRNGKey(1)

    full = dict(base, frame_mask=jnp.ones((2, T)))
    _, m_full = trainer.loss_fn(params, full, key)
    _, m_nomask = trainer.loss_fn(params, base, key)
    # all-ones mask == no mask
    assert np.allclose(float(m_full["loss"]), float(m_nomask["loss"]),
                       rtol=1e-5)

    # corrupt the padded tail: masked loss must not change
    mask = jnp.asarray(np.concatenate(
        [np.ones((2, T - 3)), np.zeros((2, 3))], axis=1).astype(np.float32))
    tail_garbage = dict(
        base,
        gt_exp=base["gt_exp"].at[:, -3:].set(100.0),
        gt_jaw=base["gt_jaw"].at[:, -3:].set(100.0),
        frame_mask=mask,
    )
    clean = dict(base, frame_mask=mask)
    _, m_a = trainer.loss_fn(params, tail_garbage, key)
    _, m_b = trainer.loss_fn(params, clean, key)
    assert np.allclose(float(m_a["loss_exp"]), float(m_b["loss_exp"]), rtol=1e-5)
    assert np.allclose(float(m_a["loss_jaw"]), float(m_b["loss_jaw"]), rtol=1e-5)


def test_faceformer_batch_builder(mead_root):
    ds = MeadEmocaDataset(root=mead_root, seq_length=6)
    b = FaceFormerBatchBuilder(ds, frames=6, coeff_dim=9)
    assert len(b) == 6
    item = b[0]
    assert item["audio"].shape == (6 * 640,)
    assert item["coeff"].shape == (6, 9)
    assert item["img"].shape == (6, IMG, IMG, 3)
    assert item["frame_mask"].sum() == 6


def test_fan_conditioner(mead_root):
    import jax
    import jax.numpy as jnp

    from avi_talking_tpu.models import FanEncoder

    fan = FanEncoder()
    fan_vars = fan.init(jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)))
    cond = FanConditioner(fan, fan_vars, seed=0)

    B, T = 2, 6
    rng = np.random.default_rng(0)
    img = rng.standard_normal((B, T, IMG, IMG, 3)).astype(np.float32) * 0.1
    coeff = rng.standard_normal((B, T, 9)).astype(np.float32)
    out = cond.condition(img, coeff)
    assert out["eye_embed"].shape == (B, T, 6)
    assert out["emo_embed"].shape == (B, T, 30)
    assert out["ref_coeff"].shape == (B, 1, 9)
    # ref_coeff is one of the batch's frames (same index for every row)
    rc = np.asarray(out["ref_coeff"])[:, 0]
    hits = [
        t for t in range(T)
        if np.allclose(rc, coeff[:, t], atol=1e-6)
    ]
    assert len(hits) == 1
    # shuffle rule: offset 4..7, wrapped (faceformer.py:346-348)
    idx = FanConditioner(fan, fan_vars, seed=1).shuffle_indices(20)
    d = np.abs(idx - np.arange(20))
    assert ((d >= 4) & (d <= 7)).all()
    assert (idx >= 0).all() and (idx < 20).all()


@pytest.mark.slow
def test_cli_train_emote_real_root(mead_root, capsys, tmp_path):
    """cli train-emote --root trains on disk data with a real val split."""
    from avi_talking_tpu.cli import main

    rc = main([
        "train-emote", "--tiny", "--root", mead_root, "--steps", "2",
        "--batch-size", "2", "--frames", "8", "--val-every", "2",
        "--val-fraction", "0.34", "--run-dir", str(tmp_path / "run"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "4 train / 2 val clips" in out
    assert "done:" in out


@pytest.mark.slow
def test_cli_train_faceformer_real_root_with_conditioning(mead_root, capsys):
    """cli train-faceformer --root runs the FanEncoder conditioning path
    (eye/emo embeds + ref style) instead of silently dropping it."""
    from avi_talking_tpu.cli import main

    rc = main([
        "train-faceformer", "--tiny", "--root", mead_root, "--steps", "2",
        "--batch-size", "2", "--seq-length", "6",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "final:" in out


@pytest.mark.slow
def test_cli_train_faceformer_render_loss(mead_root, capsys):
    """cli train-faceformer --render-loss runs the stage-1 PIRender
    upper-face perceptual loss in the jitted step (faceformer.py:488-566)."""
    from avi_talking_tpu.cli import main

    rc = main([
        "train-faceformer", "--tiny", "--root", mead_root, "--steps", "2",
        "--batch-size", "2", "--seq-length", "6", "--render-loss",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "render=" in out or "final:" in out
    # the render term must actually be in the final metrics
    assert "'render'" in out


@pytest.mark.slow
def test_cli_train_faceformer_emo_loss(mead_root, capsys):
    """cli train-faceformer --emo-loss adds the EmoNet feature term on the
    PIRender renders (render weight 0 without --render-loss)."""
    from avi_talking_tpu.cli import main

    rc = main([
        "train-faceformer", "--tiny", "--root", mead_root, "--steps", "1",
        "--batch-size", "2", "--seq-length", "6", "--emo-loss",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "'emo'" in out and "'render'" in out


@pytest.mark.slow
def test_cli_train_faceformer_vert_mead(mead_root, capsys):
    """cli train-faceformer-vert --mead-root: the disentangle variant's
    data source — MEAD coeffs decoded to FLAME verts in-graph, shuffle
    losses + rendered emo-cls CE (faceformer_disentangle.py:648-731)."""
    from avi_talking_tpu.cli import main

    rc = main([
        "train-faceformer-vert", "--tiny", "--mead-root", mead_root,
        "--steps", "1", "--batch-size", "2", "--frames", "8",
        "--disentangle", "--emo-cls",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "'verts_eye_area'" in out and "'emo_cls'" in out


@pytest.mark.slow
def test_cli_emo_cls_pretrain_roundtrip(mead_root, capsys, tmp_path):
    """is_emonet_pretrain stage: train only the cls head on GT renders,
    save, then feed the pretrained head into --emo-cls."""
    from avi_talking_tpu.cli import main

    ckpt = str(tmp_path / "head")
    rc = main([
        "train-faceformer-vert", "--tiny", "--mead-root", mead_root,
        "--steps", "2", "--batch-size", "2", "--frames", "8",
        "--emo-cls-pretrain", "--ckpt-dir", ckpt,
    ])
    assert rc == 0
    assert "'emo_cls'" in capsys.readouterr().out

    rc = main([
        "train-faceformer-vert", "--tiny", "--mead-root", mead_root,
        "--steps", "1", "--batch-size", "2", "--frames", "8",
        "--emo-cls", "--head-checkpoint", ckpt,
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "'verts'" in out and "'emo_cls'" in out


def test_cli_train_flint_real_root(mead_root, capsys):
    """cli train-flint --root trains the motion prior on real MEAD motion
    windows (denormalised exp+jaw) instead of synthetic noise."""
    from avi_talking_tpu.cli import main

    rc = main([
        "train-flint", "--tiny", "--root", mead_root, "--steps", "3",
        "--batch-size", "4", "--frames", "8",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "data root: 6 clips" in out
    assert "final:" in out


@pytest.mark.slow
def test_cli_train_emote_neural_real_root(mead_root, capsys):
    """cli train-emote --root --neural: perceptual stage on real data with
    gt meshes decoded in-loss from the coeffs (no gt_vertices in batch)."""
    from avi_talking_tpu.cli import main

    rc = main([
        "train-emote", "--tiny", "--root", mead_root, "--neural",
        "--steps", "1", "--batch-size", "2", "--frames", "8",
        "--val-every", "0", "--val-fraction", "0.34",
    ])
    assert rc == 0
    assert "done:" in capsys.readouterr().out
