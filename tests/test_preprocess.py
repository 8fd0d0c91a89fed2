"""Raw-video -> EMOCA-folder preprocessing (data.preprocess +
cli preprocess-mead): fixture PNG frames in, MEAD layout out, loadable by
MeadEmocaDataset (reference Preprocessors.py:330-489 semantics)."""

import os
import wave

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from avi_talking_tpu.data.preprocess import EmocaPreprocessor
from avi_talking_tpu.models.emoca import EmocaEncoder


def _write_wav(path, n=16000):
    rng = np.random.default_rng(0)
    pcm = (rng.uniform(-0.2, 0.2, n) * 32767).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())


def test_pseudo_gt_shape_average_and_zero_pose():
    enc = EmocaEncoder(n_exp=6)
    variables = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    pre = EmocaPreprocessor(encoder=enc, variables=variables, max_b=3)
    rng = np.random.default_rng(1)
    frames = rng.uniform(0, 1, (5, 16, 16, 3)).astype(np.float32)
    validity = np.asarray([1.0, 0.0, 1.0, 1.0, 0.0], np.float32)
    raw = pre.encode_frames(frames)
    codes = pre.pseudo_gt(frames, validity)
    # global rotation zeroed, jaw kept
    assert np.allclose(codes["pose"][:, :3], 0.0)
    assert np.allclose(codes["pose"][:, 3:], raw["pose"][:, 3:])
    # validity-weighted average shape, constant over frames
    w = validity / validity.sum()
    want = (w[:, None] * raw["shape"]).sum(0)
    assert np.allclose(codes["shape"], want[None], atol=1e-5)
    # chunked encode (max_b=3 with a padded tail) == one-shot encode
    one = np.asarray(enc.apply(variables, jnp.asarray(frames), train=False)["exp"])
    assert np.allclose(raw["exp"], one, atol=1e-5)
    # pseudo_gt with precomputed codes skips re-encoding and does NOT
    # mutate the caller's arrays (the raw pose feeds landmark export)
    raw2 = {k: v.copy() for k, v in raw.items()}
    codes2 = pre.pseudo_gt(frames, validity, codes=raw2)
    assert np.allclose(codes2["exp"], codes["exp"])
    assert np.allclose(raw2["pose"], raw["pose"])  # unzeroed


def test_yuv420_roundtrip_and_device_unpack():
    """rgb -> yuv420 -> rgb stays close (lossy only in 2x2 chroma), and the
    device-side unpack matches the host oracle."""
    from avi_talking_tpu.data.yuv import (
        rgb_to_yuv420,
        yuv420_packed_size,
        yuv420_to_rgb,
        yuv420_to_rgb_host,
    )

    rng = np.random.default_rng(0)
    # constant-chroma image (luma gradient x one tint): 4:2:0 is near-
    # lossless here, so this pins the matrix math itself
    luma = np.linspace(0.1, 0.9, 32 * 32, dtype=np.float32).reshape(32, 32)
    tint = np.asarray([1.0, 0.8, 0.6], np.float32)
    img = np.stack([luma * t for t in tint], axis=-1)[None] * 255.0
    img = np.repeat(img, 2, axis=0)
    u8 = np.clip(np.rint(img), 0, 255).astype(np.uint8)
    packed = rgb_to_yuv420(u8)
    assert packed.shape == (2, yuv420_packed_size(32, 32))
    assert packed.dtype == np.uint8
    host = yuv420_to_rgb_host(packed, 32, 32)
    err = np.abs(host * 255.0 - u8.astype(np.float32))
    assert err.mean() < 1.5  # quantisation only (chroma nearly constant)
    # worst case: random chroma at pixel rate still stays bounded
    noisy = rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8)
    nerr = np.abs(
        yuv420_to_rgb_host(rgb_to_yuv420(noisy), 32, 32) * 255.0
        - noisy.astype(np.float32))
    assert nerr.mean() < 60.0  # ~chroma variance; luma is preserved
    # ... and luma IS preserved: the Y projection of the roundtrip matches
    y_w = np.asarray([0.299, 0.587, 0.114], np.float32)
    y_err = np.abs((yuv420_to_rgb_host(rgb_to_yuv420(noisy), 32, 32) * 255.0
                    - noisy.astype(np.float32)) @ y_w)
    assert y_err.mean() < 2.0
    dev = np.asarray(jax.jit(
        lambda p: yuv420_to_rgb(p, 32, 32))(jnp.asarray(packed)))
    # device and host unpacks are the SAME math (nearest chroma repeat):
    # the frame-free and frames ingestion paths must agree exactly
    assert np.abs(dev - host).max() < 1e-5
    assert np.abs(dev * 255.0 - u8.astype(np.float32)).mean() < 3.0
    # odd sizes are rejected loudly
    with pytest.raises(ValueError):
        rgb_to_yuv420(u8[:, :31])
    with pytest.raises(ValueError):
        rgb_to_yuv420(img[:1])  # float input


def test_encode_transports_agree():
    """uint8 and yuv420 wire transports produce codes matching the float
    path (u8 exactly — same values reach the encoder; yuv420 within the
    chroma-subsample tolerance)."""
    enc = EmocaEncoder(n_exp=6)
    variables = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    rng = np.random.default_rng(2)
    u8 = rng.integers(0, 256, (5, 16, 16, 3), dtype=np.uint8)
    frames_f = u8.astype(np.float32) / 255.0

    def codes(transport, frames):
        pre = EmocaPreprocessor(encoder=enc, variables=variables, max_b=3,
                                transport=transport)
        return pre.encode_frames(frames)

    ref = codes("float", frames_f)
    got_u8 = codes("auto", u8)  # auto: uint8 in -> u8 wire
    for k in ref:
        np.testing.assert_allclose(got_u8[k], ref[k], atol=2e-5)
    # float input + explicit u8 transport quantises to the same bytes
    got_q = codes("u8", frames_f)
    for k in ref:
        np.testing.assert_allclose(got_q[k], ref[k], atol=2e-5)
    got_yuv = codes("yuv420", u8)
    for k in ref:
        # lossy transport: codes close, not equal
        assert np.abs(got_yuv[k] - ref[k]).max() < 0.35, k
    # the packed-fetch path preserves key layout
    assert sorted(ref) == sorted(got_u8) == sorted(got_yuv)


def test_landmark_export_uses_unzeroed_rotation(tmp_path):
    """landmarks.npy must align with the (rotated) crops: the export
    projects with the encoder's raw global rotation, not the frontalized
    pseudo-GT pose."""
    from avi_talking_tpu.core import FlameModel, synthetic_assets
    from avi_talking_tpu.data.preprocess import landmarks_from_codes

    assets = synthetic_assets(n_shape=8, n_exp=6, n_static_landmarks=51)
    flame = FlameModel(assets, n_shape=8, n_exp=6)
    rng = np.random.default_rng(4)
    T = 3
    codes = {
        "shape": rng.standard_normal((T, 8)).astype(np.float32) * 0.1,
        "exp": rng.standard_normal((T, 6)).astype(np.float32) * 0.1,
        "pose": np.concatenate(
            [np.full((T, 3), 0.4, np.float32),  # strong global rotation
             rng.standard_normal((T, 3)).astype(np.float32) * 0.05], -1),
        "cam": np.tile(np.asarray([[9.0, 0.0, 0.0]], np.float32), (T, 1)),
    }
    zeroed = {**codes, "pose": codes["pose"].copy()}
    zeroed["pose"][:, :3] = 0.0
    lmk_raw = landmarks_from_codes(flame, codes, chunk=2)
    lmk_zero = landmarks_from_codes(flame, zeroed, chunk=2)
    assert lmk_raw.shape == lmk_zero.shape
    # the rotation must change the projection (the old bug exported the
    # frontalized variant regardless of the head pose)
    assert np.abs(lmk_raw - lmk_zero).max() > 1e-3


def test_mead_stats_available_after_construction(tmp_path):
    """ds.stats is usable right after construction (identity, sized from
    the data) — callers normalize/save without iterating first."""
    import jax
    import jax.numpy as jnp

    from avi_talking_tpu.data.mead import MeadEmocaDataset
    from avi_talking_tpu.data.preprocess import (
        EmocaPreprocessor, preprocess_clip_folder)
    from avi_talking_tpu.models.emoca import EmocaEncoder
    from avi_talking_tpu.viz.pngio import write_png

    rng = np.random.default_rng(7)
    src = tmp_path / "clipQ"
    src.mkdir()
    for t in range(3):
        write_png(str(src / f"{t:03d}.png"),
                  (rng.uniform(0, 1, (32, 32, 3)) * 255).astype(np.uint8))
    enc = EmocaEncoder(n_exp=6)
    pre = EmocaPreprocessor(
        encoder=enc,
        variables=enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))),
        max_b=4)
    preprocess_clip_folder(pre, str(src), str(tmp_path / "out"))
    ds = MeadEmocaDataset(root=str(tmp_path / "out"), load_images=False)
    assert ds.stats is not None
    x = np.zeros((2, ds.stats.mean.shape[-1]), np.float32)
    np.testing.assert_allclose(ds.stats.normalize(x), x)  # identity stats


def test_preprocess_mead_cli_roundtrip(tmp_path):
    from avi_talking_tpu.cli import main
    from avi_talking_tpu.viz.pngio import write_png

    src = tmp_path / "raw" / "M003_front_happy_level2_001"
    src.mkdir(parents=True)
    rng = np.random.default_rng(2)
    for t in range(4):
        write_png(str(src / f"{t:04d}.png"),
                  (rng.uniform(0, 1, (32, 32, 3)) * 255).astype(np.uint8))
    _write_wav(str(src / "M003_front_happy_level2_001.wav"), n=4 * 640)
    np.save(str(src / "validity.npy"), np.ones(4, np.float32))

    out = tmp_path / "emoca"
    rc = main(["preprocess-mead", "--src", str(tmp_path / "raw"),
               "--out", str(out), "--size", "32", "--max-b", "2"])
    assert rc == 0
    clip = out / "M003_front_happy_level2_001"
    fd = clip / "EMOCA_v2_lr_mse_20" / "00000_000"
    for key in ("exp", "pose", "shape", "cam"):
        assert (fd / f"{key}.npy").exists()
    assert np.load(str(fd / "exp.npy")).shape == (50,)
    assert (clip / "M003_front_happy_level2_001.wav").exists()
    assert (clip / "detections" / "00000_000.png").exists()

    # the produced layout loads through the dataset
    from avi_talking_tpu.data import MeadEmocaDataset

    ds = MeadEmocaDataset(root=str(out), seq_length=2)
    assert len(ds) == 1
    item = ds[0]
    assert item["coeff"].shape == (2, 59)
    assert np.isfinite(item["coeff"]).all()
    assert item["audio"].shape[0] == 2 * 640



def test_batch_builder_handles_tiny_code_dims(tmp_path):
    """EmoteBatchBuilder derives the coeff layout from its width (exp dim =
    width - 9), so tiny preprocess output (6-exp codes) yields the right
    jaw slice instead of the 50-exp hardcode (fast sibling of the e2e
    chain test below)."""
    from avi_talking_tpu.data import MeadEmocaDataset
    from avi_talking_tpu.data.train_batches import EmoteBatchBuilder

    name = "M003_front_happy_level2_001"
    clip = tmp_path / name
    fdir = clip / "EMOCA_v2_lr_mse_20"
    rng = np.random.default_rng(3)
    T = 4
    for t in range(T):
        d = fdir / f"{t:05d}_000"
        d.mkdir(parents=True)
        np.save(str(d / "exp.npy"), rng.standard_normal(6).astype(np.float32))
        np.save(str(d / "pose.npy"),
                rng.standard_normal(6).astype(np.float32))
        np.save(str(d / "shape.npy"),
                rng.standard_normal(8).astype(np.float32))
        np.save(str(d / "cam.npy"), rng.standard_normal(3).astype(np.float32))
    _write_wav(str(clip / f"{name}.wav"), n=T * 640)

    ds = MeadEmocaDataset(root=str(tmp_path), seq_length=T, split="val",
                          smooth_pose=False)
    builder = EmoteBatchBuilder(ds, frames=T, n_exp=6, n_shape=8)
    assert len(builder) == 1
    item = builder[0]
    # jaw = pose[:, 3:6] of the written codes, exp = the 6-d exp codes
    codes = np.stack([
        np.load(str(fdir / f"{t:05d}_000" / "pose.npy")) for t in range(T)])
    exps = np.stack([
        np.load(str(fdir / f"{t:05d}_000" / "exp.npy")) for t in range(T)])
    np.testing.assert_allclose(item["gt_jaw"], codes[:, 3:6], atol=1e-5)
    np.testing.assert_allclose(item["gt_exp"], exps, atol=1e-5)


@pytest.mark.slow
def test_preprocess_feeds_train_emote_end_to_end(tmp_path):
    """The full in-framework data story: raw MEAD-named frame folders + wavs
    -> `preprocess-mead` pseudo-GT layout -> `train-emote --root` runs its
    staged loop on the produced clips (reference: MEADDataModule offline
    pass feeding inferno's TalkingHead training app)."""
    from avi_talking_tpu.cli import main
    from avi_talking_tpu.viz.pngio import write_png

    rng = np.random.default_rng(7)
    frames = 8  # multiple of the tiny FLINT latent_frame_size (4)
    for name in ("M003_front_happy_level2_001",
                 "M005_front_angry_level3_001"):
        src = tmp_path / "raw" / name
        src.mkdir(parents=True)
        for t in range(frames):
            write_png(str(src / f"{t:04d}.png"),
                      (rng.uniform(0, 1, (16, 16, 3)) * 255).astype(np.uint8))
        _write_wav(str(src / f"{name}.wav"), n=frames * 640)

    out = tmp_path / "emoca"
    rc = main(["preprocess-mead", "--src", str(tmp_path / "raw"),
               "--out", str(out), "--size", "16", "--max-b", "4", "--tiny"])
    assert rc == 0

    rc = main(["train-emote", "--tiny", "--root", str(out),
               "--steps", "1", "--batch-size", "2", "--frames", str(frames),
               "--val-fraction", "0.5", "--val-every", "1"])
    assert rc == 0


def test_preprocess_landmark_export_feeds_train_emoca(tmp_path):
    """--tiny preprocess exports FLAME-projected pseudo landmarks -> the
    clip dir feeds train-emoca --root directly (no external detector)."""
    from avi_talking_tpu.cli import main
    from avi_talking_tpu.viz.pngio import write_png

    src = tmp_path / "raw" / "clipA"
    src.mkdir(parents=True)
    rng = np.random.default_rng(5)
    for t in range(3):
        write_png(str(src / f"{t:04d}.png"),
                  (rng.uniform(0, 1, (32, 32, 3)) * 255).astype(np.uint8))
    out = tmp_path / "emoca"
    rc = main(["preprocess-mead", "--src", str(tmp_path / "raw"),
               "--out", str(out), "--size", "32", "--max-b", "2", "--tiny"])
    assert rc == 0
    clip = out / "clipA"
    lmk = np.load(str(clip / "landmarks.npy"))
    assert lmk.shape == (3, 68, 2) and np.isfinite(lmk).all()
    rc = main(["train-emoca", "--tiny", "--size", "32", "--batch-size", "2",
               "--steps", "1", "--log-every", "0", "--root", str(clip)])
    assert rc == 0
