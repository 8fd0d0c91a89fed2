"""Data layer tests on synthetic on-disk fixtures mirroring the reference
layouts (EMOCA-preprocessed MEAD dirs; VOCASET wav+npy+templates)."""

import json
import os
import pickle
import wave

import numpy as np
import pytest

from avi_talking_tpu.data import (
    CaptionDataset,
    CoeffStats,
    MeadEmocaDataset,
    MeadFilenameParser,
    VocasetDataset,
    batch_iterator,
    pad_to_bucket,
)


def _write_wav(path, seconds=1.0, sr=16000):
    t = np.linspace(0, seconds, int(sr * seconds), endpoint=False)
    wavdata = (np.sin(2 * np.pi * 220 * t) * 0.3 * 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(wavdata.tobytes())


@pytest.fixture(scope="module")
def mead_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mead")
    rng = np.random.default_rng(0)
    for name in ["M003_front_neutral_level1_001", "M003_front_happy_level3_002"]:
        frames = root / name / "EMOCA_v2_lr_mse_20"
        for i in range(30):
            fd = frames / f"{i:06d}_000"
            fd.mkdir(parents=True)
            np.save(fd / "exp.npy", rng.standard_normal(50).astype(np.float32))
            np.save(fd / "pose.npy", rng.standard_normal(6).astype(np.float32) * 0.1)
            np.save(fd / "shape.npy", rng.standard_normal(100).astype(np.float32))
            np.save(fd / "cam.npy", rng.standard_normal(3).astype(np.float32))
        _write_wav(root / name / f"{name}.wav", seconds=30 / 25)
        # detection crops aligned with frames (emoca_utils.get_detect_paths
        # layout: EMOCA_v2_lr_mse_20/processed_*/detections/*_000.png)
        from avi_talking_tpu.viz.pngio import write_png

        det = frames / "processed_2025" / "detections"
        det.mkdir(parents=True)
        for i in range(30):
            img = np.full((8, 8, 3), i * 8, np.uint8)  # frame index encoded
            write_png(str(det / f"{i:06d}_000.png"), img)
    return str(root)


def test_mead_dataset(mead_root):
    ds = MeadEmocaDataset(root=mead_root, seq_length=25)
    assert len(ds) == 2
    item = ds[0]
    assert item["coeff"].shape == (25, 59)
    assert item["audio"].shape == (25 * 640,)
    assert abs(float(item["audio"].mean())) < 1e-3
    assert item["identity_idx"] == 0
    assert "neutral_clip" in item
    # cache file created and reused
    assert os.path.exists(os.path.join(mead_root, "index_cache.json"))
    ds2 = MeadEmocaDataset(root=mead_root)
    assert len(ds2) == 2


def test_mead_stats_regeneration(mead_root):
    ds = MeadEmocaDataset(root=mead_root)
    stats = ds.compute_stats()
    assert stats.mean.shape == (59,)
    assert (stats.std > 0).all()
    x = np.random.default_rng(1).standard_normal((5, 59)).astype(np.float32)
    np.testing.assert_allclose(
        stats.denormalize(stats.normalize(x)), x, rtol=1e-4, atol=1e-4
    )


def test_filename_parser():
    p = MeadFilenameParser()
    assert p.parse("M012_front_neutral_level1_017") == (5, 0, 0)
    assert p.parse("W029_front_angry_level3_001.wav") == (31, 6, 2)


@pytest.fixture(scope="module")
def vocaset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("vocaset")
    (root / "wav").mkdir()
    (root / "vertices_npy").mkdir()
    rng = np.random.default_rng(1)
    templates = {}
    for subj in ["FaceTalk_A", "FaceTalk_B"]:
        templates[subj] = rng.standard_normal((10, 3)).astype(np.float32)
        for sent in [1, 25]:
            name = f"{subj}_sentence{sent:02d}"
            _write_wav(root / "wav" / f"{name}.wav", seconds=0.5)
            np.save(
                root / "vertices_npy" / f"{name}.npy",
                rng.standard_normal((24, 30)).astype(np.float32),
            )
    with open(root / "templates.pkl", "wb") as f:
        pickle.dump(templates, f)
    return str(root)


def test_vocaset_splits(vocaset_root):
    train = VocasetDataset(
        vocaset_root, ["FaceTalk_A"], ["FaceTalk_B"], ["FaceTalk_B"], split="train"
    )
    # subject A sentence 1 only (sentence 25 also in range(1,41) -> both)
    assert len(train) == 2
    item = train[0]
    assert item.vertice.shape == (12, 30)  # [::2] subsample
    assert item.template.shape == (30,)
    assert item.one_hot.tolist() == [1.0]
    val = VocasetDataset(
        vocaset_root, ["FaceTalk_A"], ["FaceTalk_B"], ["FaceTalk_B"], split="val"
    )
    assert len(val) == 1  # only sentence 25 in val range(21,41)


def test_caption_dataset(tmp_path):
    jd = tmp_path / "json_dir"
    wd = tmp_path / "wav_dir" / "0000"
    jd.mkdir()
    wd.mkdir(parents=True)
    _write_wav(wd / "clip.wav", 0.2)
    with open(jd / "0000.json", "w") as f:
        json.dump({"mm_paths": "missing/path.wav", "caption": ["a happy face"]}, f)
    ds = CaptionDataset(str(jd), str(tmp_path / "wav_dir"))
    assert len(ds) == 1
    assert ds[0].captions == ("a happy face",)
    assert ds[0].wav_path.endswith("clip.wav")


def test_reference_fixture_captions():
    root = os.path.join(os.path.dirname(__file__), "..", "experiments")
    ds = CaptionDataset(
        os.path.join(root, "json_dir"), os.path.join(root, "wav_dir")
    )
    assert len(ds) == 4
    for item in ds:
        assert len(item.captions) >= 1
        assert os.path.exists(item.wav_path)


def test_batching(mead_root):
    ds = MeadEmocaDataset(root=mead_root)
    batches = list(batch_iterator(ds, batch_size=2, epochs=2, seed=1))
    assert len(batches) == 2
    b = batches[0]
    assert b["coeff"].shape == (2, 25, 59)
    assert pad_to_bucket(b["coeff"][0], [32, 64], axis=0).shape[0] == 32


def test_mead_captions_lookup(mead_root, tmp_path):
    import json as _json

    caps = {
        "M003_front_neutral_level1_001": ["a calm neutral face"],
        "M003_front_happy_level3_002": "a very happy face",
    }
    cp = tmp_path / "caps.json"
    with open(cp, "w") as f:
        _json.dump(caps, f)
    ds = MeadEmocaDataset(root=mead_root, captions_path=str(cp), split="val")
    texts = {ds[i]["name"]: ds[i].get("text") for i in range(len(ds))}
    assert texts["M003_front_neutral_level1_001"] == "a calm neutral face"
    assert texts["M003_front_happy_level3_002"] == "a very happy face"


def test_loopback_frames_matches_reference_formula():
    import torch

    from avi_talking_tpu.data.loop_utils import calc_loop_idx, loopback_frames

    # reference torch formula re-evaluated per index
    def ref_idx(idx, loop_num):
        flag = -1 * ((idx // loop_num % 2) * 2 - 1)
        new_idx = -flag * (flag - 1) // 2 + flag * (idx % loop_num)
        return (new_idx + loop_num) % loop_num

    for loop_num in (1, 3, 5):
        for i in range(17):
            assert int(calc_loop_idx(i, loop_num)) == ref_idx(i, loop_num)

    frames = np.arange(4)[:, None]
    out = loopback_frames(frames, 10)
    assert out[:, 0].tolist() == [0, 1, 2, 3, 3, 2, 1, 0, 0, 1]


def test_mead_to_faceformer_training_integration(mead_root):
    """Data layer -> batch iterator -> jitted stage-1 train step."""
    import jax
    import jax.numpy as jnp
    import optax

    from avi_talking_tpu.models import FaceFormerCoeff, FaceFormerConfig
    from avi_talking_tpu.train.faceformer_trainer import FaceFormerTrainer

    ds = MeadEmocaDataset(root=mead_root, seq_length=8)
    cfg = FaceFormerConfig(
        vertice_dim=59, feature_dim=32, period=5, max_seq_len=64,
        with_condition_merge=False,
        wav2vec2=__import__(
            "avi_talking_tpu.audio", fromlist=["Wav2Vec2Config"]
        ).Wav2Vec2Config.tiny(),
    )
    model = FaceFormerCoeff(cfg)
    it = batch_iterator(ds, batch_size=2, epochs=None, seed=0)

    def to_device(b):
        return {"audio": jnp.asarray(b["audio"]), "coeff": jnp.asarray(b["coeff"])}

    first = to_device(next(it))
    params = model.init(jax.random.PRNGKey(0), first["audio"], first["coeff"])
    tx = optax.adam(1e-3)
    trainer = FaceFormerTrainer(model=model, tx=tx)
    step = trainer.jitted_train_step()
    opt = tx.init(params)
    for i in range(3):
        params, opt, metrics = step(params, opt, to_device(next(it)),
                                    jax.random.PRNGKey(i))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_cli_train_faceformer_vert(vocaset_root, capsys):
    """cli train-faceformer-vert --root trains on a VOCASET tree (subject
    autodetect, windowed batches), incl. the --disentangle shuffle losses."""
    from avi_talking_tpu.cli import main

    rc = main([
        "train-faceformer-vert", "--tiny", "--root", vocaset_root,
        "--steps", "2", "--batch-size", "2", "--frames", "8",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "autodetected subjects ['FaceTalk_A', 'FaceTalk_B']" in out
    assert "'verts'" in out

    rc = main([
        "train-faceformer-vert", "--tiny", "--root", vocaset_root,
        "--steps", "2", "--batch-size", "2", "--frames", "8",
        "--disentangle",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "'verts_eye_area'" in out and "'verts_mouth_area'" in out


def test_vocaset_to_faceformer_vert_training(vocaset_root):
    """VOCASET loader -> vertex-space FaceFormer teacher-forced step (the
    SURVEY M0 slice: wav2vec2 -> AR decoder -> vertex offsets + template)."""
    import jax
    import jax.numpy as jnp
    import optax

    from avi_talking_tpu.audio import Wav2Vec2Config
    from avi_talking_tpu.models.faceformer_vert import (
        FaceFormerVert,
        FaceFormerVertConfig,
    )

    ds = VocasetDataset(
        vocaset_root, ["FaceTalk_A"], ["FaceTalk_B"], ["FaceTalk_B"],
        split="train",
    )
    item = ds[0]
    T = item.vertice.shape[0]
    cfg = FaceFormerVertConfig(
        vertice_dim=item.vertice.shape[1], feature_dim=32, period=5,
        num_train_subjects=len(ds.train_subjects), wav2vec2=Wav2Vec2Config.tiny(),
    )
    model = FaceFormerVert(cfg, template=jnp.asarray(item.template))
    audio = jnp.asarray(item.audio[: T * 640][None])
    verts = jnp.asarray(item.vertice[None])
    emo = jnp.zeros((1, T, cfg.emo_dim))
    one_hot = jnp.asarray(item.one_hot[None])
    params = model.init(jax.random.PRNGKey(0), audio, verts, emo, one_hot)

    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def lf(p):
            pred = model.apply(p, audio, verts, emo, one_hot)
            return jnp.mean((pred - verts) ** 2)

        loss, g = jax.value_and_grad(lf)(params)
        upd, opt2 = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt2, loss

    losses = []
    for _ in range(10):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0]  # fits a single clip
    # AR prediction runs on the trained weights
    out = model.apply(params, audio, T, emo, one_hot,
                      method=FaceFormerVert.predict)
    assert out.shape == (1, T, cfg.vertice_dim)


def test_mead_dataset_loads_images(mead_root):
    """img/ref_img tensors per item (data_loader.py:255-348): [-1,1] float,
    windowed like the coeffs, ref from the identity's neutral clip."""
    ds = MeadEmocaDataset(root=mead_root, seq_length=10, split="val",
                          load_images=True)
    # item 1 is the happy clip -> ref must come from the neutral clip
    names = [c["name"] for c in ds.index]
    happy = names.index("M003_front_happy_level3_002")
    item = ds[happy]
    assert item["img"].shape == (10, 8, 8, 3)
    assert item["ref_img"].shape == (10, 8, 8, 3)
    assert item["img"].dtype == np.float32
    assert item["img"].min() >= -1.0 and item["img"].max() <= 1.0
    # split=val -> window starts at frame 0; pixel value encodes frame index
    def frame_of(x):  # inverse of (i*8)/255*2-1
        return np.round((x + 1.0) / 2.0 * 255.0 / 8.0).astype(int)

    got = frame_of(item["img"][:, 0, 0, 0])
    np.testing.assert_array_equal(got, np.arange(10))
    # ref_img is the leading window of the (same-pixel) neutral clip
    np.testing.assert_array_equal(frame_of(item["ref_img"][:, 0, 0, 0]),
                                  np.arange(10))
    # train split: window offset must match between coeff and img
    ds_tr = MeadEmocaDataset(root=mead_root, seq_length=10, split="train",
                             load_images=True, seed=3)
    it = ds_tr[happy]
    offs = frame_of(it["img"][:, 0, 0, 0])
    assert (np.diff(offs) == 1).all()


@pytest.mark.slow
def test_stage1_render_loss_consumes_decoded_images(mead_root):
    """Stage-1 training wiring on REAL decoded PNGs: dataset -> batch ->
    PIRenderRenderLoss gradient step (verdict item 4)."""
    import jax
    import jax.numpy as jnp

    from avi_talking_tpu.models.pirender import FaceGenerator, PIRenderConfig
    from avi_talking_tpu.train.perceptual import PerceptualLoss, Vgg19Features
    from avi_talking_tpu.train.render_loss import PIRenderRenderLoss

    ds = MeadEmocaDataset(root=mead_root, seq_length=8, split="val",
                          load_images=True)
    items = [ds[i] for i in range(2)]
    batch = {
        k: jnp.asarray(np.stack([it[k] for it in items]))
        for k in ("pose", "cam", "img", "ref_img")
    }
    cfg = PIRenderConfig.tiny()
    gen = FaceGenerator(cfg)
    rng = np.random.default_rng(0)
    B, T = 2, 8
    gparams = gen.init(jax.random.PRNGKey(0), batch["ref_img"][:, 0],
                       jnp.zeros((B, 27, cfg.coeff_nc)))
    vgg = Vgg19Features(taps=("relu_1_1",))
    vparams = vgg.init(jax.random.PRNGKey(1), batch["img"][:, 0])["params"]
    pred = jnp.asarray(rng.standard_normal((B, T, 3)).astype(np.float32))
    loss_fn = PIRenderRenderLoss(
        generator=gen, generator_params=gparams,
        perceptual_warp=PerceptualLoss(vgg, layers=("relu_1_1",), num_scales=1),
        perceptual_final=PerceptualLoss(vgg, layers=("relu_1_1",), num_scales=1),
        vgg_params=vparams,
        coeff_mean=jnp.zeros(3), coeff_std=jnp.ones(3), n_samples=1,
    )
    loss, grad = jax.value_and_grad(
        lambda p: loss_fn(p, batch, jax.random.PRNGKey(2))
    )(pred)
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert np.abs(np.asarray(grad)).sum() > 0


def test_mead_identity_split():
    """Gender-stratified 32-identity train split (TalkingHeadWrapper.py:168-235)."""
    from avi_talking_tpu.data.splits import (
        MEAD_IDENTITIES,
        identity_of,
        mead_identity_split,
    )

    s = mead_identity_split()
    assert len(s["train"]) == 32  # 18 M + 14 W, the reference's train set
    assert sum(i.startswith("M") for i in s["train"]) == 18
    assert not (set(s["train"]) & set(s["val"])) and not (
        set(s["train"]) & set(s["test"])
    )
    assert sorted(s["train"] + s["val"] + s["test"]) == sorted(MEAD_IDENTITIES)
    # deterministic across calls; seeded variant reshuffles but keeps sizes
    assert mead_identity_split() == mead_identity_split()
    s2 = mead_identity_split(seed=1)
    assert len(s2["train"]) == 32 and s2["train"] != s["train"]
    assert mead_identity_split(seed=1) == mead_identity_split(seed=1)
    assert identity_of("sub/M003_front_neutral_level1_001") == "M003"


def test_mead_dataset_subject_split(mead_root):
    ds_all = MeadEmocaDataset(root=mead_root)
    # M003 is in the canonical training identities
    ds_train = MeadEmocaDataset(root=mead_root, subject_split="train")
    assert len(ds_train) == len(ds_all) == 2
    ds_test = MeadEmocaDataset(root=mead_root, subject_split="test")
    assert len(ds_test) == 0
    # split-aware stats come from the filtered index
    st = ds_train.compute_stats(max_clips=2)
    assert st.mean.shape == (59,)


def test_talkclip_caption_generator():
    """Offline TalkClip replacement (data_loader.py:21,144-145,273-275):
    deterministic per clip, fixture-style surface form, diversity via seed."""
    from avi_talking_tpu.data.caption_gen import TalkClipGenerator

    gen = TalkClipGenerator(seed=0)
    c1 = gen.query("M003_front_happy_level2_001")
    assert c1 == gen.query("M003_front_happy_level2_001")  # deterministic
    assert c1.startswith("A ") and "person speaks with" in c1
    assert c1.endswith(".")
    # intensity changes the adverbs; emotion changes the AU set
    c3 = gen.query("M003_front_happy_level3_001")
    assert c3 != c1
    sad = gen.query("M003_front_sad_level2_001")
    assert sad != c1
    neutral = gen.query("M003_front_neutral_level1_001")
    assert "relaxed" in neutral
    # seed diversity for augmentation
    assert TalkClipGenerator(seed=1).query("M003_front_happy_level2_001") != c1
    caps = gen.build_captions(["M003_front_happy_level2_001"], per_clip=3)
    assert len(set(caps["M003_front_happy_level2_001"])) >= 2


def test_talkclip_captions_feed_dataset(mead_root, tmp_path):
    """Generated captions flow through MeadEmocaDataset(captions_path=...)."""
    import json as _json

    from avi_talking_tpu.data.caption_gen import TalkClipGenerator

    ds0 = MeadEmocaDataset(root=mead_root)
    names = [c["name"] for c in ds0.index]
    caps = TalkClipGenerator(seed=0).build_captions(names, per_clip=2)
    p = tmp_path / "caps.json"
    p.write_text(_json.dumps(caps))
    ds = MeadEmocaDataset(root=mead_root, captions_path=str(p), split="val")
    item = ds[0]
    assert "text" in item and item["text"].startswith("A ")


def test_style_b_to_a_caption_translation():
    """Offline Style-B -> Style-A translator (scripts/style_celebv2meadtext.py
    equivalent): emotion/AU/intensity parsing + Style-A frame realisation."""
    from avi_talking_tpu.data.caption_translate import (
        build_translation_prompt,
        parse_style_b,
        translate_corpus,
        translate_style_b_to_a,
    )

    b1 = ("The anger is inferred from the lowered brow, raised cheek, "
          "wrinkled nose, and separated lips of this person's face.")
    p1 = parse_style_b(b1)
    assert p1.emotion == "angry"
    assert set(p1.aus) >= {4, 6, 9, 25}

    b2 = ("This happy face is shown by the raising of the cheek, the pulling "
          "of the lip corner, and the separation of the lips.")
    p2 = parse_style_b(b2)
    assert p2.emotion == "happy" and 12 in p2.aus and 25 in p2.aus

    b3 = ("The relaxed position of the slightly open eyes and mouth suggests "
          "a calm and neutral expression.")
    assert parse_style_b(b3).emotion == "neutral"

    b4 = ("The person's facial actions, consisting of raising their inner "
          "eyebrow, separating their lips, and dropping their jaw, suggest "
          "a feeling of extreme sadness.")
    p4 = parse_style_b(b4)
    assert p4.emotion == "sad" and p4.level == 3
    assert set(p4.aus) >= {1, 25, 26}

    # realisation: Style-A frames, deterministic per (sentence, seed)
    out = translate_style_b_to_a(b1, seed=0)
    assert out == translate_style_b_to_a(b1, seed=0)
    assert out.startswith("A ") and out.endswith(".")
    assert "speaks with" in out and ("angry" in out or "rage" in out
                                     or "fury" in out or "resent" in out
                                     or "frustrated" in out)
    neutral_out = translate_style_b_to_a(b3, seed=0)
    assert "speaks with" not in neutral_out  # neutral uses the short frames

    outs = translate_corpus([b1, b2, b4], seed=0)
    assert len(outs) == 3 and len(set(outs)) == 3

    prompt = build_translation_prompt([b1, b2])
    assert "Style A:" in prompt and "Style B sentences:" in prompt
    assert b1 in prompt and "following structures" in prompt


def test_prefetch_to_device():
    """Double-buffered H2D prefetch: order preserved, arrays on device,
    non-arrays passed through, iterator errors surfaced, sharding honored."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from avi_talking_tpu.data.batching import prefetch_to_device
    from avi_talking_tpu.parallel import make_mesh

    batches = [{"x": np.full((4, 3), i, np.float32), "name": f"b{i}"}
               for i in range(5)]
    out = list(prefetch_to_device(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert float(b["x"][0, 0]) == i  # order preserved
        assert isinstance(b["x"], jax.Array)
        assert b["name"] == f"b{i}"

    if len(jax.devices()) >= 8:
        mesh = make_mesh(dp=8, tp=1)
        sh = NamedSharding(mesh, P("dp"))
        got = next(prefetch_to_device(
            iter([{"x": np.zeros((8, 2), np.float32)}]), sharding=sh))
        assert got["x"].sharding == sh

    def bad_iter():
        yield {"x": np.zeros(2, np.float32)}
        raise RuntimeError("decode failed")

    it = prefetch_to_device(bad_iter(), size=1)
    next(it)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="decode failed"):
        next(it)


def test_screened_mead_audio(mead_root, tmp_path):
    """ScreenedMeadAudio (train_diffusion_prior.py:40-75): caption + good-
    audio allowlist screening over MEAD roots, sorted wav list."""
    from avi_talking_tpu.data.mead import ScreenedMeadAudio

    # no allowlist: every scanned clip with a wav + caption survives
    s_all = ScreenedMeadAudio(roots=[mead_root])
    assert len(s_all) == 2
    assert s_all.wav_paths == sorted(s_all.wav_paths)
    assert all(c.startswith("A ") for c in s_all.captions)

    # allowlist restricts to listed wavs only
    allow = tmp_path / "meta_audio.txt"
    allow.write_text(s_all.wav_paths[0] + "\n")
    s = ScreenedMeadAudio(roots=[mead_root], allowlist_path=str(allow))
    assert s.wav_paths == [s_all.wav_paths[0]]
    assert len(s.names) == len(s.captions) == 1
