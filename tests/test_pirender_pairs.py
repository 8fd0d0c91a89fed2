"""PIRender video-pair data layer (data.pirender_pairs + cli train-pirender)
vs the reference VoxDataset/VoxVideoDataset sampling semantics."""

import numpy as np
import pytest

from avi_talking_tpu.data.pirender_pairs import (
    VideoPairDataset,
    obtain_seq_index,
)
from avi_talking_tpu.data.preprocess import write_emoca_folders


def _make_root(tmp_path, names=("M003_front_happy_level2_001",
                                "M009_front_angry_level3_002")):
    rng = np.random.default_rng(0)
    for name in names:
        T = 6
        codes = {
            "exp": rng.standard_normal((T, 50)).astype(np.float32),
            "pose": rng.standard_normal((T, 6)).astype(np.float32),
            "shape": rng.standard_normal((T, 100)).astype(np.float32),
            "cam": rng.standard_normal((T, 3)).astype(np.float32),
        }
        dets = rng.uniform(0, 1, (T, 16, 16, 3)).astype(np.float32)
        write_emoca_folders(str(tmp_path / name), codes, detections=dets)
    return str(tmp_path)


def test_obtain_seq_index_clamps():
    idx = obtain_seq_index(0, 20, 13)
    assert idx[0] == 0 and idx[-1] == 13 and len(idx) == 27
    idx = obtain_seq_index(19, 20, 13)
    assert idx[0] == 6 and idx[-1] == 19


def test_video_pair_sampling(tmp_path):
    root = _make_root(tmp_path)
    ds = VideoPairDataset(root=root, radius=13, seed=0)
    assert len(ds) == 2 and len(ds.person_ids) == 2
    s = ds.sample()
    assert s["input_image"].shape == (16, 16, 3)
    assert s["target_image"].shape == (16, 16, 3)
    assert s["coeff_window"].shape == (27, 59)
    assert np.isfinite(s["coeff_window"]).all()
    # descriptor layout: [exp50 | rot3 | jaw3 | cam3] from the raw codes
    sem = ds._semantics(0)
    codes_exp = np.load(str(tmp_path / ds.clips[0]["name"] /
                            "EMOCA_v2_lr_mse_20" / "00000_000" / "exp.npy"))
    assert np.allclose(sem[0, :50], codes_exp)
    b = next(ds.batches(3))
    assert b["input_image"].shape == (3, 16, 16, 3)
    assert b["coeff_window"].shape == (3, 27, 59)


def test_cross_id_uses_other_identity(tmp_path):
    root = _make_root(tmp_path)
    ds = VideoPairDataset(root=root, cross_id=True, seed=1)
    # with 2 identities, the cross source is always frame 0 of the OTHER
    # identity's clip (vox_video_dataset.py:33,62-70); assert the sampled
    # source image matches some clip's frame 0 crop
    s = ds.sample()
    frame0s = [ds._image(k, 0) for k in range(len(ds))]
    src_k = [k for k in range(len(ds))
             if np.allclose(s["input_image"], frame0s[k])]
    assert src_k, "cross source must be some clip's frame 0"
    # source_semantics must describe the SOURCE image (other identity's
    # clip at frame 0), not the target person's clip
    np.testing.assert_allclose(s["source_semantics"],
                               ds._window(src_k[0], 0))


def test_train_pirender_cli_on_fixture(tmp_path):
    from avi_talking_tpu.cli import main

    root = _make_root(tmp_path)
    rc = main(["train-pirender", "--root", root, "--tiny",
               "--image-size", "16", "--batch-size", "2", "--steps", "2",
               "--warp-steps", "1", "--log-every", "1",
               "--ckpt-dir", str(tmp_path / "ck")])
    assert rc == 0
    assert (tmp_path / "ck").is_dir()


@pytest.mark.slow
def test_train_pirender_loss_decreases(tmp_path):
    """Warp-stage loss decreases while overfitting the fixture pairs."""
    import jax
    import jax.numpy as jnp

    from avi_talking_tpu.models.pirender import FaceGenerator, PIRenderConfig
    from avi_talking_tpu.train.perceptual import PerceptualLoss, Vgg19Features
    from avi_talking_tpu.train.pirender_trainer import (
        PIRenderTrainer,
        make_pirender_optimizer,
    )

    root = _make_root(tmp_path)
    ds = VideoPairDataset(root=root, image_size=16, seed=2)
    raw = next(ds.batches(2))
    batch = {
        "input_image": jnp.asarray(raw["input_image"]),
        "target_image": jnp.asarray(raw["target_image"]),
        "coeff_window": jnp.asarray(raw["coeff_window"]),
    }
    import dataclasses as dc

    cfg = dc.replace(PIRenderConfig.tiny(), coeff_nc=59)
    gen = FaceGenerator(cfg)
    params = gen.init(jax.random.PRNGKey(0), batch["input_image"],
                      batch["coeff_window"])
    vgg = Vgg19Features(taps=("relu_1_1",))
    vgg_params = vgg.init(jax.random.PRNGKey(1), batch["input_image"])["params"]
    tx = make_pirender_optimizer(3e-4)
    trainer = PIRenderTrainer(
        generator=gen, tx=tx,
        perceptual_warp=PerceptualLoss(vgg, layers=("relu_1_1",), num_scales=1),
        perceptual_final=PerceptualLoss(vgg, layers=("relu_1_1",),
                                        num_scales=1, use_style_loss=True),
        vgg_params=vgg_params)
    step = trainer.jitted_train_step()
    opt = tx.init(params)
    losses = []
    for i in range(25):
        params, opt, m = step(params, opt, batch, True)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.9, (losses[0], losses[-1])
