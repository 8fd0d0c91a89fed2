"""PIRender portrait inference tests (pipeline/portrait.py: the reference's
third_party/pirender/inference_flame.py + coef_control.py equivalents)."""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avi_talking_tpu.models.pirender import FaceGenerator, PIRenderConfig
from avi_talking_tpu.pipeline.portrait import (
    PortraitRenderer,
    build_semantics,
    control_schedule,
    frames_to_u8,
    semantic_windows,
    write_strip_video,
)
from avi_talking_tpu.train.render_loss import obtain_seq_index


def _tiny_cfg(coeff_nc):
    import dataclasses

    return dataclasses.replace(PIRenderConfig.tiny(), coeff_nc=coeff_nc)


def test_build_semantics_layout():
    """[exp | rot3 | jaw3 | cam3], matching train/render_loss's descriptor
    assembly (reference faceformer.py:509-517)."""
    T, n_exp = 4, 5
    exp = jnp.arange(T * n_exp, dtype=jnp.float32).reshape(T, n_exp)
    jaw = jnp.full((T, 3), 7.0)
    rot = jnp.full((T, 3), 3.0)
    cam = jnp.asarray([1.0, 2.0, 3.0])
    d = build_semantics(exp, jaw, rot=rot, cam=cam)
    assert d.shape == (T, n_exp + 9)
    np.testing.assert_array_equal(np.asarray(d[:, :n_exp]), np.asarray(exp))
    np.testing.assert_array_equal(np.asarray(d[:, n_exp : n_exp + 3]), 3.0)
    np.testing.assert_array_equal(np.asarray(d[:, n_exp + 3 : n_exp + 6]), 7.0)
    np.testing.assert_array_equal(
        np.asarray(d[0, n_exp + 6 :]), np.asarray(cam))
    # defaults: rot/cam zero (generated coeffs carry no pose/camera)
    d0 = build_semantics(exp, jaw)
    np.testing.assert_array_equal(np.asarray(d0[:, n_exp : n_exp + 3]), 0.0)
    np.testing.assert_array_equal(np.asarray(d0[:, n_exp + 6 :]), 0.0)


def test_semantic_windows_match_obtain_seq_index():
    """Vectorised windows == the per-frame training gather (edge clamp)."""
    T, C, r = 9, 4, 3
    descr = jnp.asarray(np.random.default_rng(0).standard_normal((T, C)),
                        jnp.float32)
    win = semantic_windows(descr, radius=r)
    assert win.shape == (T, 2 * r + 1, C)
    for t in [0, 1, T // 2, T - 1]:
        idx = obtain_seq_index(jnp.asarray(t), T, radius=r)
        np.testing.assert_array_equal(
            np.asarray(win[t]), np.asarray(jnp.take(descr, idx, axis=0)))


def test_portrait_renderer_chunked_matches_per_frame():
    """Chunked whole-sequence rendering == the reference's one-frame-at-a-
    time net_G loop (inference_flame.py:104-117), incl. the padded tail."""
    H = W = 32
    T, n_exp = 5, 3
    cfg = _tiny_cfg(n_exp + 9)
    gen = FaceGenerator(cfg)
    src = jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, (H, W, 3)), jnp.float32)
    descr = jnp.asarray(
        np.random.default_rng(2).standard_normal((T, cfg.coeff_nc)) * 0.1,
        jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)),
                      jnp.zeros((1, 27, cfg.coeff_nc)))

    rend = PortraitRenderer(gen, params, chunk=2)  # T=5 -> pad 1
    out = rend.render(src, descr, return_warp=True)
    assert out["fake"].shape == (T, H, W, 3)
    assert out["warp"].shape == (T, H, W, 3)

    win = semantic_windows(descr)
    for t in [0, 2, T - 1]:
        ref = gen.apply(params, src[None], win[t][None])
        np.testing.assert_allclose(
            out["fake"][t], np.asarray(ref["fake_image"][0]), atol=2e-5)
        np.testing.assert_allclose(
            out["warp"][t], np.asarray(ref["warp_image"][0]), atol=2e-5)


def test_control_schedule_semantics():
    """coef_control.py:40-136 semantics: rotation legs sweep only the rot
    dims between +/- pi/10 (x,y) / pi/8 (z) presets with returns to center;
    expression legs sweep only the exp dims; num frames per leg."""
    n_exp, num = 6, 4
    base = np.zeros(n_exp + 9, np.float32)
    base[n_exp + 6 :] = [1.0, 2.0, 3.0]  # cam
    frames, legs = control_schedule(base, num=num)
    assert frames.shape == (num * len(legs), n_exp + 9)
    # cam/jaw never move
    np.testing.assert_array_equal(frames[:, n_exp + 3 : n_exp + 6], 0.0)
    np.testing.assert_array_equal(
        frames[:, n_exp + 6 :], np.broadcast_to(base[n_exp + 6 :],
                                                (frames.shape[0], 3)))
    # leg 0: rotation_left_x ends at +pi/10 on rot-x, exp untouched
    end0 = frames[num - 1]
    assert end0[n_exp] == pytest.approx(math.pi / 10)
    np.testing.assert_array_equal(end0[:n_exp], 0.0)
    # its return leg ends back at center
    end1 = frames[2 * num - 1]
    np.testing.assert_allclose(end1[n_exp : n_exp + 3], 0.0, atol=1e-7)
    # z-axis magnitude is pi/8 somewhere in the schedule
    assert np.isclose(np.abs(frames[:, n_exp + 2]).max(), math.pi / 8)
    # expression legs reach the +exp_scale preset on the first PC
    assert np.isclose(frames[:, 0].max(), 2.0)
    # every leg starts where the previous ended (continuity)
    for i in range(1, len(legs)):
        a = frames[i * num - 1]
        b = frames[i * num]
        assert np.abs(a - b).max() < 2.0 / (num - 1) + 1e-6


def test_write_strip_video_and_u8(tmp_path):
    fr = np.zeros((3, 8, 8, 3), np.float32)
    fr[:, :, :, 0] = 1.0
    u8 = frames_to_u8(fr)
    assert u8[0].dtype == np.uint8 and u8[0][0, 0, 0] == 255
    path = write_strip_video(str(tmp_path / "v.mp4"), fr, -fr)
    assert os.path.exists(path)  # mp4, or PNG frame dir without ffmpeg
    if os.path.isdir(path):
        from avi_talking_tpu.viz.pngio import read_png

        img = read_png(os.path.join(path, "000000.png"))
        assert img.shape == (8, 16, 3)  # two streams side by side
        assert img[0, 0, 0] == 255 and img[0, 8, 0] == 0


def test_cli_portrait_smoke(tmp_path, capsys):
    """cli portrait --tiny: source PNG + generate-style npz -> strip video."""
    from avi_talking_tpu.cli import main
    from avi_talking_tpu.viz.pngio import write_png

    rng = np.random.default_rng(3)
    src = (rng.uniform(0, 255, (16, 16, 3))).astype(np.uint8)
    write_png(str(tmp_path / "src.png"), src)
    np.savez(tmp_path / "c_coeffs.npz",
             exp=rng.standard_normal((6, 4)).astype(np.float32),
             jaw=rng.standard_normal((6, 3)).astype(np.float32) * 0.1)
    rc = main([
        "portrait", "--tiny", "--source", str(tmp_path / "src.png"),
        "--coeffs", str(tmp_path / "c_coeffs.npz"),
        "--out", str(tmp_path / "out"), "--image-size", "16",
        "--chunk", "4", "--save-warp",
    ])
    assert rc == 0
    assert "portrait: 6 frames" in capsys.readouterr().out
    produced = os.listdir(tmp_path / "out")
    assert any(p.startswith("c_coeffs_portrait") for p in produced)
