"""Landmark-driven face cropping: bbox2point/warp semantics + full-frame
preprocessing path (ImageDatasetHelpers.py:25-70, FaceVideoDataModule)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avi_talking_tpu.data.facecrop import (
    bbox2point_bbox,
    bbox2point_kpt68,
    detect_and_crop,
    landmarks_to_crop_space,
    warp_crop,
)


def test_bbox2point_kpt68_matches_reference_formula():
    rng = np.random.default_rng(0)
    lmk = rng.uniform(20, 80, (3, 68, 2)).astype(np.float32)
    size, center = bbox2point_kpt68(lmk)
    for t in range(3):
        left, right = lmk[t, :, 0].min(), lmk[t, :, 0].max()
        top, bottom = lmk[t, :, 1].min(), lmk[t, :, 1].max()
        assert np.isclose(size[t], (right - left + bottom - top) / 2 * 1.1)
        assert np.allclose(center[t], [(left + right) / 2, (top + bottom) / 2],
                           atol=1e-5)


def test_bbox2point_bbox_vertical_shift():
    boxes = np.asarray([[10.0, 20.0, 50.0, 80.0]], np.float32)
    size, center = bbox2point_bbox(boxes)
    old = (40 + 60) / 2
    assert np.isclose(size[0], old)
    assert np.allclose(center[0], [30.0, 50.0 + old * 0.12])


def test_warp_crop_identity_and_subregion():
    """Cropping the exact image square reproduces the image; cropping a
    subregion equals direct slicing when the box is pixel-aligned."""
    rng = np.random.default_rng(1)
    S = 16
    img = rng.uniform(0, 1, (1, S, S, 3)).astype(np.float32)
    c = np.asarray([[(S - 1) / 2, (S - 1) / 2]], np.float32)
    out = warp_crop(img, c, np.asarray([S - 1.0], np.float32), S)
    np.testing.assert_allclose(out, img, atol=1e-5)

    # pixel-aligned 8x8 box at origin (4,4): sampling grid hits texels when
    # size == out-1
    out2 = warp_crop(img, np.asarray([[7.5, 7.5]], np.float32),
                     np.asarray([7.0], np.float32), 8)
    np.testing.assert_allclose(out2[0], img[0, 4:12, 4:12], atol=1e-5)


def test_landmarks_roundtrip_into_crop_space():
    """A landmark at the crop center maps to NDC 0; corners map to +-1."""
    center = np.asarray([[50.0, 60.0]], np.float32)
    size = np.asarray([40.0], np.float32)
    lmk = np.asarray([[[50.0, 60.0],      # center
                       [30.0, 40.0],      # top-left of the box
                       [70.0, 80.0]]], np.float32)  # bottom-right
    ndc = landmarks_to_crop_space(lmk, center, size, 32)
    np.testing.assert_allclose(ndc[0, 0], [0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(ndc[0, 1], [-1.0, -1.0], atol=1e-6)
    np.testing.assert_allclose(ndc[0, 2], [1.0, 1.0], atol=1e-6)


class _FakeDetector:
    """Deterministic landmark stub: puts the 'face' box around a known
    square so the crop is verifiable."""

    def __init__(self, box_ndc):
        self.box = box_ndc  # (x0, y0, x1, y1) in [-1, 1]

    def __call__(self, frames):
        T = frames.shape[0]
        x0, y0, x1, y1 = self.box
        lmk = np.zeros((T, 68, 2), np.float32)
        lmk[:, :, 0] = np.linspace(x0, x1, 68)[None]
        lmk[:, :, 1] = np.linspace(y0, y1, 68)[None]
        return lmk, np.full((T, 68), 0.9, np.float32)


def test_detect_and_crop_centers_the_box():
    """The detected box center lands at the crop center, and validity
    comes from the detector scores."""
    rng = np.random.default_rng(2)
    H = W = 64
    frames = rng.uniform(0, 1, (2, H, W, 3)).astype(np.float32)
    det = _FakeDetector((-0.5, -0.5, 0.5, 0.5))  # centered box
    crops, lmk, val = detect_and_crop(det, frames, out_size=32, scale=1.0)
    assert crops.shape == (2, 32, 32, 3)
    assert lmk.shape == (2, 68, 2)
    np.testing.assert_allclose(val, 0.9, atol=1e-6)
    # centered box: landmark mean (the box center) maps near NDC origin
    assert np.abs(lmk[..., 0].mean()) < 0.05 and np.abs(lmk[..., 1].mean()) < 0.05
    # the crop of a centered kpt box at scale 1 is a zoom-in: its content
    # must come from the frame interior, not the borders
    interior = frames[:, H // 4 : 3 * H // 4, W // 4 : 3 * W // 4]
    assert abs(crops.mean() - interior.mean()) < 0.05


def test_smooth_boxes_freezes_center_and_size():
    rng = np.random.default_rng(3)
    frames = rng.uniform(0, 1, (3, 64, 64, 3)).astype(np.float32)

    class _Jitter(_FakeDetector):
        def __call__(self, frames):
            lmk, sc = super().__call__(frames)
            lmk += rng.uniform(-0.05, 0.05, lmk.shape).astype(np.float32)
            return lmk, sc

    det = _Jitter((-0.4, -0.4, 0.4, 0.4))
    crops, lmk, _ = detect_and_crop(det, frames, out_size=16, scale=1.1,
                                    smooth_boxes=True)
    assert crops.shape == (3, 16, 16, 3)


class _FakeBoxDetector:
    """Returns one fixed face box per frame (SfdDetector.best_box shape)."""

    def __init__(self, box):
        self.box = box  # (x0, y0, x1, y1)

    def best_box(self, frames):
        T = frames.shape[0]
        out = np.zeros((T, 5), np.float32)
        out[:, :4] = self.box
        out[:, 4] = 0.9
        return out


def test_detect_and_crop_with_box_detector_two_stage():
    """SFD-box stage 1: FAN runs on the box-centered crop and its
    landmarks map back to full-frame pixels (face_alignment get_landmarks
    flow), then the kpt68 crop proceeds as usual."""
    rng = np.random.default_rng(5)
    frames = rng.uniform(0, 1, (2, 100, 100, 3)).astype(np.float32)
    # face box in the lower-right quadrant
    boxd = _FakeBoxDetector((50.0, 50.0, 90.0, 90.0))
    # FAN reports a centered box on ITS input (the stage-1 crop)
    fan = _FakeDetector((-0.4, -0.4, 0.4, 0.4))
    crops, lmk, val = detect_and_crop(fan, frames, out_size=24, scale=1.0,
                                      box_detector=boxd)
    assert crops.shape == (2, 24, 24, 3) and val.shape == (2,)
    # stage-1 crop: center (70, 70 - 0.12*40) = (70, 65.2), side
    # (40+40)*200/195 = 82.05; FAN NDC -0.4..0.4 -> full-frame px
    side = 80 * 200.0 / 195.0
    ox, oy = 70 - side / 2, 65.2 - side / 2
    exp_x0 = ox + 0.3 * side  # ndc -0.4 -> rel 0.3
    exp_x1 = ox + 0.7 * side
    # reconstruct the full-frame landmark positions detect_and_crop derived
    # from the final crop NDC: invert landmarks_to_crop_space
    # final box center/size from the expected full-frame landmarks:
    lmk_px_x = np.linspace(exp_x0, exp_x1, 68)
    lmk_px_y = np.linspace(oy + 0.3 * side, oy + 0.7 * side, 68)
    exp_lmk = np.stack([lmk_px_x, lmk_px_y], -1)[None].repeat(2, 0)
    size_e, center_e = bbox2point_kpt68(exp_lmk.astype(np.float32))
    got = landmarks_to_crop_space(exp_lmk.astype(np.float32), center_e,
                                  size_e * 1.0, 24)
    np.testing.assert_allclose(lmk, got, atol=1e-4)


def test_smooth_track_interpolates_gaps_and_smooths():
    from avi_talking_tpu.data.facecrop import smooth_track

    T = 20
    center = np.stack([np.linspace(10, 30, T),
                       np.full(T, 50.0)], -1).astype(np.float32)
    size = np.full(T, 40.0, np.float32)
    # inject a failed-detection outlier at t=10
    noisy_c = center.copy()
    noisy_c[10] = [500.0, -200.0]
    noisy_s = size.copy()
    noisy_s[10] = 999.0
    validity = np.ones(T, np.float32)
    validity[10] = 0.0
    sc, ss = smooth_track(noisy_c, noisy_s, validity, sigma=2.0)
    # the outlier is interpolated away, not smeared into its neighbours
    assert abs(sc[10, 0] - center[10, 0]) < 1.0
    assert abs(ss[10] - 40.0) < 0.5
    assert np.abs(ss - 40.0).max() < 0.5
    # a linear track stays (nearly) linear under gaussian smoothing away
    # from the clip boundaries (mode='nearest' flattens the ends slightly)
    assert np.abs(sc[4:-4, 0] - center[4:-4, 0]).max() < 0.1
    # sigma=0, all-valid: identity
    c0, s0 = smooth_track(center, size, None, sigma=0.0)
    np.testing.assert_allclose(c0, center, atol=1e-6)
    np.testing.assert_allclose(s0, size, atol=1e-6)


def test_preprocess_full_frames_smoothing_two_pass(tmp_path):
    """The two-pass full-frames path (detect track -> smooth -> crop)
    produces the same folder layout, and sigma=0 keeps results consistent
    with the unsmoothed single-pass semantics."""
    from avi_talking_tpu.data.preprocess import (
        EmocaPreprocessor, preprocess_clip_folder)
    from avi_talking_tpu.models.emoca import EmocaEncoder
    from avi_talking_tpu.models.fan_landmarks import (
        FanLandmarkDetector, FanLandmarkNet)
    from avi_talking_tpu.viz.pngio import write_png

    rng = np.random.default_rng(6)
    src = tmp_path / "clipS"
    src.mkdir()
    for t in range(5):
        write_png(str(src / f"{t:03d}.png"),
                  (rng.uniform(0, 1, (64, 64, 3)) * 255).astype(np.uint8))
    enc = EmocaEncoder(n_exp=6)
    variables = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    pre = EmocaPreprocessor(encoder=enc, variables=variables, max_b=2)
    fan = FanLandmarkNet(num_modules=1, depth=2, stem_features=8,
                         features=16)
    det = FanLandmarkDetector(
        fan, fan.init(jax.random.PRNGKey(1), jnp.zeros((1, 256, 256, 3))),
        max_b=2)
    for sigma, name in ((0.0, "raw"), (2.0, "smooth")):
        clip = preprocess_clip_folder(
            pre, str(src), str(tmp_path / name), crop_full_frames=True,
            crop_size=32, crop_smooth_sigma=sigma, detector=det)
        lmk = np.load(f"{clip}/landmarks.npy")
        assert lmk.shape == (5, 68, 2)
        assert np.load(f"{clip}/validity.npy").shape == (5,)


def test_preprocess_full_frames_cli(tmp_path):
    """preprocess-mead --full-frames: full PNGs -> detect+crop -> folders
    with crop-sized detections, landmarks.npy, validity.npy."""
    from avi_talking_tpu.cli import main
    from avi_talking_tpu.viz.pngio import read_image_normalized, write_png

    rng = np.random.default_rng(4)
    src = tmp_path / "src" / "clipF"
    src.mkdir(parents=True)
    for t in range(3):
        write_png(str(src / f"{t:03d}.png"),
                  (rng.uniform(0, 1, (96, 96, 3)) * 255).astype(np.uint8))
    out = tmp_path / "out"
    rc = main(["preprocess-mead", "--src", str(tmp_path / "src"),
               "--out", str(out), "--tiny", "--size", "32", "--max-b", "4",
               "--fan-detect", "--full-frames"])
    assert rc == 0
    clip = out / "clipF"
    lmk = np.load(clip / "landmarks.npy")
    val = np.load(clip / "validity.npy")
    assert lmk.shape == (3, 68, 2) and val.shape == (3,)
    det0 = read_image_normalized(str(clip / "detections" / "00000_000.png"))
    assert det0.shape == (32, 32, 3)  # cropped to --size, not source size

    # --full-frames without a detector fails loudly
    with pytest.raises(SystemExit):
        main(["preprocess-mead", "--src", str(tmp_path / "src"),
              "--out", str(out), "--tiny", "--size", "32", "--full-frames"])
