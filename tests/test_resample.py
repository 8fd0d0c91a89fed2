"""Parity of ops.resample with torch F.interpolate(align_corners=True).

This is the #1 parity trap called out in SURVEY.md §7 (reference:
/root/reference/models/lib/wav2vec.py:67-73) — off-by-one here wrecks
lip-sync, so we check bit-level agreement against torch on CPU.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from avi_talking_tpu.ops import linear_interpolate, resample_features


@pytest.mark.parametrize("in_len,out_len", [(100, 50), (50, 100), (7, 13), (13, 7), (64, 64), (5, 1), (1, 5), (2, 3)])
def test_matches_torch_align_corners(in_len, out_len):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, in_len, 16)).astype(np.float32)

    # torch: (B, C, L) layout
    ref = (
        F.interpolate(
            torch.from_numpy(x).transpose(1, 2),
            size=out_len,
            mode="linear",
            align_corners=True,
        )
        .transpose(1, 2)
        .numpy()
    )
    got = np.asarray(linear_interpolate(x, out_len, axis=1))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_resample_features_default_len():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 100, 8)).astype(np.float32)
    # 100 frames at 50 fps -> 2 s -> 50 frames at 25 fps
    y = resample_features(x, 50, 25)
    assert y.shape == (1, 50, 8)
    ref = (
        F.interpolate(
            torch.from_numpy(x).transpose(1, 2), size=50, mode="linear", align_corners=True
        )
        .transpose(1, 2)
        .numpy()
    )
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)


def test_output_len_override():
    x = np.arange(10, dtype=np.float32).reshape(1, 10, 1)
    y = resample_features(x, 50, 25, output_len=4)
    assert y.shape == (1, 4, 1)
