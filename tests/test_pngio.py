"""PNG IO: pure-Python decoder vs native C++ decoder vs golden fixture.

Replaces the reference's cv2 image IO (data_loader.py:342-346). The
checked-in ``golden/mixed_filters.png`` exercises all five PNG filter types
(None/Sub/Up/Average/Paeth) against stored expected pixels.
"""

from pathlib import Path

import numpy as np
import pytest

from avi_talking_tpu.viz.pngio import (
    _load_native,
    _read_png_native,
    _read_png_python,
    read_image_normalized,
    read_png,
    write_png,
)

GOLDEN = Path(__file__).parent / "golden"


def _native_or_skip():
    lib = _load_native()
    if lib is None:
        pytest.skip("native imageio not built (make -C native)")
    return lib


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_roundtrip_python(tmp_path, channels):
    rng = np.random.default_rng(channels)
    img = rng.integers(0, 256, (23, 17, channels), dtype=np.uint8)
    p = tmp_path / "x.png"
    write_png(str(p), img)
    np.testing.assert_array_equal(_read_png_python(str(p)), img)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_roundtrip_native(tmp_path, channels):
    lib = _native_or_skip()
    rng = np.random.default_rng(channels)
    img = rng.integers(0, 256, (23, 17, channels), dtype=np.uint8)
    p = tmp_path / "x.png"
    write_png(str(p), img)
    np.testing.assert_array_equal(_read_png_native(str(p), lib), img)


def test_golden_all_filters_python():
    want = np.load(GOLDEN / "mixed_filters_expected.npy")
    got = _read_png_python(str(GOLDEN / "mixed_filters.png"))
    np.testing.assert_array_equal(got, want)


def test_golden_all_filters_native():
    lib = _native_or_skip()
    want = np.load(GOLDEN / "mixed_filters_expected.npy")
    got = _read_png_native(str(GOLDEN / "mixed_filters.png"), lib)
    np.testing.assert_array_equal(got, want)


def test_palette_png_python(tmp_path):
    """Palette (color type 3) decoding — Python fallback path."""
    import struct
    import zlib

    idx = np.asarray([[0, 1], [2, 1]], np.uint8)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))

    def chunk(tag, body):
        o = struct.pack(">I", len(body)) + tag + body
        return o + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)

    hdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    p = tmp_path / "pal.png"
    p.write_bytes(
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", hdr) + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )
    got = read_png(str(p))  # native refuses palette -> python fallback
    want = np.asarray(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [0, 255, 0]]], np.uint8
    )
    np.testing.assert_array_equal(got, want)


def test_read_image_normalized(tmp_path):
    img = np.zeros((4, 4, 3), np.uint8)
    img[0, 0] = 255
    p = tmp_path / "n.png"
    write_png(str(p), img)
    out = read_image_normalized(str(p))
    assert out.dtype == np.float32 and out.shape == (4, 4, 3)
    assert out.min() == -1.0 and out.max() == 1.0
    # grayscale broadcast to 3 channels
    write_png(str(p), img[..., :1])
    assert read_image_normalized(str(p)).shape == (4, 4, 3)


def test_rejects_malformed(tmp_path):
    p = tmp_path / "bad.png"
    p.write_bytes(b"not a png at all")
    with pytest.raises(ValueError):
        _read_png_python(str(p))
