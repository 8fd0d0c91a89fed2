"""Native wavio (C++) vs pure-Python frontend parity."""

import wave

import numpy as np
import pytest

from avi_talking_tpu.audio import frontend, native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libwavio.so not built (make -C native)"
)


def _write_wav(path, sr, data_f32, width=2):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(width)
        w.setframerate(sr)
        if width == 2:
            w.writeframes((data_f32 * 32767).astype("<i2").tobytes())
        else:
            w.writeframes((data_f32 * 2147483647).astype("<i4").tobytes())


def test_decode_parity_16k(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.uniform(-0.8, 0.8, 16000).astype(np.float32)
    p = tmp_path / "a.wav"
    _write_wav(p, 16000, data)
    w_py, _ = frontend.read_wav(str(p))
    w_c, _ = native.read_wav_native(str(p))
    assert len(w_py) == len(w_c)
    np.testing.assert_allclose(w_c, w_py, atol=1e-4)


def test_decode_resample_48k(tmp_path):
    t = np.linspace(0, 1, 48000, endpoint=False)
    data = np.sin(2 * np.pi * 440 * t).astype(np.float32) * 0.5
    p = tmp_path / "b.wav"
    _write_wav(p, 48000, data)
    w_c, sr = native.read_wav_native(str(p))
    assert sr == 16000
    assert abs(len(w_c) - 16000) <= 2
    # the resampled signal still is a 440 Hz sine: check rms and zero
    # crossings roughly
    assert 0.3 < np.sqrt((w_c**2).mean()) < 0.4
    crossings = np.sum(np.diff(np.signbit(w_c)))
    assert 800 < crossings < 960  # ~880 for a 440 Hz sine over 1 s


def test_frame_parity(tmp_path):
    rng = np.random.default_rng(1)
    wav = rng.uniform(-1, 1, 16000 * 3 + 123).astype(np.float32)
    f_py = frontend.frame_audio(wav)
    f_c = native.frame_audio_native(wav)
    assert f_py.shape == f_c.shape
    np.testing.assert_array_equal(f_py, f_c)


def test_frame_max_seconds_cut():
    wav = np.ones(16000 * 30, np.float32) * 0.1
    f = native.frame_audio_native(wav)  # 22 s cut
    assert f.shape[0] == 22 * 25
