"""Video-container ingestion (data.videoio + preprocess_clip_video +
cli preprocess-mead --videos): the reference's skvideo raw-data path
(FaceVideoDataModule.py:50,422-429) rebuilt as an ffmpeg rawvideo pipe.

This box has no ffmpeg binary, so the tests install STUB ffmpeg/ffprobe
executables on PATH: the "video file" is an .npy of packed yuv420p rows
and the stub streams its exact bytes — pinning the pipe framing, probe
parsing, chunking and the e2e MEAD-layout output without a real codec."""

import json
import os
import stat
import sys
import wave

import pytest

import numpy as np

from avi_talking_tpu.data.yuv import yuv420_packed_size, yuv420_to_rgb_host

W, H = 32, 24


def _make_video(path, frames_packed: np.ndarray, nsamples: int = 4 * 640,
                fail_decode: bool = False):
    """A 'video': npy of (T, H*W*3/2) uint8 rows + a meta sidecar."""
    np.save(str(path) + ".npy", frames_packed)
    with open(str(path), "wb") as f:
        f.write(b"fakevideo")  # the stubs only read the sidecars
    with open(str(path) + ".meta.json", "w") as f:
        json.dump({"width": W, "height": H, "fps": "25/1",
                   "nsamples": nsamples, "fail_decode": fail_decode}, f)


_STUB_FFMPEG = r"""
import json, os, struct, sys, wave

args = sys.argv[1:]
src = args[args.index("-i") + 1]
meta = json.load(open(src + ".meta.json"))
if "rawvideo" in args:
    data = __import__("numpy").load(src + ".npy")
    raw = data.tobytes()
    if meta.get("fail_decode"):  # die mid-stream with a partial frame
        sys.stdout.buffer.write(raw[: len(raw) // 2 + 7])
        sys.stdout.buffer.flush()
        sys.stderr.write("error while decoding MB 12 34\n")
        sys.exit(3)
    sys.stdout.buffer.write(raw)
elif "-vn" in args:
    out = args[-1]
    n = meta["nsamples"]
    if n <= 0:
        sys.stderr.write("no audio stream\n")
        sys.exit(1)
    w = wave.open(out, "wb")
    w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
    pcm = struct.pack("<%dh" % n, *([1000] * n))
    w.writeframes(pcm); w.close()
else:  # bare probe: ffmpeg -i X
    sys.stderr.write(
        "Input #0, mov, from '%s':\n  Stream #0:0: Video: h264, yuv420p, "
        "%dx%d, 25 fps, 25 tbr\n" % (src, meta["width"], meta["height"]))
    sys.exit(1)
"""

_STUB_FFPROBE = r"""
import json, sys

args = sys.argv[1:]
src = args[-1]
meta = json.load(open(src + ".meta.json"))
print(json.dumps({"streams": [{"width": meta["width"],
                               "height": meta["height"],
                               "avg_frame_rate": meta["fps"]}]}))
"""


def _install_stubs(tmp_path, monkeypatch, with_ffprobe=True):
    bindir = tmp_path / "stub_bin"
    bindir.mkdir(exist_ok=True)
    for name, body in (("ffmpeg", _STUB_FFMPEG),) + (
            (("ffprobe", _STUB_FFPROBE),) if with_ffprobe else ()):
        py = bindir / f"_{name}.py"
        py.write_text(body)
        sh = bindir / name
        sh.write_text(f"#!/bin/sh\nexec {sys.executable} {py} \"$@\"\n")
        sh.chmod(sh.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")
    return bindir


def _packed(T, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (T, yuv420_packed_size(H, W)),
                        dtype=np.uint8)


def test_probe_and_stream_roundtrip(tmp_path, monkeypatch):
    from avi_talking_tpu.data.videoio import (
        iter_video_yuv420,
        probe_video,
        read_video_frames,
    )

    _install_stubs(tmp_path, monkeypatch)
    vid = tmp_path / "clip.mp4"
    packed = _packed(7)
    _make_video(vid, packed)
    info = probe_video(str(vid))
    assert (info.width, info.height, info.fps) == (W, H, 25.0)
    assert info.frame_bytes == yuv420_packed_size(H, W)
    chunks = list(iter_video_yuv420(str(vid), chunk=3))
    assert [c.shape[0] for c in chunks] == [3, 3, 1]
    np.testing.assert_array_equal(np.concatenate(chunks), packed)
    # RGB convenience matches the host yuv oracle
    rgb = read_video_frames(str(vid))
    want = np.clip(np.rint(
        yuv420_to_rgb_host(packed, H, W) * 255.0), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(rgb, want)


def test_probe_fallback_parses_ffmpeg_stderr(tmp_path, monkeypatch):
    from avi_talking_tpu.data.videoio import probe_video

    _install_stubs(tmp_path, monkeypatch, with_ffprobe=False)
    vid = tmp_path / "clip.mp4"
    _make_video(vid, _packed(2))
    info = probe_video(str(vid))
    assert (info.width, info.height) == (W, H)


def test_missing_ffmpeg_is_loud(tmp_path, monkeypatch):
    from avi_talking_tpu.data.videoio import (
        FfmpegMissingError,
        have_ffmpeg,
        iter_video_yuv420,
    )

    empty = tmp_path / "emptybin"
    empty.mkdir()
    monkeypatch.setenv("PATH", str(empty))
    assert not have_ffmpeg()
    vid = tmp_path / "clip.mp4"
    _make_video(vid, _packed(1))
    with pytest.raises(FfmpegMissingError, match="preprocess-mead"):
        list(iter_video_yuv420(str(vid)))


def test_decoder_death_raises_not_truncates(tmp_path, monkeypatch):
    """A decoder that dies mid-stream (nonzero exit after EOF) raises
    instead of passing off the partial clip as complete — and the full
    frames decoded before the death are still surfaced in the error path,
    never silently written as pseudo-GT."""
    from avi_talking_tpu.data.videoio import iter_video_yuv420

    _install_stubs(tmp_path, monkeypatch)
    vid = tmp_path / "corrupt.mp4"
    _make_video(vid, _packed(6), fail_decode=True)
    with pytest.raises(RuntimeError, match="rc=3"):
        list(iter_video_yuv420(str(vid), chunk=2))
    # early consumer abort is NOT an error (we killed ffmpeg ourselves)
    ok = tmp_path / "ok.mp4"
    _make_video(ok, _packed(6))
    it = iter_video_yuv420(str(ok), chunk=2)
    next(it)
    it.close()  # no raise


def test_preprocess_clip_video_skips_empty_video(tmp_path, monkeypatch):
    import jax
    import jax.numpy as jnp

    from avi_talking_tpu.data.preprocess import (
        EmocaPreprocessor,
        preprocess_clip_video,
    )
    from avi_talking_tpu.models.emoca import EmocaEncoder

    _install_stubs(tmp_path, monkeypatch)
    vid = tmp_path / "empty.mp4"
    _make_video(vid, _packed(0), nsamples=0)
    enc = EmocaEncoder(n_exp=6)
    pre = EmocaPreprocessor(
        encoder=enc,
        variables=enc.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3))),
        max_b=2)
    assert preprocess_clip_video(
        pre, str(vid), str(tmp_path / "out"), write_detections=False,
        extract_audio=False) is None


def test_extract_wav(tmp_path, monkeypatch):
    from avi_talking_tpu.data.videoio import extract_wav

    _install_stubs(tmp_path, monkeypatch)
    vid = tmp_path / "clip.mp4"
    _make_video(vid, _packed(2), nsamples=1280)
    out = tmp_path / "a.wav"
    assert extract_wav(str(vid), str(out))
    with wave.open(str(out)) as w:
        assert w.getframerate() == 16000
        assert w.getnframes() == 1280
    # audio-less container: False, no file left behind
    vid2 = tmp_path / "mute.mp4"
    _make_video(vid2, _packed(2), nsamples=0)
    out2 = tmp_path / "b.wav"
    assert not extract_wav(str(vid2), str(out2))
    assert not out2.exists()


def test_preprocess_clip_video_framefree_matches_frames_path(
        tmp_path, monkeypatch):
    """The packed fast path (no detections/detector/parser) writes the same
    codes as the RGB-frames path, minus the detection PNGs."""
    import jax
    import jax.numpy as jnp

    from avi_talking_tpu.data.preprocess import (
        EmocaPreprocessor,
        preprocess_clip_video,
    )
    from avi_talking_tpu.models.emoca import EmocaEncoder

    _install_stubs(tmp_path, monkeypatch)
    vid = tmp_path / "M003_front_happy_level2_001.mp4"
    T = 5
    # constant chroma (U=V=128 -> R=G=B=Y): removes the one legitimate
    # difference between the paths (device bilinear vs host nearest chroma
    # upsampling) so codes must match to float tolerance
    rng = np.random.default_rng(3)
    packed = np.full((T, yuv420_packed_size(H, W)), 128, np.uint8)
    packed[:, : H * W] = rng.integers(0, 256, (T, H * W), dtype=np.uint8)
    _make_video(vid, packed, nsamples=T * 640)
    enc = EmocaEncoder(n_exp=6)
    pre = EmocaPreprocessor(
        encoder=enc,
        variables=enc.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3))),
        max_b=3)
    fast = preprocess_clip_video(pre, str(vid), str(tmp_path / "fast"),
                                 write_detections=False)
    full = preprocess_clip_video(pre, str(vid), str(tmp_path / "full"),
                                 write_detections=True)
    assert fast and full
    for t in range(T):
        for key in ("exp", "pose", "shape", "cam"):
            a = np.load(os.path.join(
                fast, "EMOCA_v2_lr_mse_20", f"{t:05d}_000", f"{key}.npy"))
            b = np.load(os.path.join(
                full, "EMOCA_v2_lr_mse_20", f"{t:05d}_000", f"{key}.npy"))
            np.testing.assert_allclose(a, b, atol=3e-5)
    assert not os.path.exists(os.path.join(fast, "detections"))
    assert os.path.exists(
        os.path.join(full, "detections", "00000_000.png"))
    # demuxed audio landed as <clip>/<clip>.wav in both
    for d in (fast, full):
        assert os.path.exists(
            os.path.join(d, os.path.basename(d) + ".wav"))


def test_preprocess_mead_videos_cli_e2e(tmp_path, monkeypatch):
    """PNG-free fixture e2e: mp4 in -> MEAD layout out -> MeadEmocaDataset
    loads it (VERDICT r4 item 2's done criterion)."""
    from avi_talking_tpu.cli import main
    from avi_talking_tpu.data import MeadEmocaDataset

    _install_stubs(tmp_path, monkeypatch)
    src = tmp_path / "vids"
    src.mkdir()
    T = 4
    _make_video(src / "M003_front_happy_level2_001.mp4", _packed(T, seed=5),
                nsamples=T * 640)
    out = tmp_path / "emoca"
    rc = main(["preprocess-mead", "--videos", "--src", str(src),
               "--out", str(out), "--size", str(H), "--max-b", "2"])
    assert rc == 0
    clip = out / "M003_front_happy_level2_001"
    assert (clip / "EMOCA_v2_lr_mse_20" / "00000_000" / "exp.npy").exists()
    assert (clip / "M003_front_happy_level2_001.wav").exists()
    ds = MeadEmocaDataset(root=str(out), seq_length=2)
    assert len(ds) == 1
    item = ds[0]
    assert item["coeff"].shape == (2, 59)
    assert np.isfinite(item["coeff"]).all()
