"""Micro-batching inference server tests (pipeline/server.py): request
coalescing, batch/length bucketing, per-request unpadding, seed grouping,
failure propagation — on the tiny random-weight pipeline."""

import time

import numpy as np
import pytest

from avi_talking_tpu.core import synthetic_assets
from avi_talking_tpu.pipeline import AviTalkingPipeline, PipelineConfig
from avi_talking_tpu.pipeline.server import InferenceServer, ServingConfig


@pytest.fixture(scope="module")
def pipe():
    return AviTalkingPipeline.random_init(
        PipelineConfig.tiny(), flame_assets=synthetic_assets(n_shape=8, n_exp=6)
    )


@pytest.fixture()
def server(pipe):
    cfg = ServingConfig(max_batch=4, max_wait_ms=40.0,
                        batch_buckets=(1, 2, 4), length_buckets=(64, 128))
    with InferenceServer(pipe, cfg) as s:
        yield s


def test_single_request_matches_direct_batch_path(pipe, server):
    wav = np.random.default_rng(0).uniform(-0.3, 0.3, 16000).astype(np.float32)
    out = server.generate(wav, "a happy person", seed=3, timeout=300)
    ref = pipe.generate_batch([wav], ["a happy person"], seed=3,
                              length_buckets=(64, 128))[0]
    np.testing.assert_allclose(out["exp"], ref["exp"], atol=1e-6)
    np.testing.assert_allclose(out["style_emb"], ref["style_emb"], atol=1e-6)


def test_coalescing_pads_batch_and_unpads_results(pipe, server):
    rng = np.random.default_rng(1)
    wavs = [rng.uniform(-0.3, 0.3, n).astype(np.float32)
            for n in (8000, 16000, 24000)]
    futs = [server.submit(w, f"instruction {i}") for i, w in enumerate(wavs)]
    outs = [f.result(timeout=300) for f in futs]
    # per-request lengths preserved (25 fps, padded to latent multiple)
    lens = [o["exp"].shape[0] for o in outs]
    assert lens[0] < lens[1] < lens[2]
    for o in outs:
        assert np.isfinite(o["exp"]).all()
    # 3 requests coalesced -> padded to the 4-bucket (plus any stragglers
    # dispatched separately under timing jitter)
    assert server.stats["padded_batch"][0] in (2, 4)
    assert sum(server.stats["batch_size"]) == 3
    # every result equals the direct single-seed batch call
    refs = pipe.generate_batch(wavs, [f"instruction {i}" for i in range(3)],
                               seed=0, length_buckets=(64, 128))
    for o, r in zip(outs, refs):
        np.testing.assert_allclose(o["exp"], r["exp"], atol=1e-5)


def test_different_seeds_do_not_share_a_batch(pipe, server):
    wav = np.zeros(8000, np.float32)
    f1 = server.submit(wav, "same text", seed=1)
    f2 = server.submit(wav, "same text", seed=2)
    o1, o2 = f1.result(timeout=300), f2.result(timeout=300)
    # different seeds -> different style draws even for identical text
    assert not np.allclose(o1["style_emb"], o2["style_emb"])
    r1 = pipe.generate_batch([wav], ["same text"], seed=1,
                             length_buckets=(64, 128))[0]
    np.testing.assert_allclose(o1["style_emb"], r1["style_emb"], atol=1e-6)


def test_oversized_clip_fails_only_its_batch(pipe, server):
    ok = server.submit(np.zeros(8000, np.float32), "fine", seed=9)
    too_long = server.submit(
        np.zeros(16000 * 60, np.float32), "too long", seed=8)
    with pytest.raises(ValueError):
        too_long.result(timeout=300)
    assert ok.result(timeout=300)["exp"].shape[0] > 0


def test_latency_stats_and_close(pipe):
    cfg = ServingConfig(max_batch=2, max_wait_ms=1.0,
                        batch_buckets=(1, 2), length_buckets=(64,))
    s = InferenceServer(pipe, cfg)
    s.generate(np.zeros(8000, np.float32), "x", timeout=300)
    pct = s.latency_percentiles()
    assert pct["p50"] > 0 and pct["p99"] >= pct["p50"]
    # stage breakdown: every stage recorded, attribution sums to ~latency
    bd = s.stage_breakdown()
    for key in ("queue_wait_ms", "framing_ms", "style_dispatch_ms",
                "prep_ms", "device_fetch_ms"):
        assert np.isfinite(bd[key]) and bd[key] >= 0.0, key
    stages_sum = sum(v for k, v in bd.items() if k != "queue_wait_ms")
    assert stages_sum <= pct["p50"] * 1.05  # stages nest inside latency
    s.clear_stats()
    assert all(not v for v in s.stats.values())
    s.close()
    s.close()  # idempotent
    with pytest.raises(RuntimeError):
        s.submit(np.zeros(100, np.float32), "y")


def test_warmup_compiles_all_buckets(pipe):
    cfg = ServingConfig(max_batch=2, max_wait_ms=1.0,
                        batch_buckets=(1, 2), length_buckets=(64,))
    with InferenceServer(pipe, cfg) as s:
        s.warmup()
        t0 = time.perf_counter()
        s.generate(np.zeros(8000, np.float32), "warm", timeout=300)
        warm_ms = (time.perf_counter() - t0) * 1e3
    assert warm_ms < 5000  # generous: no fresh compile in the hot path


def test_cli_serve_and_translate(tmp_path):
    """`cli serve` runs the fixture corpus through the InferenceServer and
    reports latency; `cli translate-captions` converts Style-B prose."""
    import json
    from pathlib import Path

    from avi_talking_tpu.cli import main

    repo = Path(__file__).resolve().parents[1]
    rc = main([
        "serve", "--json-dir", str(repo / "experiments" / "json_dir"),
        "--wav-dir", str(repo / "experiments" / "wav_dir"),
        "--tiny", "--max-batch", "4", "--max-wait-ms", "30",
        "--length-buckets", "128", "256", "512",
        "--out", str(tmp_path / "out"),
    ])
    assert rc == 0
    assert list((tmp_path / "out").glob("*_coeffs.npz"))

    src = tmp_path / "styleb.txt"
    src.write_text(
        "The anger is inferred from the lowered brow and separated lips.\n"
        "This happy face shows raising of the cheek.\n")
    dst = tmp_path / "stylea.json"
    rc = main(["translate-captions", "--input", str(src), "--out", str(dst)])
    assert rc == 0
    outs = json.loads(dst.read_text())
    assert len(outs) == 2 and all(o.endswith(".") for o in outs)
