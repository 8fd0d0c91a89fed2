"""Serving example: micro-batched inference with warmup + latency stats.

Runs with random weights out of the box (tiny config); the same code path
serves imported checkpoints at scale on a TPU chip. Usage:

    python examples/serving.py [--full] [--requests 12]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="full-size models")
    ap.add_argument("--requests", type=int, default=12)
    args = ap.parse_args()

    from avi_talking_tpu.core import synthetic_assets
    from avi_talking_tpu.pipeline import (
        AviTalkingPipeline,
        InferenceServer,
        PipelineConfig,
        ServingConfig,
    )

    cfg = PipelineConfig() if args.full else PipelineConfig.tiny()
    assets = synthetic_assets(n_shape=cfg.emote.n_shape, n_exp=cfg.emote.n_exp)
    pipe = AviTalkingPipeline.random_init(cfg, flame_assets=assets)

    scfg = ServingConfig(max_batch=8, max_wait_ms=5.0,
                         batch_buckets=(1, 2, 4, 8),
                         length_buckets=(128, 256))
    rng = np.random.default_rng(0)
    instructions = [
        "A fairly angry man speaks with brow fairly down.",
        "A mildly joyous man speaks with lip corner lightly pulled.",
        "A man feels slightly sad.",
    ]
    with InferenceServer(pipe, scfg) as server:
        t0 = time.time()
        server.warmup()
        print(f"warmup (all shapes compiled): {time.time() - t0:.1f}s")

        futs = []
        t0 = time.time()
        for i in range(args.requests):
            wav = rng.uniform(-0.3, 0.3, rng.integers(8000, 64000)).astype(
                np.float32)
            futs.append(server.submit(wav, instructions[i % 3]))
        outs = [f.result() for f in futs]
        wall = time.time() - t0

        audio_s = sum(o["exp"].shape[0] / 25.0 for o in outs)
        pct = server.latency_percentiles()
        print(f"{len(outs)} requests, {audio_s:.1f}s of audio in {wall:.2f}s "
              f"({audio_s / wall:.1f}x realtime)")
        print(f"latency p50 {pct['p50']:.0f} ms, p99 {pct['p99']:.0f} ms; "
              f"batches: {server.stats['batch_size']}")


if __name__ == "__main__":
    main()
