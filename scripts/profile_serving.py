"""Serving-path profiler: full-size InferenceServer soak on the real chip.

Measures warmup (all-shape compile), offered-load latency percentiles and
served throughput — the numbers bench.py reports as serving_p50_ms /
serving_throughput. Usage:  python scripts/profile_serving.py [requests]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main(n_requests: int = 32) -> None:
    import jax.numpy as jnp

    from avi_talking_tpu.core import synthetic_assets
    from avi_talking_tpu.pipeline import (
        AviTalkingPipeline,
        InferenceServer,
        PipelineConfig,
        ServingConfig,
    )

    assets = synthetic_assets(num_vertices=5023, n_shape=300, n_exp=50,
                              num_faces=9976)
    pipe = AviTalkingPipeline.random_init(
        PipelineConfig(), flame_assets=assets, dtype=jnp.bfloat16)
    lfs = pipe.cfg.emote.flint.latent_frame_size
    bucket = 200 + (-200) % lfs  # one 8 s bucket
    scfg = ServingConfig(max_batch=8, max_wait_ms=3.0, batch_buckets=(8,),
                         length_buckets=(bucket,))
    wav = np.asarray(
        np.random.default_rng(3).uniform(-0.3, 0.3, 16_000 * 8), np.float32)
    with InferenceServer(pipe, scfg) as server:
        t0 = time.time()
        server.warmup(seconds_per_bucket=[8])
        print(f"warmup {time.time() - t0:.1f}s")
        futs = [server.submit(wav, "a fairly happy person", seed=0)
                for _ in range(n_requests)]
        for f in futs:
            f.result()
        pct = server.latency_percentiles()
        wall = max(server.stats["latency_ms"]) / 1e3
        print(f"p50 {pct['p50']:.1f} ms  p99 {pct['p99']:.1f} ms  "
              f"throughput {n_requests * 8 / wall:.1f} s_audio/s  "
              f"batches {server.stats['batch_size']}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
