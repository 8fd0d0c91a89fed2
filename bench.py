"""Headline benchmark: real-time factor of wav -> FLAME coeffs + meshes.

Runs the full production path on one TPU chip in bfloat16:
  audio frames -> wav2vec2-base (95M) -> EMOTE decoder -> FLINT -> FLAME
  (full-size: 5023 vertices, 300 shape / 50 exp PCA)
plus the 100-step diffusion-prior style sample, and reports the end-to-end
real-time factor per second of audio.

Baseline: the reference publishes no speed numbers (BASELINE.md); the
driver's north-star target is RTF < 0.05 on one v5e chip.
``vs_baseline`` = target_rtf / measured_rtf (>1 means faster than target).

Prints ONE JSON line.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from avi_talking_tpu.core import synthetic_assets
    from avi_talking_tpu.models import (
        DiffusionPrior,
        EmoteConfig,
        EmoteTalkingHead,
        NoiseScheduler,
    )
    from avi_talking_tpu.models.prior_transformer import PriorTransformerNetwork

    dtype = jnp.bfloat16
    seconds = 8  # per-clip audio length (25 fps -> 200 frames)
    T = seconds * 25

    # full-size FLAME-shaped assets (external pickle not distributable):
    # 5023 verts, 300+50 PCA dirs -> identical FLOP/byte profile to FLAME
    assets = synthetic_assets(num_vertices=5023, n_shape=300, n_exp=50, num_faces=9976)

    cfg = EmoteConfig()
    head = EmoteTalkingHead(cfg, flame_assets=assets, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    audio = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, T, 640)).astype(np.float32)
    )
    style = jnp.zeros((1, cfg.feature_dim), dtype)
    params = head.init(rng, audio[:, : cfg.flint.latent_frame_size], style_emb=style)

    # prior: dim 128, depth 6, heads 8, 100 DDPM steps in one scan
    net = PriorTransformerNetwork(dim=128, depth=6, heads=8, dim_head=64, dtype=dtype)
    pparams = net.init(
        rng, jnp.zeros((1, 1, 128), dtype), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 128), dtype),
    )
    prior = DiffusionPrior(net=net, scheduler=NoiseScheduler.create(100))

    # fused end-to-end: style sample + animate in ONE dispatch
    @jax.jit
    def fused(params, pparams, audio, rng):
        st = prior.p_sample_loop(pparams, (1, 1, 128),
                                 jnp.zeros((1, 128), dtype), rng)
        return head.apply(params, audio,
                          style_emb=st[:, 0, : cfg.feature_dim].astype(dtype))

    out = fused(params, pparams, audio, jax.random.PRNGKey(0))
    jax.block_until_ready(out)

    n = 10
    t0 = time.perf_counter()
    for i in range(n):
        out = fused(params, pparams, audio, jax.random.PRNGKey(i))
    jax.block_until_ready(out)
    elapsed = (time.perf_counter() - t0) / n

    rtf = elapsed / seconds
    target_rtf = 0.05
    print(
        json.dumps(
            {
                "metric": "rtf_wav_to_mesh_1chip",
                "value": round(rtf, 6),
                "unit": "s_compute_per_s_audio",
                "vs_baseline": round(target_rtf / rtf, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
