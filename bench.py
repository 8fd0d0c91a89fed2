"""Benchmarks: the full BASELINE.json metric set, one JSON line per metric.

Headline (FIRST line, what BENCH_r*.json records): real-time factor of
wav -> FLAME coeffs + meshes — the full production path on one TPU chip in
bfloat16 (audio frames -> wav2vec2-base 95M -> EMOTE decoder -> FLINT ->
FLAME 5023 verts, plus the 100-step diffusion-prior style sample fused into
the same dispatch).

Additional lines (verdict r1 item 7 — previously prose in CLAUDE.md):
  - request_latency_ms_p50 / _p99: blocking per-request latency, 8 s clips
  - batched_serving_throughput: s_audio per s_compute at B=16
  - train_step_frames_per_s + train_mfu_pct: jitted EMOTE geometric train
    step (B=8, T=200, bf16 compute) with a 6*N*tokens FLOP estimate
    against the v5e bf16 peak (197 TFLOP/s)

Baseline: the reference publishes no speed numbers (BASELINE.md); the
driver's north-star target is RTF < 0.05 on one v5e chip.
``vs_baseline`` = target_rtf / measured_rtf (>1 means faster than target).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import numpy as np

V5E_BF16_PEAK_FLOPS = 197e12


def _emit(metric, value, unit, vs_baseline=None):
    line = {"metric": metric, "value": value, "unit": unit}
    if vs_baseline is not None:
        line["vs_baseline"] = vs_baseline
    print(json.dumps(line), flush=True)


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
        st = prior.p_sample_loop(pparams, (audio.shape[0], 1, 128),
                                 jnp.zeros((audio.shape[0], 128), dtype), rng)
        return head.apply(params, audio,
                          style_emb=st[:, 0, : cfg.feature_dim].astype(dtype))

    out = fused(params, pparams, audio, jax.random.PRNGKey(0))
    jax.block_until_ready(out)

    # ---- headline RTF (FIRST LINE) --------------------------------------
    n = 10
    t0 = time.perf_counter()
    for i in range(n):
        out = fused(params, pparams, audio, jax.random.PRNGKey(i))
    jax.block_until_ready(out)
    rtf = (time.perf_counter() - t0) / n / seconds
    target_rtf = 0.05
    _emit("rtf_wav_to_mesh_1chip", round(rtf, 6), "s_compute_per_s_audio",
          round(target_rtf / rtf, 2))

    # ---- blocking request latency p50/p99 --------------------------------
    lat = []
    for i in range(50):
        t0 = time.perf_counter()
        jax.block_until_ready(fused(params, pparams, audio, jax.random.PRNGKey(i)))
        lat.append((time.perf_counter() - t0) * 1e3)
    _emit("request_latency_ms_p50", round(float(np.percentile(lat, 50)), 2),
          "ms_per_8s_clip")
    _emit("request_latency_ms_p99", round(float(np.percentile(lat, 99)), 2),
          "ms_per_8s_clip")

    # ---- batched serving throughput (B=16, one dispatch) ------------------
    B = 16
    audio_b = jnp.broadcast_to(audio, (B, T, 640))
    out = fused(params, pparams, audio_b, jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    n = 5
    t0 = time.perf_counter()
    for i in range(n):
        out = fused(params, pparams, audio_b, jax.random.PRNGKey(i))
    jax.block_until_ready(out)
    per_batch = (time.perf_counter() - t0) / n
    _emit("batched_serving_throughput_b16", round(B * seconds / per_batch, 1),
          "s_audio_per_s_compute")

    # ---- train-step throughput + MFU estimate ----------------------------
    import optax

    from avi_talking_tpu.models.conditioning import StyleCondition
    from avi_talking_tpu.train.talking_head import TalkingHeadTrainer

    # geometric losses only; bf16 compute head WITHOUT flame (training
    # supervises coeffs; keeps the step comparable across rounds)
    train_head = EmoteTalkingHead(cfg, dtype=dtype)
    Bt = 8
    rngs = np.random.default_rng(1)
    batch = {
        "raw_audio": jnp.asarray(
            rngs.standard_normal((Bt, T, 640)).astype(np.float32)),
        "expression": jnp.asarray(np.eye(9, dtype=np.float32)[
            rngs.integers(0, 9, Bt)]),
        "intensity": jnp.asarray(np.eye(3, dtype=np.float32)[
            rngs.integers(0, 3, Bt)]),
        "identity": jnp.asarray(np.eye(32, dtype=np.float32)[
            rngs.integers(0, 32, Bt)]),
        "shape": jnp.zeros((Bt, cfg.n_shape)),
        "gt_exp": jnp.asarray(
            rngs.standard_normal((Bt, T, cfg.n_exp)).astype(np.float32) * 0.1),
        "gt_jaw": jnp.asarray(
            rngs.standard_normal((Bt, T, 3)).astype(np.float32) * 0.05),
    }
    cond = StyleCondition(batch["expression"], batch["intensity"],
                          batch["identity"], batch["shape"])
    tparams = train_head.init(jax.random.PRNGKey(0), batch["raw_audio"], cond)
    tx = optax.adamw(1e-4)
    trainer = TalkingHeadTrainer(head=train_head, tx=tx)
    step = trainer.jitted_train_step()
    opt = tx.init(tparams)
    tparams, opt, m = step(tparams, opt, batch, jax.random.PRNGKey(0))
    jax.block_until_ready(m)
    n = 5
    t0 = time.perf_counter()
    for i in range(n):
        tparams, opt, m = step(tparams, opt, batch, jax.random.PRNGKey(i))
    jax.block_until_ready(m)
    step_s = (time.perf_counter() - t0) / n
    frames_per_s = Bt * T / step_s
    _emit("train_step_frames_per_s", round(frames_per_s, 1), "frames_per_s")
    n_params = sum(x.size for x in jax.tree.leaves(tparams))
    flops = 6.0 * n_params * Bt * T  # fwd+bwd estimate per step
    _emit("train_mfu_pct", round(100.0 * flops / step_s / V5E_BF16_PEAK_FLOPS, 2),
          "pct_of_v5e_bf16_peak")

    # ---- production serving path (InferenceServer, micro-batched) --------
    from avi_talking_tpu.pipeline import (
        AviTalkingPipeline,
        InferenceServer,
        PipelineConfig,
        ServingConfig,
    )

    pipe = AviTalkingPipeline.random_init(
        PipelineConfig(), flame_assets=assets, dtype=dtype)
    lfs = pipe.cfg.emote.flint.latent_frame_size
    bucket = 200 + (-200) % lfs  # one 8 s bucket
    scfg = ServingConfig(max_batch=8, max_wait_ms=3.0, batch_buckets=(8,),
                         length_buckets=(bucket,))
    wav8s = np.asarray(
        np.random.default_rng(3).uniform(-0.3, 0.3, 16_000 * seconds),
        np.float32)
    with InferenceServer(pipe, scfg) as server:
        server.warmup(seconds_per_bucket=[seconds])
        futs = [server.submit(wav8s, "a fairly happy person", seed=0)
                for _ in range(32)]
        for f in futs:
            f.result()
        pct = server.latency_percentiles()
        served_audio = 32 * seconds
        # all requests submitted at once -> the slowest request's latency is
        # the wall time for the whole served load
        wall = max(server.stats["latency_ms"]) / 1e3
    _emit("serving_p50_ms", round(pct["p50"], 1), "ms_per_8s_clip_served")
    _emit("serving_throughput", round(served_audio / wall, 1),
          "s_audio_per_s_compute_served")

    # ---- Pallas key-bias attention vs XLA (wav2vec2 encoder hot spot) ----
    from avi_talking_tpu.ops.pallas.attention import fused_keybias_attention

    Ba, Ha, Ta, da = 16, 12, 552, 64
    arng = np.random.default_rng(5)
    qa = jnp.asarray(arng.standard_normal((Ba, Ha, Ta, da)), dtype) / (da ** 0.5)
    ka = jnp.asarray(arng.standard_normal((Ba, Ha, Ta, da)), dtype)
    va = jnp.asarray(arng.standard_normal((Ba, Ha, Ta, da)), dtype)
    kb = jnp.asarray(
        np.where(np.arange(Ta)[None] < arng.integers(Ta // 2, Ta, Ba)[:, None],
                 0.0, -1e9).astype(np.float32))

    @jax.jit
    def xla_attn(q, k, v, kb):
        s = jnp.einsum("bhtd,bhsd->bhts", q, k,
                       preferred_element_type=jnp.float32)
        s = s + kb[:, None, None, :]
        return jnp.einsum("bhts,bhsd->bhtd",
                          jax.nn.softmax(s, axis=-1).astype(q.dtype), v)

    def t_fn(fn, n=30):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n * 1e3

    t_xa = t_fn(lambda: xla_attn(qa, ka, va, kb))
    t_pa = t_fn(lambda: fused_keybias_attention(qa, ka, va, kb))
    _emit("attn_encoder_xla_ms", round(t_xa, 3), "ms")
    _emit("attn_encoder_pallas_ms", round(t_pa, 3), "ms", round(t_xa / t_pa, 2))

    # ---- Pallas rasterizer vs XLA binned (render-loss hot path) ----------
    from avi_talking_tpu.core.projection import batch_orth_proj
    from avi_talking_tpu.viz.rasterizer import (
        rasterize_binned,
        rasterize_binned_pallas,
    )

    fcs = jnp.asarray(assets.faces)
    proj = batch_orth_proj(
        jnp.asarray(assets.v_template)[None], jnp.asarray([[8.0, 0.0, -0.01]])
    )[0]
    ndc = jnp.stack([proj[:, 0], -proj[:, 1], -proj[:, 2]], axis=-1)
    nrm = jnp.asarray(
        np.random.default_rng(2).standard_normal((5023, 3)).astype(np.float32))

    def t_raster(fn, n=20):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n * 1e3

    t_x = t_raster(jax.jit(
        lambda: rasterize_binned(ndc, fcs, nrm, 256, 256, tile=32, cap=1024)))
    t_p = t_raster(jax.jit(
        lambda: rasterize_binned_pallas(ndc, fcs, nrm, 256, 256, tile=32,
                                        cap=1024)))
    _emit("raster_256_xla_binned_ms", round(t_x, 2), "ms_per_frame")
    _emit("raster_256_pallas_ms", round(t_p, 2), "ms_per_frame",
          round(t_x / t_p, 2))


if __name__ == "__main__":
    main()
