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


def _emit(metric, value, unit, vs_baseline=None, note=None):
    line = {"metric": metric, "value": value, "unit": unit}
    if vs_baseline is not None:
        line["vs_baseline"] = vs_baseline
    if note is not None:
        line["note"] = note
    print(json.dumps(line), flush=True)


def _probe_devices(timeout_s: float = 300.0):
    """Device discovery with a deadline: the axon tunnel has been observed
    to hang `jax.devices()` indefinitely during outages — emit an explicit
    error metric instead of stalling the bench harness forever."""
    import os
    import sys
    import threading

    box = []

    def probe():
        import jax

        box.append(jax.devices())

    t = threading.Thread(target=probe, daemon=True)  # daemon: a hung
    t.start()  # device query must not block interpreter exit
    t.join(timeout_s)
    if not box:
        _emit("bench_unavailable", 1, "tpu_device_discovery_timed_out",
              note=f"jax.devices() exceeded {timeout_s:.0f}s — axon tunnel "
                   "down; no perf numbers this run")
        sys.stdout.flush()
        os._exit(2)
    return box[0]


def main():
    _probe_devices()
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
    # supervises coeffs; keeps the step comparable across rounds).
    # B=16 is the measured MFU sweet spot (scripts/profile_train.py sweep:
    # 36% at B=8, 43% at B=16, falls off B>=32 as achieved HBM bandwidth
    # drops); params stay fp32 (production training semantics — bf16
    # params+Adam state buy only ~1% more).
    train_head = EmoteTalkingHead(cfg, dtype=dtype)
    Bt = 16
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
    opt = tx.init(tparams)
    # donated buffers (params/opt aliased in place); executed via the
    # normal jit path — the AOT compiled-executable path must not be used
    # for execution on axon (arrays never become ready, D2H fails)
    step = jax.jit(trainer.train_step, donate_argnums=(0, 1))
    ca = step.lower(tparams, opt, batch, jax.random.PRNGKey(0)) \
             .compile().cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    # honest FLOP count from the compiled HLO (verdict r2: the 6*N*B*T
    # estimate treated every parameter as dense per frame token)
    train_flops = float(ca.get("flops", 0.0))
    tparams, opt, m = step(tparams, opt, batch, jax.random.PRNGKey(0))
    float(m["loss"])  # warmup + full host sync
    # chained timing: N dependent steps dispatched back-to-back, ONE host
    # sync at the end — how a real training loop runs. Per-iteration
    # blocking would add the ~35 ms tunnel round-trip to every step.
    n = 10
    t0 = time.perf_counter()
    for i in range(n):
        tparams, opt, m = step(tparams, opt, batch, jax.random.PRNGKey(i))
    float(m["loss"])
    step_s = (time.perf_counter() - t0) / n
    frames_per_s = Bt * T / step_s
    _emit("train_step_frames_per_s", round(frames_per_s, 1), "frames_per_s")
    _emit("train_mfu_pct",
          round(100.0 * train_flops / step_s / V5E_BF16_PEAK_FLOPS, 2),
          "pct_of_v5e_bf16_peak_hlo_flops")

    # ---- neural-loss train step (render + perception towers in-graph) ----
    from avi_talking_tpu.core import FlameModel
    from avi_talking_tpu.models.emoca import EmoNetLoss, EmotionRecognitionModule
    from avi_talking_tpu.models.lipread import LipReadingLoss, LipReadingNet
    from avi_talking_tpu.models.video_emotion import (
        VideoEmotionClassifier,
        VideoEmotionLoss,
    )
    from avi_talking_tpu.train.talking_head import NeuralLosses
    from avi_talking_tpu.viz.visualizer import FixedViewRenderer

    R = 224  # the reference trains its render losses at 224^2
    renderer = FixedViewRenderer(np.asarray(assets.faces), image_size=R)
    nkey = jax.random.PRNGKey(7)
    # frozen perceptual towers run in bf16 (fp32 params, bf16 compute —
    # measured tower speedup in scripts/profile_neural_breakdown.py)
    lip_net = LipReadingNet(dtype=dtype)
    emo_mod = EmotionRecognitionModule(n_expression=8, dtype=dtype)
    vemo_cls = VideoEmotionClassifier(n_classes=8, feature_dim=128,
                                      num_layers=1, nhead=8, input_dim=2048,
                                      dtype=dtype)
    neural = NeuralLosses(
        renderer=renderer,
        lipread=LipReadingLoss(
            lip_net, lip_net.init(nkey, jnp.zeros((1, 2, 88, 88, 1)))),
        lipread_weight=1.0,
        emonet=EmoNetLoss(emo_mod),
        emonet_variables=emo_mod.init(nkey, jnp.zeros((1, R, R, 3))),
        emotion_weight=1.0,
        video_emotion=VideoEmotionLoss(
            vemo_cls, vemo_cls.init(nkey, jnp.zeros((1, 4, 2048)))),
        video_emotion_weight=0.1,
    )
    nhead_model = EmoteTalkingHead(cfg, flame_assets=assets, dtype=dtype)
    Bn, Tn = 2, 32
    nbatch = {k: (v[:Bn, :Tn] if getattr(v, "ndim", 0) >= 2 and
                  v.shape[:1] == (Bt,) and v.shape[1] == T else v[:Bn])
              for k, v in batch.items()}
    ncond = StyleCondition(nbatch["expression"], nbatch["intensity"],
                           nbatch["identity"], nbatch["shape"])
    nparams = nhead_model.init(jax.random.PRNGKey(0), nbatch["raw_audio"], ncond)
    flame = FlameModel(assets, n_shape=cfg.n_shape, n_exp=cfg.n_exp)

    def _decode(exp_t, jaw_t):
        Tl = exp_t.shape[0]
        shape_t = jnp.broadcast_to(nbatch["shape"][0], (Tl, cfg.n_shape))
        pose = jnp.concatenate([jnp.zeros((Tl, 3)), jaw_t], axis=1)
        return flame.vertices_only(shape_t, exp_t, pose)

    nbatch["gt_vertices"] = jax.vmap(_decode)(nbatch["gt_exp"], nbatch["gt_jaw"])
    ntrainer = TalkingHeadTrainer(head=nhead_model, tx=tx, neural=neural,
                                  disentangle="condition_exchange")
    nopt = tx.init(nparams)
    nstep = jax.jit(ntrainer.train_step, donate_argnums=(0, 1))
    nparams, nopt, m = nstep(nparams, nopt, nbatch, jax.random.PRNGKey(0))
    float(m["loss"])
    n = 5
    t0 = time.perf_counter()
    for i in range(n):
        nparams, nopt, m = nstep(nparams, nopt, nbatch, jax.random.PRNGKey(i))
    float(m["loss"])
    nstep_s = (time.perf_counter() - t0) / n
    _emit("train_step_neural_frames_per_s", round(Bn * Tn / nstep_s, 1),
          "frames_per_s_render224_b2t32")

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
    # soak x5 (r4 verdict item 3: median-of-3 with +-87 ms spread could not
    # separate a real regression from tunnel noise) -> median + spread +
    # per-stage breakdown (queue wait / host framing / prep+H2D /
    # device+fetch) so the p50 number is attributable, not just observed.
    # Offered load is pinned: 32 requests at once, 8 s clips, max_batch 8.
    # NOTE: random weights + (if assets/clip_tokenizer is absent) the hash
    # tokenizer — tokenization cost is negligible either way, so the
    # latency/throughput numbers stand for real-weight serving too.
    p50s, thrps, breakdowns = [], [], []
    with InferenceServer(pipe, scfg) as server:
        server.warmup(seconds_per_bucket=[seconds])
        for rep in range(5):
            server.clear_stats()
            futs = [server.submit(wav8s, "a fairly happy person", seed=0)
                    for _ in range(32)]
            for f in futs:
                f.result()
            pct = server.latency_percentiles()
            served_audio = 32 * seconds
            # all requests submitted at once -> the slowest request's
            # latency is the wall time for the whole served load
            wall = max(server.stats["latency_ms"]) / 1e3
            p50s.append(pct["p50"])
            thrps.append(served_audio / wall)
            breakdowns.append(server.stage_breakdown())
    _emit("serving_p50_ms", round(float(np.median(p50s)), 1),
          "ms_per_8s_clip_served_median_of_5",
          note="random weights; hash tokenizer unless assets/clip_tokenizer"
               " is vendored (tokenization cost negligible either way)")
    _emit("serving_p50_spread_ms",
          round(float(np.max(p50s) - np.min(p50s)), 1),
          "ms_max_minus_min_of_5")
    _emit("serving_throughput", round(float(np.median(thrps)), 1),
          "s_audio_per_s_compute_served_median_of_5")
    for key in ("queue_wait_ms", "framing_ms", "style_dispatch_ms",
                "prep_ms", "device_fetch_ms"):
        _emit(f"serving_stage_{key}",
              round(float(np.median([b[key] for b in breakdowns])), 1),
              "ms_median_of_5_medians")

    # ---- preprocessing throughput (EmocaEncoder pseudo-GT extraction) ----
    # the raw-video -> pseudo-GT pipeline's hot stage at the reference's
    # 224^2 crop size (data/preprocess.py). Transfer-bound on this
    # tunnel-attached chip (~35 MB/s H2D measured): the metrics separate
    # the wire formats — uint8 (what preprocess-mead ships from PNG crops),
    # packed yuv420p (what video ingestion streams from the decoder,
    # 1.5 B/px, zero host pixel work) and the device-resident compute
    # ceiling a PCIe-attached deployment would see. r4's 29.2 fps was the
    # fp32-wire + sync-per-chunk pattern.
    from avi_talking_tpu.data.preprocess import EmocaPreprocessor
    from avi_talking_tpu.data.yuv import rgb_to_yuv420
    from avi_talking_tpu.models.emoca import EmocaEncoder

    enc = EmocaEncoder(n_exp=50)
    evars = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    pframes = np.random.default_rng(9).integers(
        0, 256, (128, 224, 224, 3), dtype=np.uint8)
    ppacked = rgb_to_yuv420(pframes)
    r4_fps = 29.2  # BENCH_r04 preprocess_encode_frames_per_s

    pre = EmocaPreprocessor(encoder=enc, variables=evars, max_b=32)
    pre.encode_frames(pframes[:64])  # warmup (compiles the chunk exe)
    nrep = 3
    t0 = time.perf_counter()
    for _ in range(nrep):
        pre.encode_frames(pframes)
    fps_u8 = 128 * nrep / (time.perf_counter() - t0)
    _emit("preprocess_encode_frames_per_s", round(fps_u8, 1),
          "frames_per_s_224_maxb32_u8wire", round(fps_u8 / r4_fps, 2))

    pre.encode_packed_yuv420(ppacked[:64], 224, 224)  # warmup
    t0 = time.perf_counter()
    for _ in range(nrep):
        pre.encode_packed_yuv420(ppacked, 224, 224)
    fps_yuv = 128 * nrep / (time.perf_counter() - t0)
    _emit("preprocess_encode_yuv420_frames_per_s", round(fps_yuv, 1),
          "frames_per_s_224_maxb32_videowire", round(fps_yuv / r4_fps, 2))

    # device-resident ceiling: chained dispatches, one scalar sync
    enc_app = jax.jit(lambda v, x: enc.apply(v, x, train=False))
    xdev = jax.device_put(pframes[:32].astype(np.float32) / 255.0)
    jax.block_until_ready(enc_app(evars, xdev))

    def _enc_chain(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = enc_app(evars, xdev)
        float(jax.tree.leaves(o)[0][0, 0])  # real D2H sync
        return time.perf_counter() - t0

    _enc_chain(3)
    dt = (_enc_chain(20) - _enc_chain(5)) / 15
    _emit("preprocess_encode_device_frames_per_s", round(32 / dt, 1),
          "frames_per_s_224_deviceresident_b32")

    # full detect -> crop -> parse -> encode chain (the whole
    # preprocess-mead --full-frames job) on synthetic 480x270 full frames:
    # SFD boxes -> FAN landmarks (256^2 stage-1 crops) -> track smoothing ->
    # 224^2 warp-crop -> BiSeNet masks -> EmocaEncoder codes. Wire-bound:
    # full frames cross H2D three times (SFD, stage-1 warp, final warp) —
    # the known next lever if this stage ever dominates again.
    def _chain_section():
        from avi_talking_tpu.data.facecrop import (
            bbox2point_kpt68,
            detect_fullframe_landmarks,
            smooth_track,
            warp_crop,
        )
        from avi_talking_tpu.models.bisenet import BiSeNet, FaceParser
        from avi_talking_tpu.models.fan_landmarks import (
            FanLandmarkDetector,
            FanLandmarkNet,
        )
        from avi_talking_tpu.models.sfd import S3FD, SfdDetector

        Tc, Hc, Wc = 32, 270, 480
        full = np.random.default_rng(11).integers(
            0, 256, (Tc, Hc, Wc, 3), dtype=np.uint8)
        sfd = SfdDetector(
            S3FD().init(jax.random.PRNGKey(3), jnp.zeros((1, Hc, Wc, 3))),
            max_b=8)
        fan = FanLandmarkNet(num_modules=1, depth=2, stem_features=16,
                             features=32)
        det = FanLandmarkDetector(
            fan, fan.init(jax.random.PRNGKey(4), jnp.zeros((1, 256, 256, 3))),
            max_b=16, input_size=256)
        parser = FaceParser(
            BiSeNet().init(jax.random.PRNGKey(5), jnp.zeros((1, 128, 128, 3))),
            size=128, max_b=16)

        def chain():
            lmk_px, scores = detect_fullframe_landmarks(
                det, full, box_detector=sfd)
            old_size, center = bbox2point_kpt68(lmk_px)
            size = (old_size * 1.25).astype(np.float32)
            center, size = smooth_track(
                center, size, validity=np.clip(scores.mean(-1), 0, None))
            crops = warp_crop(full, center, size, 224, out_u8=True)
            pre.encode_frames(crops)
            parser(crops)

        chain()  # warmup
        ts = []
        for _ in range(3):  # host-orchestrated multi-dispatch pipeline:
            t0 = time.perf_counter()  # single-shot timing is tunnel-noise-
            chain()  # dominated (observed 1.9-4.6 s for the same work)
            ts.append(time.perf_counter() - t0)
        _emit("preprocess_chain_frames_per_s",
              round(Tc / float(np.median(ts)), 1),
              "frames_per_s_sfd_fan_crop_parse_encode_480x270_median_of_3")

    try:
        _chain_section()
    except Exception as e:  # pragma: no cover - TPU-compiler-dependent
        _emit("preprocess_chain_error", 1, "error", note=repr(e)[:300])

    # ---- Pallas key-bias attention vs XLA (wav2vec2 encoder hot spot) ----
    # Fault-isolated: a Mosaic/kernel regression must not kill the whole
    # bench (r4: the head-batched grid SIGABRT'd the TPU compile helper and
    # took every downstream metric with it). Scope of this isolation: it
    # catches failures that surface as PYTHON EXCEPTIONS (on this axon
    # setup Mosaic compiles run in a helper subprocess whose abort comes
    # back as an exception). A compiler that aborts IN-process (signal)
    # would still kill the interpreter — if that ever reappears, move the
    # section into a fork+exitcode child.
    def _attn_section():
        from avi_talking_tpu.ops.pallas.attention import fused_keybias_attention

        Ba, Ha, Ta, da = 16, 12, 552, 64
        arng = np.random.default_rng(5)

        @jax.jit
        def xla_attn(q, k, v, kb):
            s = jnp.einsum("bhtd,bhsd->bhts", q, k,
                           preferred_element_type=jnp.float32)
            s = s + kb[:, None, None, :]
            return jnp.einsum("bhts,bhsd->bhtd",
                              jax.nn.softmax(s, axis=-1).astype(q.dtype), v)

        def t_chain(fn, q, k, v, kb, n1=40, n2=200):
            """Two dependent-chain lengths (out feeds next q, rescaled by
            1/sqrt(d) so chained score magnitudes stay in the nominal
            serving regime instead of saturating the softmax — FLOPs and
            traffic are unchanged either way), differenced: cancels the
            tunnel RTT + D2H fetch, leaving per-step device time.
            Independent-dispatch timing reads ~RTT/n for kernels this
            small (30 x 0.45 ms < one 35 ms round trip) and once measured
            both sides at a bogus ~2.1 ms here. Returns (ms, reliable):
            under tunnel-load spikes run(n2)-run(n1) can go negative —
            that run is flagged, not clamped into a fake ratio."""
            scale = jnp.asarray(da ** -0.5, q.dtype)

            def run(n):
                t0 = time.perf_counter()
                x = q
                for _ in range(n):
                    x = fn(x, k, v, kb) * scale
                float(x[0, 0, 0, 0])  # real D2H sync (block_until_ready
                # can return early through the axon tunnel)
                return time.perf_counter() - t0
            run(3)
            ms = (run(n2) - run(n1)) / (n2 - n1) * 1e3
            return max(ms, 1e-6), ms > 0

        def shapes(B, T):
            q = jnp.asarray(
                arng.standard_normal((B, Ha, T, da)), dtype) / (da ** 0.5)
            k = jnp.asarray(arng.standard_normal((B, Ha, T, da)), dtype)
            v = jnp.asarray(arng.standard_normal((B, Ha, T, da)), dtype)
            kb = jnp.asarray(np.where(
                np.arange(T)[None] < arng.integers(T // 2, T, B)[:, None],
                0.0, -1e9).astype(np.float32))
            return q, k, v, kb

        def emit_pair(tag, t_x, ok_x, t_p, ok_p):
            note = None if (ok_x and ok_p) else (
                "unreliable: differenced chain went non-positive under "
                "tunnel load; ratio not meaningful this run")
            _emit(f"attn_{tag}_xla_ms", round(t_x, 3), "ms", note=note)
            _emit(f"attn_{tag}_pallas_ms", round(t_p, 3), "ms",
                  round(t_x / t_p, 2) if (ok_x and ok_p) else None,
                  note=note)

        qa, ka, va, kba = shapes(Ba, Ta)
        t_xa, ok_xa = t_chain(xla_attn, qa, ka, va, kba)
        t_pa, ok_pa = t_chain(fused_keybias_attention, qa, ka, va, kba)
        emit_pair("encoder", t_xa, ok_xa, t_pa, ok_pa)

        # flagship serving shape (B=4 T=200): XLA's fusion wins here — the
        # auto-gate keeps Pallas off below B*H*T = 48k (VERDICT #8 verdict:
        # head-batching retired, see _attn_kernel_keybias docstring)
        qs, ks, vs, kbs = shapes(4, 200)
        t_xs, ok_xs = t_chain(xla_attn, qs, ks, vs, kbs)
        t_ps, ok_ps = t_chain(fused_keybias_attention, qs, ks, vs, kbs)
        emit_pair("serving", t_xs, ok_xs, t_ps, ok_ps)

    try:
        _attn_section()
    except Exception as e:  # pragma: no cover - TPU-compiler-dependent
        _emit("attn_section_error", 1, "error", note=repr(e)[:300])

    # ---- Pallas rasterizer vs XLA binned (render-loss hot path) ----------
    def _raster_section():
        from avi_talking_tpu.core.projection import batch_orth_proj
        from avi_talking_tpu.viz.rasterizer import (
            rasterize_binned,
            rasterize_binned_pallas,
        )

        fcs = jnp.asarray(assets.faces)
        proj = batch_orth_proj(
            jnp.asarray(assets.v_template)[None],
            jnp.asarray([[8.0, 0.0, -0.01]]),
        )[0]
        ndc = jnp.stack([proj[:, 0], -proj[:, 1], -proj[:, 2]], axis=-1)
        nrm = jnp.asarray(np.random.default_rng(2)
                          .standard_normal((5023, 3)).astype(np.float32))

        def t_raster(fn, n=20):
            # n x ~5-10 ms device time >> one tunnel RTT, so independent
            # dispatch is honest here; the float() is a real D2H sync.
            def sync(out):
                float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
            sync(fn())
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = fn()
            sync(out)
            return (time.perf_counter() - t0) / n * 1e3

        t_x = t_raster(jax.jit(lambda: rasterize_binned(
            ndc, fcs, nrm, 256, 256, tile=32, cap=1024)))
        t_p = t_raster(jax.jit(lambda: rasterize_binned_pallas(
            ndc, fcs, nrm, 256, 256, tile=32, cap=1024)))
        _emit("raster_256_xla_binned_ms", round(t_x, 2), "ms_per_frame")
        _emit("raster_256_pallas_ms", round(t_p, 2), "ms_per_frame",
              round(t_x / t_p, 2))

    try:
        _raster_section()
    except Exception as e:  # pragma: no cover - TPU-compiler-dependent
        _emit("raster_section_error", 1, "error", note=repr(e)[:300])


if __name__ == "__main__":
    main()
