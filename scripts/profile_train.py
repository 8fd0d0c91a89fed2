"""Profile the EMOTE train step on the real TPU: where does the time go?

Verdict r2 weak-item 1: train MFU was 14.9% with a crude 6*N*B*T FLOP
model and no profile. This script
  * computes the HONEST FLOP count via compiled cost_analysis,
  * times the geometric step across batch sizes and optimisation levers
    (donated buffers, bf16 params, remat),
  * times the neural-loss step (render + perception towers in-graph),
  * optionally captures a jax.profiler trace (--trace <dir>).

Run on the TPU (default platform):  python scripts/profile_train.py
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def build_batch(Bt, T, cfg, jnp):
    rngs = np.random.default_rng(1)
    return {
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None, help="profiler trace dir")
    ap.add_argument("--batches", default="8,16,32,64")
    ap.add_argument("--seconds", type=int, default=8)
    ap.add_argument("--neural", action="store_true",
                    help="also profile the neural-loss step")
    ap.add_argument("--neural-only", action="store_true",
                    help="skip the geometric sweep; profile only the "
                         "neural-loss step (implies --neural)")
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from avi_talking_tpu.models import EmoteConfig, EmoteTalkingHead
    from avi_talking_tpu.models.conditioning import StyleCondition
    from avi_talking_tpu.train.talking_head import TalkingHeadTrainer

    print(f"platform: {jax.devices()[0].platform} {jax.devices()[0].device_kind}")
    PEAK = 197e12  # v5e bf16

    dtype = jnp.bfloat16
    cfg = EmoteConfig()
    T = args.seconds * 25

    def measure(Bt, donate, label, param_dtype=jnp.float32, trace=False):
        """Chained-steps timing: N dependent steps dispatched back-to-back,
        ONE host sync (float(loss)) at the end. Per-iteration
        block_until_ready would add the axon tunnel round-trip (~35 ms) to
        every step, and the AOT compiled-executable path must NOT be used
        for execution on axon (its arrays never become ready and D2H
        fails) — cost_analysis only."""
        head = EmoteTalkingHead(cfg, dtype=dtype, param_dtype=param_dtype)
        batch = build_batch(Bt, T, cfg, jnp)
        cond = StyleCondition(batch["expression"], batch["intensity"],
                              batch["identity"], batch["shape"])
        params = head.init(jax.random.PRNGKey(0), batch["raw_audio"], cond)
        tx = optax.adamw(1e-4)
        trainer = TalkingHeadTrainer(head=head, tx=tx)
        opt = tx.init(params)
        rng = jax.random.PRNGKey(0)
        step = jax.jit(trainer.train_step,
                       donate_argnums=(0, 1) if donate else ())
        ca = step.lower(params, opt, batch, rng).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = ca.get("flops", float("nan"))
        bytes_acc = ca.get("bytes accessed", float("nan"))
        p, o, m = step(params, opt, batch, rng)
        float(m["loss"])  # warmup + full sync
        N = args.steps
        t0 = time.perf_counter()
        for i in range(N):
            p, o, m = step(p, o, batch, jax.random.PRNGKey(i))
        float(m["loss"])  # single end-of-chain sync
        dt = (time.perf_counter() - t0) / N
        if trace and args.trace:
            with jax.profiler.trace(args.trace):
                for i in range(3):
                    p, o, m = step(p, o, batch, jax.random.PRNGKey(i))
                float(m["loss"])
        mfu = 100.0 * flops / dt / PEAK
        ai = flops / bytes_acc if bytes_acc else float("nan")
        bw = bytes_acc / dt / 1e9
        print(f"{label:42s} B={Bt:3d} step={dt * 1e3:8.2f}ms "
              f"frames/s={Bt * T / dt:9.0f} "
              f"flops={flops / 1e9:8.1f}G mfu={mfu:5.1f}% "
              f"AI={ai:6.1f} flop/B bw={bw:6.0f}GB/s")
        return dt, flops, bytes_acc

    if not args.neural_only:
        for Bt in [int(b) for b in args.batches.split(",")]:
            measure(Bt, donate=False, label="geometric fp32-params")
        B0 = int(args.batches.split(",")[0])
        measure(B0, donate=True, label="geometric fp32-params donated")
        measure(B0, donate=True, label="geometric bf16-params donated",
                param_dtype=jnp.bfloat16)
        Blast = int(args.batches.split(",")[-1])
        measure(Blast, donate=True, label="geometric fp32-params donated",
                trace=True)

    if args.neural or args.neural_only:
        from avi_talking_tpu.core import FlameModel, synthetic_assets
        from avi_talking_tpu.models.emoca import (
            EmoNetLoss,
            EmotionRecognitionModule,
        )
        from avi_talking_tpu.models.lipread import LipReadingLoss, LipReadingNet
        from avi_talking_tpu.models.video_emotion import (
            VideoEmotionClassifier,
            VideoEmotionLoss,
        )
        from avi_talking_tpu.train.talking_head import NeuralLosses
        from avi_talking_tpu.viz.visualizer import FixedViewRenderer

        assets = synthetic_assets(num_vertices=5023, n_shape=300, n_exp=50,
                                  num_faces=9976)
        R = 224
        renderer = FixedViewRenderer(np.asarray(assets.faces), image_size=R)
        nkey = jax.random.PRNGKey(7)
        # frozen towers in bf16, matching bench.py's neural config
        lip_net = LipReadingNet(dtype=jnp.bfloat16)
        emo_mod = EmotionRecognitionModule(n_expression=8,
                                           dtype=jnp.bfloat16)
        vemo_cls = VideoEmotionClassifier(n_classes=8, feature_dim=128,
                                          num_layers=1, nhead=8,
                                          input_dim=2048,
                                          dtype=jnp.bfloat16)
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
        head = EmoteTalkingHead(cfg, flame_assets=assets, dtype=dtype)
        Bn, Tn = 2, 32  # neural step is render-dominated; small B*T
        batch = build_batch(Bn, Tn, cfg, jnp)
        cond = StyleCondition(batch["expression"], batch["intensity"],
                              batch["identity"], batch["shape"])
        params = head.init(jax.random.PRNGKey(0), batch["raw_audio"], cond)
        flame = FlameModel(assets, n_shape=cfg.n_shape, n_exp=cfg.n_exp)

        def decode(exp_t, jaw_t):
            Tl = exp_t.shape[0]
            shape_t = jnp.broadcast_to(batch["shape"][0], (Tl, cfg.n_shape))
            pose = jnp.concatenate([jnp.zeros((Tl, 3)), jaw_t], axis=1)
            return flame.vertices_only(shape_t, exp_t, pose)

        batch["gt_vertices"] = jax.vmap(decode)(batch["gt_exp"],
                                                batch["gt_jaw"])
        tx = optax.adamw(1e-4)
        trainer = TalkingHeadTrainer(head=head, tx=tx, neural=neural,
                                     disentangle="condition_exchange")
        opt = tx.init(params)
        step = jax.jit(trainer.train_step, donate_argnums=(0, 1))
        t0 = time.perf_counter()
        ca = step.lower(params, opt, batch,
                        jax.random.PRNGKey(0)).compile().cost_analysis()
        print(f"neural step compile: {time.perf_counter() - t0:.1f}s")
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = ca.get("flops", float("nan"))
        p, o, m = step(params, opt, batch, jax.random.PRNGKey(0))
        float(m["loss"])  # warmup sync (jit path, NOT the AOT handle)
        N = args.steps
        t0 = time.perf_counter()
        for i in range(N):
            p, o, m = step(p, o, batch, jax.random.PRNGKey(i))
        float(m["loss"])
        dt = (time.perf_counter() - t0) / N
        print(f"neural-loss step (render {R}^2, B={Bn} T={Tn}): "
              f"{dt * 1e3:.1f}ms  frames/s={Bn * Tn / dt:.1f} "
              f"flops={flops / 1e9:.1f}G mfu={100 * flops / dt / PEAK:.1f}%")
        if args.trace:
            with jax.profiler.trace(args.trace):
                p, o, m = step(p, o, batch, jax.random.PRNGKey(9))
                float(m["loss"])


if __name__ == "__main__":
    main()
