"""Component breakdown of the neural-loss EMOTE train step.

The full neural step (render + EmoNet + lipread + video-emotion, condition
exchange doubled) runs at ~20 frames/s (scripts/profile_train.py --neural).
Trace-viewer tooling is unavailable on this box, so this script isolates
where the time goes by timing loss-term ablations of the SAME jitted step:

  geo        geometric losses only (no render)
  +render    render both videos, lipread term only at weight 0 is not
             representable -> instead each tower variant below includes the
             pred+gt renders, so (variant - geo) = render + that tower.
  lip / emo / vemo   exactly one tower enabled
  all        the bench configuration (all towers, condition exchange)
  all_noex   all towers, no condition exchange (halves rendered rows)

Timing follows CLAUDE.md: chained dependent steps, one float() sync at the
end; never the AOT executable path on axon.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--bt", default="2,32")
    ap.add_argument("--variants", default="geo,lip,emo,vemo,all,all_noex")
    ap.add_argument("--towers-bf16", action="store_true", default=True)
    ap.add_argument("--towers-fp32", dest="towers_bf16", action="store_false")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from avi_talking_tpu.core import FlameModel, synthetic_assets
    from avi_talking_tpu.models import EmoteConfig, EmoteTalkingHead
    from avi_talking_tpu.models.conditioning import StyleCondition
    from avi_talking_tpu.models.emoca import EmoNetLoss, EmotionRecognitionModule
    from avi_talking_tpu.models.lipread import LipReadingLoss, LipReadingNet
    from avi_talking_tpu.models.video_emotion import (
        VideoEmotionClassifier,
        VideoEmotionLoss,
    )
    from avi_talking_tpu.train.talking_head import NeuralLosses, TalkingHeadTrainer
    from avi_talking_tpu.viz.visualizer import FixedViewRenderer
    from scripts.profile_train import build_batch

    print(f"platform: {jax.devices()[0].platform} {jax.devices()[0].device_kind}")
    PEAK = 197e12

    cfg = EmoteConfig()
    Bn, Tn = (int(x) for x in args.bt.split(","))
    R = args.image_size
    assets = synthetic_assets(num_vertices=5023, n_shape=300, n_exp=50,
                              num_faces=9976)
    renderer = FixedViewRenderer(np.asarray(assets.faces), image_size=R)
    nkey = jax.random.PRNGKey(7)
    tdt = jnp.bfloat16 if args.towers_bf16 else jnp.float32
    lip_net = LipReadingNet(dtype=tdt)
    lip = LipReadingLoss(lip_net, lip_net.init(nkey, jnp.zeros((1, 2, 88, 88, 1))))
    emo_mod = EmotionRecognitionModule(n_expression=8, dtype=tdt)
    emo_vars = emo_mod.init(nkey, jnp.zeros((1, R, R, 3)))
    vemo_cls = VideoEmotionClassifier(n_classes=8, feature_dim=128, num_layers=1,
                                      nhead=8, input_dim=2048, dtype=tdt)
    vemo = VideoEmotionLoss(vemo_cls, vemo_cls.init(nkey, jnp.zeros((1, 4, 2048))))

    head = EmoteTalkingHead(cfg, flame_assets=assets, dtype=jnp.bfloat16)
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

    batch["gt_vertices"] = jax.vmap(decode)(batch["gt_exp"], batch["gt_jaw"])
    tx = optax.adamw(1e-4)

    def make(lw, ew, vw, disent):
        neural = None
        if lw or ew or vw:
            neural = NeuralLosses(
                renderer=renderer,
                lipread=lip, lipread_weight=lw,
                emonet=EmoNetLoss(emo_mod), emonet_variables=emo_vars,
                emotion_weight=ew,
                video_emotion=vemo, video_emotion_weight=vw,
            )
        return TalkingHeadTrainer(head=head, tx=tx, neural=neural,
                                  disentangle=disent)

    VAR = {
        "geo": (0, 0, 0, None),
        "lip": (1.0, 0, 0, None),
        "emo": (0, 1.0, 0, None),
        "vemo": (0, 0, 0.1, None),
        "all": (1.0, 1.0, 0.1, "condition_exchange"),
        "all_noex": (1.0, 1.0, 0.1, None),
    }
    results = {}
    for name in args.variants.split(","):
        lw, ew, vw, dis = VAR[name]
        trainer = make(lw, ew, vw, dis)
        step = jax.jit(trainer.train_step, donate_argnums=(0, 1))
        # donation consumes the buffers — give each variant its own copy
        p = jax.tree.map(jnp.copy, params)
        opt = tx.init(p)
        t0 = time.perf_counter()
        lowered = step.lower(p, opt, batch, jax.random.PRNGKey(0))
        compiled = lowered.compile()
        ct = time.perf_counter() - t0
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = ca.get("flops", float("nan"))
        byt = ca.get("bytes accessed", float("nan"))
        p, o, m = step(p, opt, batch, jax.random.PRNGKey(0))
        float(m["loss"])
        N = args.steps
        t0 = time.perf_counter()
        for i in range(N):
            p, o, m = step(p, o, batch, jax.random.PRNGKey(i))
        float(m["loss"])
        dt = (time.perf_counter() - t0) / N
        results[name] = dt
        print(f"{name:9s} step={dt*1e3:8.1f}ms  frames/s={Bn*Tn/dt:7.1f}  "
              f"flops={flops/1e9:8.1f}G  mfu={100*flops/dt/PEAK:5.1f}%  "
              f"bytes={byt/1e9:6.2f}G  bw={byt/dt/1e9:5.0f}GB/s  "
              f"compile={ct:5.1f}s", flush=True)
        del step, compiled, lowered, p, o, m, opt

    if "geo" in results:
        g = results["geo"]
        for name, dt in results.items():
            if name != "geo":
                print(f"  {name:9s} minus geo: {1e3*(dt-g):8.1f}ms")


if __name__ == "__main__":
    main()
