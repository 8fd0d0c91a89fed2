"""Training commands: train-emote (staged EMOTE) and train-flint
(motion-prior VAE/VQ)."""

from __future__ import annotations

import sys


def cmd_train_emote(args) -> int:
    """Staged EMOTE training loop (train/emote_driver.py): geometric stage
    then optional condition-exchange stage; synthetic batches without a data
    root (real MEAD batches via data.mead + batching)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..models.conditioning import StyleCondition
    from ..models.emote import EmoteConfig, EmoteTalkingHead
    from ..train.emote_driver import EmoteStage, train_emote

    cfg = EmoteConfig.tiny() if args.tiny else EmoteConfig()
    neural = None
    flame_assets = None
    if args.neural:
        # perceptual stage: differentiable render + frozen towers in-graph
        # (random-init without checkpoints — smoke semantics; real towers
        # come via the lipread/EmoNet importers)
        import jax.numpy as _jnp

        from ..core import synthetic_assets
        from ..core.assets import default_assets_path, load_flame_assets
        from ..models.emoca import EmoNetLoss, EmotionRecognitionModule
        from ..models.lipread import LipReadingLoss, LipReadingNet
        from ..models.video_emotion import (
            VideoEmotionClassifier,
            VideoEmotionLoss,
        )
        from ..train.talking_head import NeuralLosses
        from ..viz.visualizer import FixedViewRenderer

        if args.tiny:
            flame_assets = synthetic_assets(n_shape=cfg.n_shape,
                                            n_exp=cfg.flint.n_exp)
            R, lip = 24, 24
        else:
            npz = args.flame_npz if hasattr(args, "flame_npz") else None
            npz = npz or default_assets_path()
            flame_assets = (load_flame_assets(npz, cfg.n_shape, cfg.n_exp)
                            if npz else synthetic_assets(
                                num_vertices=5023, n_shape=cfg.n_shape,
                                n_exp=cfg.n_exp, num_faces=9976))
            R, lip = 224, 88
        import numpy as _np

        nkey = jax.random.PRNGKey(7)
        tower_dt = _jnp.bfloat16 if args.bf16 else _jnp.float32
        lip_net = LipReadingNet(dtype=tower_dt)
        emo_mod = EmotionRecognitionModule(n_expression=8, dtype=tower_dt)
        vemo = VideoEmotionClassifier(
            n_classes=8, feature_dim=32 if args.tiny else 128,
            num_layers=1, nhead=4 if args.tiny else 8, input_dim=2048,
            dtype=tower_dt)
        neural = NeuralLosses(
            renderer=FixedViewRenderer(_np.asarray(flame_assets.faces),
                                       image_size=R),
            lipread=LipReadingLoss(
                lip_net, lip_net.init(nkey, _jnp.zeros((1, 2, lip, lip, 1)))),
            lipread_weight=1.0,
            emonet=EmoNetLoss(emo_mod),
            emonet_variables=emo_mod.init(nkey, _jnp.zeros((1, R, R, 3))),
            emotion_weight=1.0,
            video_emotion=VideoEmotionLoss(
                vemo, vemo.init(nkey, _jnp.zeros((1, 4, 2048)))),
            video_emotion_weight=0.1,
        )
        print("train-emote --neural: perception towers are RANDOM-init "
              "(import real lipread/EmoNet checkpoints for product runs)",
              file=sys.stderr)
    head = EmoteTalkingHead(
        cfg, flame_assets=flame_assets,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    B, T = args.batch_size, args.frames - args.frames % cfg.flint.latent_frame_size

    if args.root:
        # real MEAD/EMOCA data root (data_loader.py:229-374 equivalent)
        from ..data import MeadEmocaDataset
        from ..data.train_batches import EmoteBatchBuilder, emote_batches

        ds = MeadEmocaDataset(root=args.root, seq_length=T)
        builder = EmoteBatchBuilder(
            ds, frames=T, n_exp=cfg.flint.n_exp, n_shape=cfg.n_shape)
        if len(builder) == 0:
            raise SystemExit(f"no usable MEAD clips under {args.root}")
        tr_b, va_b = builder.split(args.val_fraction)
        print(f"data root: {len(tr_b)} train / {len(va_b)} val clips")
        batches = lambda: emote_batches(tr_b, min(B, len(tr_b)),  # noqa: E731
                                        epochs=None)
        vB = min(B, len(va_b))
        val_batches = lambda: emote_batches(  # noqa: E731
            va_b, vB, shuffle=False, epochs=1)
        first = next(emote_batches(tr_b, min(B, len(tr_b)), epochs=1))
    else:
        rng = np.random.default_rng(0)

        def synth(rng):
            while True:
                yield {
                    "raw_audio": jnp.asarray(
                        rng.standard_normal((B, T, 640)).astype(np.float32)),
                    "expression": jnp.asarray(
                        np.eye(9, dtype=np.float32)[rng.integers(0, 9, B)]),
                    "intensity": jnp.asarray(
                        np.eye(3, dtype=np.float32)[rng.integers(0, 3, B)]),
                    "identity": jnp.asarray(
                        np.eye(32, dtype=np.float32)[rng.integers(0, 32, B)]),
                    "shape": jnp.zeros((B, cfg.n_shape)),
                    "gt_exp": jnp.asarray(
                        rng.standard_normal((B, T, cfg.flint.n_exp)).astype(np.float32) * 0.1),
                    "gt_jaw": jnp.asarray(
                        rng.standard_normal((B, T, 3)).astype(np.float32) * 0.05),
                }

        batches = lambda: synth(rng)  # noqa: E731
        # DISJOINT synthetic val stream (not the first training batch):
        # early stop / best-val must not be measured on training data
        import itertools

        val_cached = list(itertools.islice(
            synth(np.random.default_rng(99_991)), 2))
        val_batches = lambda: iter(val_cached)  # noqa: E731
        first = next(synth(np.random.default_rng(0)))

    cond = StyleCondition(first["expression"], first["intensity"],
                          first["identity"], first.get("shape"))
    params = head.init(jax.random.PRNGKey(0), first["raw_audio"], cond)
    stages = [
        EmoteStage(name="geometric", steps=args.steps, lr=args.lr),
        EmoteStage(name="disentangled", steps=args.steps, lr=args.lr / 2,
                   disentangle="condition_exchange",
                   use_neural=neural is not None),
    ]
    res = train_emote(head, params, batches, stages=stages, neural=neural,
                      val_batches=val_batches,
                      val_every=args.val_every, run_dir=args.run_dir,
                      early_stop_patience=args.early_stop_patience)
    print(f"done: {res['total_steps']} steps, best val {res['best_val']:.4f}")
    return 0


def cmd_train_flint(args) -> int:
    """FLINT motion-prior (VAE / VQ-VAE) training — the reference's
    MotionPrior training app (inferno L2lVqVae; EMOTE's stage-0 prior).
    Synthetic motion without a data root; real MEAD motion windows
    (denormalised exp+jaw) via --root."""
    import numpy as np

    from ..models.flint import FlintConfig
    from ..train.driver import train_flint_vae

    fcfg = (FlintConfig(feature_dim=32, bottleneck_dim=32, quant_factor=2,
                        nhead=4, intermediate_size=64, out_dim=9, n_exp=6)
            if args.tiny else FlintConfig())
    B = args.batch_size
    T = args.frames - args.frames % fcfg.latent_frame_size

    if args.root:
        from ..data import MeadEmocaDataset
        from ..data.train_batches import EmoteBatchBuilder, emote_batches

        ds = MeadEmocaDataset(root=args.root, seq_length=T)
        builder = EmoteBatchBuilder(ds, frames=T, n_exp=fcfg.n_exp,
                                    n_shape=8 if args.tiny else 300)
        if len(builder) == 0:
            raise SystemExit(f"no usable MEAD clips under {args.root}")
        print(f"data root: {len(builder)} clips")

        def batches():
            for b in emote_batches(builder, min(B, len(builder)),
                                   epochs=None):
                yield np.concatenate([b["gt_exp"], b["gt_jaw"]], axis=-1)
    else:
        rng = np.random.default_rng(args.seed)

        def batches():
            while True:
                yield rng.standard_normal(
                    (B, T, fcfg.out_dim)).astype(np.float32) * 0.1

    res = train_flint_vae(
        batches(), total_steps=args.steps, flint_cfg=fcfg, lr=args.lr,
        logdir=args.logdir, ckpt_dir=args.ckpt_dir,
        quantizer="vq" if args.vq else None,
    )
    print("final:", res["metrics"])
    return 0


def register(sub, common):
    te = sub.add_parser("train-emote", help="staged EMOTE training loop")
    te.add_argument("--steps", type=int, default=200, help="steps per stage")
    te.add_argument("--batch-size", type=int, default=8)
    te.add_argument("--frames", type=int, default=64)
    te.add_argument("--lr", type=float, default=1e-4)
    te.add_argument("--val-every", type=int, default=50)
    te.add_argument("--early-stop-patience", type=int, default=0)
    te.add_argument("--run-dir", default=None)
    te.add_argument("--tiny", action="store_true")
    te.add_argument("--root", default=None,
                    help="EMOCA-preprocessed MEAD root; without it the loop "
                         "runs on synthetic batches")
    te.add_argument("--val-fraction", type=float, default=0.1,
                    help="held-out clip fraction of --root")
    te.add_argument("--neural", action="store_true",
                    help="enable the perceptual stage losses (render + "
                         "lipread/EmoNet/video-emotion towers in-graph); "
                         "gt meshes are decoded in-loss from the coeffs")
    te.add_argument("--bf16", action="store_true",
                    help="bfloat16 compute for the head and the frozen "
                         "perception towers (fp32 params; the measured "
                         "TPU training posture — see CLAUDE.md)")
    te.set_defaults(fn=cmd_train_emote)
    tl = sub.add_parser("train-flint",
                        help="FLINT motion-prior (VAE/VQ) training")
    tl.add_argument("--steps", type=int, default=200)
    tl.add_argument("--batch-size", type=int, default=32)
    tl.add_argument("--frames", type=int, default=64)
    tl.add_argument("--lr", type=float, default=1e-4)
    tl.add_argument("--root", default=None, help="MEAD/EMOCA data root")
    tl.add_argument("--vq", action="store_true", help="VQ-VAE mode")
    tl.add_argument("--logdir", default=None)
    tl.add_argument("--ckpt-dir", default=None)
    common(tl)
    tl.set_defaults(fn=cmd_train_flint)
