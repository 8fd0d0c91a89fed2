"""train-faceformer: stage-1 coefficient-space FaceFormer training."""

from __future__ import annotations

import sys


def cmd_train_faceformer(args) -> int:
    """Stage-1 FaceFormer training loop (synthetic batches without a data
    root; MEAD/EMOCA root via --root)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ..core import FlameModel, synthetic_assets
    from ..core.assets import default_assets_path, load_flame_assets
    from ..models import FaceFormerCoeff, FaceFormerConfig
    from ..train.faceformer_trainer import FaceFormerTrainer

    if args.tiny:
        cfg = FaceFormerConfig.tiny()
        assets = synthetic_assets(n_shape=8, n_exp=6)
        flame = FlameModel(assets, n_shape=8, n_exp=6)
    else:
        cfg = FaceFormerConfig()
        npz = args.flame_npz or default_assets_path()
        flame = None
        if npz:
            assets = load_flame_assets(npz, 100, 50)
            flame = FlameModel(assets, n_shape=100, n_exp=50)
    model = FaceFormerCoeff(cfg)
    render_loss = None  # set by --render-loss under --root

    rng = np.random.default_rng(args.seed)
    B, T = args.batch_size, args.seq_length

    def batch():
        out = {
            "audio": jnp.asarray(rng.standard_normal((B, T * 640)).astype(np.float32)),
            "coeff": jnp.asarray(rng.standard_normal((B, T, cfg.vertice_dim)).astype(np.float32) * 0.3),
        }
        if cfg.with_condition_merge:
            out["eye_embed"] = jnp.asarray(rng.standard_normal((B, T, cfg.eye_dim)).astype(np.float32))
            out["emo_embed"] = jnp.asarray(rng.standard_normal((B, T, cfg.emo_dim)).astype(np.float32))
            out["ref_coeff"] = jnp.asarray(rng.standard_normal((B, 1, cfg.vertice_dim)).astype(np.float32))
        return out

    if args.root:
        from ..data import MeadEmocaDataset, batch_iterator
        from ..data.train_batches import FaceFormerBatchBuilder, FanConditioner

        ds = MeadEmocaDataset(root=args.root, seq_length=T)
        builder = FaceFormerBatchBuilder(
            ds, frames=T, coeff_dim=cfg.vertice_dim,
            load_images=(cfg.with_condition_merge or args.render_loss
                         or args.emo_loss))
        if len(builder) == 0:
            raise SystemExit(f"no usable MEAD clips under {args.root}")
        batches = batch_iterator(
            builder, batch_size=min(B, len(builder)), epochs=None)

        conditioner = None
        if cfg.with_condition_merge:
            # in-loop FanEncoder conditioning over the decoded crops
            # (faceformer.py:334-373): eye embeds from raw frames, emo
            # embeds from lip-masked shuffled frames, ref style coeff
            from ..models import FanEncoder, fan_encoder_params_from_torch

            fan = FanEncoder()
            if args.fan_checkpoint:
                import torch as _torch

                sd = _torch.load(args.fan_checkpoint, map_location="cpu",
                                 weights_only=False)
                if isinstance(sd, dict) and "state_dict" in sd:
                    sd = sd["state_dict"]
                fan_vars = fan_encoder_params_from_torch(sd)
            else:
                fan_vars = fan.init(
                    jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
                print("train-faceformer: no --fan-checkpoint; the frozen "
                      "FanEncoder is RANDOM-init (smoke semantics)",
                      file=sys.stderr)
            conditioner = FanConditioner(fan, fan_vars, seed=args.seed)

        render_loss = None
        if args.render_loss or args.emo_loss:
            # stage-1 PIRender render loss (faceformer.py:488-566): warp/
            # final perceptual terms on the upper face, random-init
            # generator/VGG without checkpoints (smoke semantics; real
            # weights via pirender_params_from_torch). --emo-loss rides the
            # same generator forward (compute_emo_loss, faceformer.py:
            # 440-470); without --render-loss the perceptual weight is 0.
            from ..data.stats import CoeffStats
            from ..models.pirender import FaceGenerator, PIRenderConfig
            from ..train.perceptual import PerceptualLoss, Vgg19Features
            from ..train.render_loss import PIRenderRenderLoss

            probe = builder[0]
            if "img" not in probe:
                raise SystemExit(
                    "--render-loss needs detection crops under the data "
                    "root (EMOCA detections/*.png); none found")
            img_hw = probe["img"].shape[1:3]
            if args.tiny:
                pir_cfg = PIRenderConfig.tiny()
                vgg = Vgg19Features(taps=("relu_1_1",))
                def mk_ploss():
                    return PerceptualLoss(
                        vgg, layers=("relu_1_1",), num_scales=1)
            else:
                pir_cfg = PIRenderConfig()
                vgg = Vgg19Features()
                mk_ploss = lambda: PerceptualLoss(vgg)  # noqa: E731
            gen = FaceGenerator(pir_cfg)
            # descriptor = exp(d-3) | rot3+jaw3 | cam3 (59-d at full size)
            descr_dim = cfg.vertice_dim + 6
            gvars = gen.init(jax.random.PRNGKey(2),
                             jnp.zeros((1, *img_hw, 3)),
                             jnp.zeros((1, 27, descr_dim)))
            vgg_params = vgg.init(
                jax.random.PRNGKey(3), jnp.zeros((1, *img_hw, 3)))["params"]
            emonet = emonet_vars = None
            if args.emo_loss:
                from ..models.emoca import (
                    EmoNetLoss,
                    EmotionRecognitionModule,
                    emotion_module_params_from_torch,
                )

                emo_mod = EmotionRecognitionModule(n_expression=8)
                if args.emonet_checkpoint:
                    import torch as _torch

                    sd = _torch.load(args.emonet_checkpoint,
                                     map_location="cpu", weights_only=False)
                    if isinstance(sd, dict) and "state_dict" in sd:
                        sd = sd["state_dict"]
                    emonet_vars = emotion_module_params_from_torch(sd)
                else:
                    emonet_vars = emo_mod.init(
                        jax.random.PRNGKey(4), jnp.zeros((1, *img_hw, 3)))
                    print("train-faceformer: no --emonet-checkpoint; the "
                          "frozen EmoNet is RANDOM-init (smoke semantics)",
                          file=sys.stderr)
                emonet = EmoNetLoss(emo_mod)
            stats = ds.stats or CoeffStats.identity(59)
            render_loss = PIRenderRenderLoss(
                generator=gen, generator_params=gvars,
                perceptual_warp=mk_ploss(),
                perceptual_final=mk_ploss(),
                vgg_params=vgg_params,
                coeff_mean=jnp.asarray(stats.mean),
                coeff_std=jnp.asarray(stats.std),
                n_samples=2,
                emonet=emonet, emonet_vars=emonet_vars,
            )
            print("train-faceformer: --render-loss with RANDOM-init "
                  "PIRender/VGG towers (smoke semantics)", file=sys.stderr)

        def batch():  # noqa: F811 - data-backed override
            b = next(batches)
            out = {
                "audio": jnp.asarray(b["audio"]),
                "coeff": jnp.asarray(b["coeff"][..., : cfg.vertice_dim]),
            }
            if conditioner is not None or render_loss is not None:
                if "img" not in b or not hasattr(b["img"], "ndim"):
                    raise SystemExit(
                        "conditioning / render loss needs detection crops "
                        "under the data root (EMOCA detections/*.png)")
            if conditioner is not None:
                out.update(conditioner.condition(
                    np.asarray(b["img"]), np.asarray(b["coeff"])))
                out["ref_coeff"] = out["ref_coeff"][..., : cfg.vertice_dim]
            if render_loss is not None:
                out.update({
                    "pose": jnp.asarray(b["pose"]),
                    "cam": jnp.asarray(b["cam"]),
                    "img": jnp.asarray(b["img"]),
                    "ref_img": jnp.asarray(b.get("ref_img", b["img"])),
                })
            return out

    first = batch()
    params = model.init(
        jax.random.PRNGKey(0), first["audio"], first["coeff"],
        first.get("eye_embed"), first.get("emo_embed"), first.get("ref_coeff"),
    )
    tx = optax.adamw(args.lr)
    # synthetic tiny FLAME lacks the 68-point landmark embedding the lip/eye
    # losses index; geometric landmark losses need the real assets
    use_ldmk = flame is not None and not args.tiny
    trainer = FaceFormerTrainer(model=model, tx=tx,
                                flame=flame if use_ldmk else None,
                                coeff_mean=jnp.zeros(cfg.vertice_dim),
                                coeff_std=jnp.ones(cfg.vertice_dim),
                                render_loss_fn=render_loss,
                                render_weight=(0.015 if args.render_loss
                                               else 0.0))
    step = trainer.jitted_train_step(donate=True)
    opt = tx.init(params)
    import time as _t

    t0 = _t.time()
    for i in range(args.steps):
        params, opt, metrics = step(params, opt, batch(), jax.random.PRNGKey(i))
        if (i + 1) % 50 == 0:
            print(f"step {i+1}: " + " ".join(
                f"{k}={float(v):.4f}" for k, v in metrics.items()
            ) + f" ({(i+1)/(_t.time()-t0):.1f} it/s)")
    if args.ckpt_dir:
        from ..infra.checkpoint import save_checkpoint

        save_checkpoint(args.ckpt_dir, {"params": params})
    print("final:", {k: float(v) for k, v in metrics.items()})
    return 0


def register(sub, common):
    tf = sub.add_parser("train-faceformer", help="stage-1 FaceFormer training")
    tf.add_argument("--steps", type=int, default=200)
    tf.add_argument("--batch-size", type=int, default=16)
    tf.add_argument("--seq-length", type=int, default=25)
    tf.add_argument("--lr", type=float, default=1e-4)
    tf.add_argument("--root", default=None, help="MEAD/EMOCA data root")
    tf.add_argument("--fan-checkpoint", default=None,
                    help="torch FanEncoder ckpt for the frozen conditioning "
                         "tower (random-init without it)")
    tf.add_argument("--render-loss", action="store_true",
                    help="enable the PIRender upper-face render loss "
                         "(needs --root with detection crops)")
    tf.add_argument("--emo-loss", action="store_true",
                    help="enable the EmoNet feature loss on the PIRender "
                         "renders (needs --root with detection crops)")
    tf.add_argument("--emonet-checkpoint", default=None,
                    help="torch EmotionRecognition ckpt for the frozen "
                         "EmoNet tower (random-init without it)")
    tf.add_argument("--ckpt-dir", default=None)
    common(tf)
    tf.set_defaults(fn=cmd_train_faceformer)
