"""train-pirender: PIRender face-reenactment training over video-pair data
(the reference's third_party/pirender/train.py + trainers/face_trainer.py
recipe on the VoxDataset sampling, fed from an EMOCA-preprocessed root via
data.pirender_pairs)."""

from __future__ import annotations

import sys
import time


def cmd_train_pirender(args) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..models.pirender import (
        FaceGenerator,
        PIRenderConfig,
        pirender_params_from_torch,
    )
    from ..train.perceptual import PerceptualLoss, Vgg19Features
    from ..train.pirender_trainer import (
        PIRenderTrainer,
        make_pirender_optimizer,
    )

    S = args.image_size
    if args.tiny:
        cfg = PIRenderConfig.tiny()
        vgg = Vgg19Features(taps=("relu_1_1", "relu_2_1"))
        mk = lambda style: PerceptualLoss(  # noqa: E731
            vgg, layers=("relu_1_1", "relu_2_1"), num_scales=1,
            use_style_loss=style)
    else:
        cfg = PIRenderConfig()
        vgg = Vgg19Features()
        mk = lambda style: PerceptualLoss(vgg, use_style_loss=style)  # noqa: E731

    B = args.batch_size
    if args.root:
        from ..data.pirender_pairs import VideoPairDataset

        ds = VideoPairDataset(root=args.root, image_size=S,
                              cross_id=args.cross_id, seed=args.seed)
        if len(ds) == 0:
            raise SystemExit(
                f"no clips with detection crops under {args.root}")
        print(f"video-pair data: {len(ds)} clips / "
              f"{len(ds.person_ids)} identities")
        raw = ds.batches(B)

        def batches():
            for b in raw:
                yield {
                    "input_image": jnp.asarray(b["input_image"]),
                    "target_image": jnp.asarray(b["target_image"]),
                    "coeff_window": jnp.asarray(b["coeff_window"]),
                }
        import dataclasses as _dc

        cfg = _dc.replace(cfg, coeff_nc=59)
    else:
        rng = np.random.default_rng(args.seed)
        print("train-pirender: no --root; synthetic pair batches (smoke)",
              file=sys.stderr)

        def batches():
            while True:
                yield {
                    "input_image": jnp.asarray(rng.uniform(
                        -1, 1, (B, S, S, 3)).astype(np.float32)),
                    "target_image": jnp.asarray(rng.uniform(
                        -1, 1, (B, S, S, 3)).astype(np.float32)),
                    "coeff_window": jnp.asarray(rng.standard_normal(
                        (B, 27, cfg.coeff_nc)).astype(np.float32)),
                }

    gen = FaceGenerator(cfg)
    it = batches()
    first = next(it)
    if args.net_g:
        import torch as _torch

        sd = _torch.load(args.net_g, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "net_G_ema" in sd:
            sd = sd["net_G_ema"]
        params = pirender_params_from_torch(sd, cfg)
    else:
        params = gen.init(jax.random.PRNGKey(args.seed),
                          first["input_image"], first["coeff_window"])
    vgg_params = vgg.init(
        jax.random.PRNGKey(1), first["input_image"])["params"]

    disc = tx_d = d_params = d_opt = None
    if args.gan:
        from ..models.discriminator import MultiscaleDiscriminator

        disc = MultiscaleDiscriminator(
            num_d=1 if args.tiny else 2,
            ndf=8 if args.tiny else 64,
            n_layers=2 if args.tiny else 4)
        d_params = disc.init(jax.random.PRNGKey(2), first["target_image"])
        import optax

        tx_d = optax.adam(args.lr, b1=0.5, b2=0.999)
        d_opt = tx_d.init(d_params)

    tx = make_pirender_optimizer(args.lr)
    trainer = PIRenderTrainer(
        generator=gen, tx=tx, perceptual_warp=mk(False),
        perceptual_final=mk(True), vgg_params=vgg_params,
        pretrain_warp_steps=args.warp_steps,
        discriminator=disc, tx_d=tx_d)
    step = trainer.jitted_train_step()
    d_step = trainer.jitted_d_train_step() if disc is not None else None
    opt = tx.init(params)

    t0 = time.time()
    metrics = {}
    for i in range(args.steps):
        batch = first if i == 0 else next(it)
        warp_only = i < args.warp_steps
        params, opt, metrics = step(
            params, opt, batch, warp_only,
            d_params if (disc is not None and not warp_only) else None)
        if disc is not None and not warp_only:
            d_params, d_opt, d_loss = d_step(d_params, d_opt, params, batch)
            metrics = dict(metrics, gan_d=d_loss)
        if (i + 1) % args.log_every == 0:
            print(f"step {i + 1}: " + " ".join(
                f"{k}={float(v):.4f}" for k, v in metrics.items())
                + f" ({(i + 1) / (time.time() - t0):.1f} it/s)")
    if args.ckpt_dir:
        from ..infra.checkpoint import save_checkpoint

        payload = {"net_G": params}
        if d_params is not None:
            payload["net_D"] = d_params
        save_checkpoint(args.ckpt_dir, payload)
        print(f"saved -> {args.ckpt_dir}")
    print("final:", {k: round(float(v), 5) for k, v in metrics.items()})
    return 0


def register(sub, common):
    tp = sub.add_parser(
        "train-pirender",
        help="PIRender reenactment training on video-pair data")
    tp.add_argument("--root", default=None,
                    help="EMOCA-preprocessed root with detection crops "
                         "(e.g. preprocess-mead output)")
    tp.add_argument("--steps", type=int, default=200)
    tp.add_argument("--warp-steps", type=int, default=100,
                    help="stage-1 warp-only pretrain steps "
                         "(pretrain_warp_iteration)")
    tp.add_argument("--batch-size", type=int, default=4)
    tp.add_argument("--image-size", type=int, default=256)
    tp.add_argument("--lr", type=float, default=1e-4)
    tp.add_argument("--cross-id", action="store_true",
                    help="source image from a different identity "
                         "(VoxVideoDataset cross-reenactment sampling)")
    tp.add_argument("--gan", action="store_true",
                    help="hinge GAN + feature matching on the editing stage")
    tp.add_argument("--net-g", default=None,
                    help="warm-start from a torch net_G checkpoint")
    tp.add_argument("--tiny", action="store_true")
    tp.add_argument("--seed", type=int, default=0)
    tp.add_argument("--ckpt-dir", default=None)
    tp.add_argument("--log-every", type=int, default=50)
    tp.set_defaults(fn=cmd_train_pirender)
