"""Seeded tiny-config train-step cases shared by scripts/make_goldens.py
(writes tests/golden/tiny_train.json) and tests/test_golden.py (pins the
first 3 per-step losses of each trainer against that file).

One builder per trainer family — prior (train/prior.py), EMOTE geometric
(train/talking_head.py), EMOCA (train/emoca_trainer.py), PIRender
(train/pirender_trainer.py) — so a trainer-composition regression is caught
even when no oracle parity test covers the changed wiring (VERDICT r4 weak
item 6). Everything is fixed-seed and CPU-deterministic; regenerate the
goldens only after an INTENTIONAL semantic change to a loss/optimizer."""

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 3


def prior_case():
    import optax

    from avi_talking_tpu.models.brain import BrainNetwork
    from avi_talking_tpu.models.diffusion import DiffusionPrior, NoiseScheduler
    from avi_talking_tpu.models.prior_transformer import PriorTransformerNetwork
    from avi_talking_tpu.train.prior import PriorTrainer, PriorTrainState

    dim = 32
    brain = BrainNetwork(out_dim=dim, in_dim=48, clip_size=dim, hidden=64,
                         n_blocks=2)
    net = PriorTransformerNetwork(dim=dim, depth=2, heads=4, dim_head=8)
    rng = jax.random.PRNGKey(0)
    params = {
        "brain": brain.init(rng, jnp.zeros((2, 48))),
        "prior": net.init(rng, jnp.zeros((2, 1, dim)),
                          jnp.zeros((2,), jnp.int32), jnp.zeros((2, dim))),
    }
    trainer = PriorTrainer(
        brain=brain,
        prior=DiffusionPrior(net=net, scheduler=NoiseScheduler.create(10)),
        tx=optax.adamw(1e-3))
    state = PriorTrainState.create(params, trainer.tx)
    step = trainer.jitted_train_step(donate=False)
    d = np.random.default_rng(1)
    voxel = jnp.asarray(d.standard_normal((4, 48)).astype(np.float32))
    target = jnp.asarray(d.standard_normal((4, dim)).astype(np.float32))
    losses, priors = [], []
    for i in range(STEPS):
        state, m = step(state, voxel, target, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
        priors.append(float(m["loss_prior"]))
    return {"loss": losses, "loss_prior": priors}


def emote_case():
    import optax

    from avi_talking_tpu.models.conditioning import StyleCondition
    from avi_talking_tpu.models.emote import EmoteConfig, EmoteTalkingHead
    from avi_talking_tpu.train.talking_head import TalkingHeadTrainer

    cfg = EmoteConfig.tiny()
    head = EmoteTalkingHead(cfg)
    B, T = 2, 2 * cfg.flint.latent_frame_size
    d = np.random.default_rng(0)
    batch = {
        "raw_audio": jnp.asarray(
            d.standard_normal((B, T, 640)).astype(np.float32)),
        "expression": jnp.asarray(np.eye(8, dtype=np.float32)[[1, 5]]),
        "intensity": jnp.asarray(np.eye(3, dtype=np.float32)[[0, 2]]),
        "identity": jnp.asarray(np.eye(32, dtype=np.float32)[[3, 9]]),
        "shape": jnp.zeros((B, cfg.n_shape)),
        "gt_exp": jnp.asarray(
            d.standard_normal((B, T, cfg.flint.n_exp)).astype(np.float32)
            * 0.1),
        "gt_jaw": jnp.asarray(
            d.standard_normal((B, T, 3)).astype(np.float32) * 0.05),
    }
    cond = StyleCondition(batch["expression"], batch["intensity"],
                          batch["identity"], batch["shape"])
    params = head.init(jax.random.PRNGKey(0), batch["raw_audio"], cond)
    tx = optax.adamw(1e-4)
    trainer = TalkingHeadTrainer(head=head, tx=tx)
    opt = tx.init(params)
    step = jax.jit(trainer.train_step)
    losses, exps = [], []
    for i in range(STEPS):
        params, opt, m = step(params, opt, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
        exps.append(float(m["loss_exp"]))
    return {"loss": losses, "loss_exp": exps}


def emoca_case():
    from avi_talking_tpu.core import FlameModel, synthetic_assets
    from avi_talking_tpu.models.emoca import EmocaEncoder
    from avi_talking_tpu.train.deca_losses import DecaLossWeights
    from avi_talking_tpu.train.emoca_trainer import EmocaTrainer

    S = 32
    assets = synthetic_assets(n_shape=8, n_exp=6, n_static_landmarks=51)
    flame = FlameModel(assets, n_shape=8, n_exp=6)
    t = np.asarray(assets.v_template)
    span = t.max(0) - t.min(0) + 1e-6
    uv = jnp.asarray(((t - t.min(0)) / span)[:, :2])
    enc = EmocaEncoder(n_exp=6)
    trainer = EmocaTrainer(
        encoder=enc, flame=flame, uv_coords=uv, uv_faces=assets.faces,
        image_size=S, weights=DecaLossWeights(), raster_chunk=256)
    variables = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3)))
    params = variables["params"]
    static = {k: v for k, v in variables.items() if k != "params"}
    tx = trainer.make_tx(1e-4)
    step = trainer.jitted_train_step(tx, donate=False)
    opt = tx.init(params)
    d = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(
            d.uniform(0, 1, (2, S, S, 3)).astype(np.float32)),
        "lmk": jnp.asarray(
            d.uniform(-0.8, 0.8, (2, 68, 2)).astype(np.float32)),
    }
    totals, lmks = [], []
    for _ in range(STEPS):
        params, opt, terms = step(params, opt, static, batch)
        totals.append(float(terms["total"]))
        lmks.append(float(terms["landmark"]))
    return {"total": totals, "landmark": lmks}


def pirender_case():
    from avi_talking_tpu.models.pirender import FaceGenerator, PIRenderConfig
    from avi_talking_tpu.train.perceptual import PerceptualLoss, Vgg19Features
    from avi_talking_tpu.train.pirender_trainer import (
        PIRenderTrainer,
        make_pirender_optimizer,
    )

    cfg = PIRenderConfig.tiny()
    gen = FaceGenerator(cfg)
    d = np.random.default_rng(3)
    batch = {
        "input_image": jnp.asarray(
            d.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32)),
        "coeff_window": jnp.asarray(
            d.standard_normal((1, 27, cfg.coeff_nc)).astype(np.float32)),
        "target_image": jnp.asarray(
            d.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32)),
    }
    params = gen.init(jax.random.PRNGKey(0), batch["input_image"],
                      batch["coeff_window"])
    vgg = Vgg19Features(taps=("relu_1_1", "relu_2_1"))
    vgg_params = vgg.init(jax.random.PRNGKey(1), batch["input_image"])["params"]
    tx = make_pirender_optimizer(1e-4)
    trainer = PIRenderTrainer(
        generator=gen, tx=tx,
        perceptual_warp=PerceptualLoss(vgg, layers=("relu_1_1", "relu_2_1"),
                                       num_scales=1),
        perceptual_final=PerceptualLoss(vgg, layers=("relu_1_1", "relu_2_1"),
                                        num_scales=1, use_style_loss=True),
        vgg_params=vgg_params)
    step = trainer.jitted_train_step()
    opt = tx.init(params)
    warp_losses, full_losses = [], []
    for i in range(STEPS):
        params, opt, m = step(params, opt, batch, True)  # warp stage
        warp_losses.append(float(m["loss"]))
    for i in range(STEPS):
        params, opt, m = step(params, opt, batch, False)  # full stage
        full_losses.append(float(m["loss"]))
    return {"warp_loss": warp_losses, "full_loss": full_losses}


TRAIN_CASES = {
    "prior": prior_case,
    "emote": emote_case,
    "emoca": emoca_case,
    "pirender": pirender_case,
}
