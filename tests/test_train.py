"""Training-step tests: losses match reference math, steps reduce loss."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import optax
import torch

from avi_talking_tpu.models import BrainNetwork, DiffusionPrior, NoiseScheduler
from avi_talking_tpu.models.prior_transformer import PriorTransformerNetwork
from avi_talking_tpu.train import (
    PriorTrainState,
    PriorTrainer,
    batchwise_cosine_similarity,
    cosine_anneal,
    make_prior_optimizer,
    soft_clip_loss,
    topk_accuracy,
)


def torch_soft_clip_loss(preds, targs, temp=0.125):
    clip_clip = (targs @ targs.T) / temp
    brain_clip = (preds @ targs.T) / temp
    loss1 = -(brain_clip.log_softmax(-1) * clip_clip.softmax(-1)).sum(-1).mean()
    loss2 = -(brain_clip.T.log_softmax(-1) * clip_clip.softmax(-1)).sum(-1).mean()
    return (loss1 + loss2) / 2


def test_soft_clip_loss_matches_reference():
    rng = np.random.default_rng(0)
    p = rng.standard_normal((6, 16)).astype(np.float32)
    t = rng.standard_normal((6, 16)).astype(np.float32)
    ref = float(torch_soft_clip_loss(torch.from_numpy(p), torch.from_numpy(t)))
    got = float(soft_clip_loss(jnp.asarray(p), jnp.asarray(t)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_cosine_anneal_endpoints():
    vals = np.asarray(cosine_anneal(0.004, 0.0075, 10))
    np.testing.assert_allclose(vals[0], 0.004, rtol=1e-6)
    np.testing.assert_allclose(vals[-1], 0.0075, rtol=1e-6)


def test_topk_and_cosine_sim():
    Z = jnp.eye(4)
    sims = batchwise_cosine_similarity(Z, Z)
    np.testing.assert_allclose(np.asarray(sims), np.eye(4), atol=1e-6)
    acc = topk_accuracy(sims, jnp.arange(4), k=1)
    assert float(acc) == 1.0


def _trainer(dim=32):
    brain = BrainNetwork(out_dim=dim, in_dim=48, clip_size=dim, hidden=64, n_blocks=2)
    net = PriorTransformerNetwork(dim=dim, depth=2, heads=4, dim_head=8)
    rng = jax.random.PRNGKey(0)
    params = {
        "brain": brain.init(rng, jnp.zeros((2, 48))),
        "prior": net.init(
            rng, jnp.zeros((2, 1, dim)), jnp.zeros((2,), jnp.int32),
            jnp.zeros((2, dim)),
        ),
    }
    prior = DiffusionPrior(net=net, scheduler=NoiseScheduler.create(10))
    # flat-lr AdamW for the overfit test (OneCycle's warmup from max_lr/25
    # makes 30 steps mostly warmup; the schedule itself is covered by
    # make_prior_optimizer in test_weight_decay_mask / smoke usage below)
    tx = optax.adamw(1e-3)
    make_prior_optimizer(params, max_lr=1e-3, total_steps=50)  # constructs OK
    return PriorTrainer(brain=brain, prior=prior, tx=tx), params


@pytest.mark.slow
def test_prior_train_steps_reduce_loss():
    trainer, params = _trainer()
    state = PriorTrainState.create(params, trainer.tx)
    step = trainer.jitted_train_step(donate=False)
    rng = np.random.default_rng(1)
    voxel = jnp.asarray(rng.standard_normal((8, 48)).astype(np.float32))
    target = jnp.asarray(rng.standard_normal((8, 32)).astype(np.float32))
    losses = []
    for i in range(150):
        state, metrics = step(state, voxel, target, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss_prior"]))
    assert int(state.step) == 150
    # overfitting a fixed batch must reduce the prior loss substantially
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.8, losses[:3] + losses[-3:]
    for v in metrics.values():
        assert np.isfinite(float(v))


def test_weight_decay_mask_excludes_norms_and_biases():
    from avi_talking_tpu.train.prior import _no_decay_mask

    params = {
        "dense": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((2,))},
        "norm1": {"scale": jnp.ones((2,)), "bias": jnp.ones((2,))},
        "attn": {"g": jnp.ones((2,))},
    }
    mask = _no_decay_mask(params)
    assert mask["dense"]["kernel"] is True
    assert mask["dense"]["bias"] is False
    assert mask["norm1"]["scale"] is False
    assert mask["norm1"]["bias"] is False
    assert mask["attn"]["g"] is False


@pytest.mark.slow
def test_train_prior_driver_synthetic():
    from avi_talking_tpu.train.driver import (
        PriorTrainingConfig,
        synthetic_batches,
        train_prior,
    )

    cfg = PriorTrainingConfig(
        clip_size=32, in_dim=48, depth=2, heads=4, dim_head=8, timesteps=10,
        brain_hidden=64, total_steps=30, batch_size=16, log_every=100,
        max_lr=1e-3,
    )
    res = train_prior(cfg, batches=synthetic_batches(16, 30, 48, 32))
    assert int(res["state"].step) == 30
    m = res["metrics"]
    assert np.isfinite(m["loss"]) and 0.0 <= m["top1_fwd"] <= 1.0


def test_train_flint_vae_driver():
    from avi_talking_tpu.models.flint import FlintConfig
    from avi_talking_tpu.train.driver import train_flint_vae

    rng = np.random.default_rng(0)

    def batches():
        while True:
            yield rng.standard_normal((2, 16, 9)).astype(np.float32) * 0.1

    cfg = FlintConfig(feature_dim=16, bottleneck_dim=16, quant_factor=2,
                      nhead=4, intermediate_size=32, out_dim=9, n_exp=6)
    res = train_flint_vae(batches(), total_steps=10, flint_cfg=cfg, lr=1e-3)
    assert np.isfinite(res["metrics"]["recon"])



def test_train_flint_vq_driver():
    from avi_talking_tpu.models.flint import FlintConfig
    from avi_talking_tpu.train.driver import train_flint_vae

    rng = np.random.default_rng(0)

    def batches():
        while True:
            yield rng.standard_normal((2, 16, 9)).astype(np.float32) * 0.1

    cfg = FlintConfig(feature_dim=16, bottleneck_dim=16, quant_factor=2,
                      nhead=4, intermediate_size=32, out_dim=9, n_exp=6)
    res = train_flint_vae(batches(), total_steps=10, flint_cfg=cfg, lr=1e-3,
                          quantizer="vq", codebook_size=16)
    m = res["metrics"]
    assert np.isfinite(m["recon"]) and np.isfinite(m["commitment"])
    assert m["perplexity"] >= 1.0
    assert "quantizer" in res["params"]

def test_faceformer_trainer_full_stack():
    import jax.numpy as jnp

    from avi_talking_tpu.core import FlameModel, synthetic_assets
    from avi_talking_tpu.models import FaceFormerCoeff, FaceFormerConfig
    from avi_talking_tpu.train.faceformer_trainer import FaceFormerTrainer

    cfg = FaceFormerConfig.tiny()  # vertice_dim 9 == [exp6, jaw3]
    model = FaceFormerCoeff(cfg)
    # 51 static + 17 dynamic landmarks = the 68-point layout the lip/eye
    # losses index
    assets = synthetic_assets(n_shape=8, n_exp=6, n_static_landmarks=51)
    flame = FlameModel(assets, n_shape=8, n_exp=6)

    rng = np.random.default_rng(0)
    B, T = 2, 8
    batch = {
        "audio": jnp.asarray(rng.standard_normal((B, T * 640)).astype(np.float32)),
        "coeff": jnp.asarray(
            rng.standard_normal((B, T, cfg.vertice_dim)).astype(np.float32) * 0.3
        ),
        "eye_embed": jnp.asarray(rng.standard_normal((B, T, 6)).astype(np.float32)),
        "emo_embed": jnp.asarray(rng.standard_normal((B, T, 30)).astype(np.float32)),
        "ref_coeff": jnp.asarray(
            rng.standard_normal((B, 1, cfg.vertice_dim)).astype(np.float32)
        ),
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["audio"], batch["coeff"],
        batch["eye_embed"], batch["emo_embed"], batch["ref_coeff"],
    )
    tx = optax.adam(1e-3)
    calls = []
    trainer = FaceFormerTrainer(
        model=model, tx=tx, flame=flame,
        coeff_mean=jnp.zeros(9), coeff_std=jnp.ones(9),
        render_loss_fn=lambda pred, b: (calls.append(1) or jnp.mean(pred**2)),
    )
    step = trainer.jitted_train_step()
    opt = tx.init(params)
    losses = []
    for i in range(25):
        params, opt, metrics = step(params, opt, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert {"coeff", "ldmk", "render", "loss"} <= set(metrics)
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    assert all(np.isfinite(l) for l in losses)


def test_one_cycle_schedule_small_totals_finite():
    from avi_talking_tpu.train.prior import one_cycle_schedule

    for total in (1, 2, 3, 10):
        s = one_cycle_schedule(1e-4, total)
        vals = [float(s(i)) for i in range(total + 2)]
        assert all(np.isfinite(v) for v in vals), (total, vals)
        assert max(vals) <= 1e-4 * 1.01
