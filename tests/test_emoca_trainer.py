"""EMOCA coarse self-supervised training: wiring + overfit tests
(train.emoca_trainer; reference gdl/models/DECA.py _compute_loss coarse)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avi_talking_tpu.core import FlameModel, synthetic_assets
from avi_talking_tpu.models.emoca import EmocaEncoder
from avi_talking_tpu.train.deca_losses import DecaLossWeights
from avi_talking_tpu.train.emoca_trainer import EmocaTrainer, train_emoca

S = 32


def _make_trainer(train_exp_only=False, **wkw):
    assets = synthetic_assets(n_shape=8, n_exp=6, n_static_landmarks=51)
    flame = FlameModel(assets, n_shape=8, n_exp=6)
    t = np.asarray(assets.v_template)
    span = t.max(0) - t.min(0) + 1e-6
    uv = jnp.asarray(((t - t.min(0)) / span)[:, :2])
    enc = EmocaEncoder(n_exp=6)
    trainer = EmocaTrainer(
        encoder=enc, flame=flame, uv_coords=uv, uv_faces=assets.faces,
        image_size=S, weights=DecaLossWeights(**wkw),
        train_exp_only=train_exp_only, raster_chunk=256)
    variables = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3)))
    return trainer, variables


def _batch(rng, B=2):
    return {
        "images": jnp.asarray(rng.uniform(0, 1, (B, S, S, 3)).astype(np.float32)),
        "lmk": jnp.asarray(rng.uniform(-0.8, 0.8, (B, 68, 2)).astype(np.float32)),
    }


def test_emoca_train_step_runs_and_updates():
    trainer, variables = _make_trainer()
    rng = np.random.default_rng(0)
    params = variables["params"]
    static = {k: v for k, v in variables.items() if k != "params"}
    tx = trainer.make_tx(1e-4)
    step = trainer.jitted_train_step(tx, donate=False)
    new_params, opt, terms = step(params, tx.init(params), static, _batch(rng))
    for k in ("landmark", "photometric", "shading_white", "total"):
        assert np.isfinite(float(terms[k])), k
    # both towers move by default
    d_coarse = jax.tree.reduce(
        lambda a, x: a + float(jnp.abs(x).sum()),
        jax.tree.map(lambda a, b: a - b, new_params["coarse"],
                     params["coarse"]), 0.0)
    d_exp = jax.tree.reduce(
        lambda a, x: a + float(jnp.abs(x).sum()),
        jax.tree.map(lambda a, b: a - b, new_params["expression"],
                     params["expression"]), 0.0)
    assert d_coarse > 0 and d_exp > 0


def test_emoca_exp_only_freezes_coarse_tower():
    trainer, variables = _make_trainer(train_exp_only=True)
    rng = np.random.default_rng(1)
    params = variables["params"]
    static = {k: v for k, v in variables.items() if k != "params"}
    tx = trainer.make_tx(1e-3)
    step = trainer.jitted_train_step(tx, donate=False)
    new_params, _, _ = step(params, tx.init(params), static, _batch(rng))
    d_coarse = jax.tree.reduce(
        lambda a, x: a + float(jnp.abs(x).sum()),
        jax.tree.map(lambda a, b: a - b, new_params["coarse"],
                     params["coarse"]), 0.0)
    d_exp = jax.tree.reduce(
        lambda a, x: a + float(jnp.abs(x).sum()),
        jax.tree.map(lambda a, b: a - b, new_params["expression"],
                     params["expression"]), 0.0)
    assert d_coarse == 0.0
    assert d_exp > 0


def test_emoca_emotion_consistency_term():
    """EMOCA's defining loss: with a frozen EmoNet attached, the coarse
    loss dict grows an `emotion` term (DECA.py:1221-1226) and it carries
    gradient to the encoder."""
    from avi_talking_tpu.models.emoca import (
        EmoNetLoss,
        EmotionRecognitionModule,
    )

    trainer, variables = _make_trainer(emonet=1.0)
    emo_mod = EmotionRecognitionModule(n_expression=8)
    emo_vars = emo_mod.init(jax.random.PRNGKey(5), jnp.zeros((1, S, S, 3)))
    trainer.emonet = EmoNetLoss(emo_mod)
    trainer.emonet_variables = emo_vars
    rng = np.random.default_rng(4)
    params = variables["params"]
    static = {k: v for k, v in variables.items() if k != "params"}
    total, terms = trainer.loss_fn(params, static, _batch(rng))
    assert "emotion" in terms and np.isfinite(float(terms["emotion"]))
    g = jax.grad(lambda p: trainer.loss_fn(p, static, _batch(rng))[0])(params)
    gnorm = jax.tree.reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), g, 0.0)
    assert np.isfinite(gnorm) and gnorm > 0


def test_detail_stage_trains_generator_only():
    """DETAIL stage (DecaDetailTrainer): one step runs, losses finite,
    E_detail/D_detail move, frozen coarse variables untouched by
    construction (they are inputs, not trained params)."""
    import optax

    from avi_talking_tpu.models.deca_detail import (
        DecaDetailModel,
        DetailGenerator,
    )
    from avi_talking_tpu.train.emoca_trainer import DecaDetailTrainer

    assets = synthetic_assets(n_shape=8, n_exp=6, n_static_landmarks=51)
    flame = FlameModel(assets, n_shape=8, n_exp=6)
    t = np.asarray(assets.v_template)
    span = t.max(0) - t.min(0) + 1e-6
    uv = jnp.asarray(((t - t.min(0)) / span)[:, :2])
    enc = EmocaEncoder(n_exp=6, with_detail=True, n_detail=4)
    variables = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3)))
    gen = DetailGenerator(latent_dim=3 + 6 + 4, init_size=2)
    gvars = gen.init(jax.random.PRNGKey(1), jnp.zeros((1, 13)))
    dm = DecaDetailModel(generator=gen, variables=gvars,
                         faces=assets.faces, uv_coords=uv,
                         uv_faces=assets.faces, uv_size=64)
    trainer = DecaDetailTrainer(encoder=enc, detail_model=dm, flame=flame,
                                image_size=S, raster_chunk=256)
    rng = np.random.default_rng(3)
    batch = _batch(rng)
    train_params = {"detail": variables["params"]["detail"],
                    "generator": gvars}
    tx = optax.adam(1e-3)
    step = trainer.jitted_train_step(tx, donate=False)
    new_tp, _, terms = step(train_params, tx.init(train_params), variables,
                            batch)
    for k in ("photometric_detailed", "z_reg", "z_diff", "z_sym",
              "detail_l1_0", "total"):
        assert k in terms and np.isfinite(float(terms[k])), (k, terms.get(k))
    moved = jax.tree.reduce(
        lambda a, x: a + float(jnp.abs(x).sum()),
        jax.tree.map(lambda a, b: a - b, new_tp, train_params), 0.0)
    assert moved > 0


def test_train_emoca_cli_on_folder(tmp_path):
    """cli train-emoca --root: PNG frames + landmarks.npy in, steps run,
    checkpoint out."""
    from avi_talking_tpu.cli import main
    from avi_talking_tpu.viz.pngio import write_png

    rng = np.random.default_rng(6)
    root = tmp_path / "frames"
    root.mkdir()
    for t in range(3):
        write_png(str(root / f"{t:03d}.png"),
                  (rng.uniform(0, 1, (32, 32, 3)) * 255).astype(np.uint8))
    np.save(str(root / "landmarks.npy"),
            rng.uniform(-0.8, 0.8, (3, 68, 2)).astype(np.float32))
    rc = main(["train-emoca", "--tiny", "--size", "32", "--batch-size", "2",
               "--steps", "2", "--log-every", "0", "--root", str(root),
               "--ckpt-dir", str(tmp_path / "ck")])
    assert rc == 0 and (tmp_path / "ck").is_dir()
    # missing landmarks fail loudly, not silently
    bad = tmp_path / "nolmk"
    bad.mkdir()
    for t in range(2):
        write_png(str(bad / f"{t}.png"),
                  (rng.uniform(0, 1, (32, 32, 3)) * 255).astype(np.uint8))
    with pytest.raises(SystemExit):
        main(["train-emoca", "--tiny", "--size", "32", "--steps", "1",
              "--root", str(bad)])
    # ... but the DETAIL stage is purely photometric and must accept a
    # plain crop folder with no landmarks
    rc = main(["train-emoca", "--tiny", "--size", "32", "--batch-size", "2",
               "--steps", "1", "--log-every", "0", "--detail",
               "--root", str(bad)])
    assert rc == 0
    # coarse -> detail staging: the checkpoint saved above (no detail
    # tower) grafts into the detail-stage tree instead of crashing on the
    # tree-structure mismatch
    rc = main(["train-emoca", "--tiny", "--size", "32", "--batch-size", "2",
               "--steps", "1", "--log-every", "0", "--detail",
               "--root", str(bad), "--checkpoint", str(tmp_path / "ck")])
    assert rc == 0


@pytest.mark.slow
def test_emoca_overfit_tiny():
    """Loss decreases substantially when overfitting one fixed batch."""
    trainer, variables = _make_trainer()
    rng = np.random.default_rng(2)
    fixed = _batch(rng, B=2)

    def batches():
        while True:
            yield fixed

    params = variables["params"]
    static = {k: v for k, v in variables.items() if k != "params"}
    first = float(trainer.loss_fn(params, static, fixed)[0])
    res = train_emoca(trainer, variables, batches(), steps=40, lr=3e-4,
                      log_every=0)
    last = res["metrics"]["total"]
    assert np.isfinite(last)
    assert last < first * 0.85, (first, last)
