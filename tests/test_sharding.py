"""Multi-device sharding tests on the simulated 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avi_talking_tpu.parallel import make_mesh, shard_params
from avi_talking_tpu.parallel.mesh import emote_param_sharding_rules, param_shardings
from jax.sharding import NamedSharding, PartitionSpec as P


requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 simulated devices"
)


@requires_8
def test_mesh_shapes():
    m = make_mesh(dp=4, tp=2)
    assert m.shape == {"dp": 4, "tp": 2}
    m2 = make_mesh(tp=1)
    assert m2.shape["dp"] == 8


def test_tp_rules():
    assert emote_param_sharding_rules(
        "audio_encoder/layers_0/attn_q/kernel"
    ) == P(None, "tp")
    assert emote_param_sharding_rules(
        "audio_encoder/layers_3/output_dense/kernel"
    ) == P("tp", None)
    assert emote_param_sharding_rules("decoder/kernel") == P()
    assert emote_param_sharding_rules(
        "audio_encoder/feature_extractor/conv_layers_0/conv/kernel"
    ) == P()


@requires_8
def test_dp_matmul_matches_single_device():
    m = make_mesh(dp=8, tp=1)
    x = np.random.default_rng(0).standard_normal((16, 32)).astype(np.float32)
    w = np.random.default_rng(1).standard_normal((32, 8)).astype(np.float32)
    xs = jax.device_put(jnp.asarray(x), NamedSharding(m, P("dp")))
    ws = jax.device_put(jnp.asarray(w), NamedSharding(m, P()))
    out = jax.jit(lambda a, b: a @ b)(xs, ws)
    np.testing.assert_allclose(np.asarray(out), x @ w, rtol=1e-5, atol=1e-5)


@requires_8
@pytest.mark.slow
def test_graft_entry_dryrun():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


@requires_8
def test_sharded_params_placement():
    from avi_talking_tpu.audio import Wav2Vec2Config, Wav2Vec2Model

    m = make_mesh(dp=4, tp=2)
    cfg = Wav2Vec2Config.tiny()
    model = Wav2Vec2Model(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3200)), output_len=5)
    # wrap under the audio_encoder prefix like in the EMOTE head
    wrapped = {"audio_encoder": params["params"]}
    sharded = shard_params(wrapped, m)
    k = sharded["audio_encoder"]["layers_0"]["attn_q"]["kernel"]
    assert k.sharding.spec == P(None, "tp")
    other = sharded["audio_encoder"]["feature_projection"]["projection"]["kernel"]
    assert other.sharding.spec == P()


def test_fsdp_extend_spec_rules():
    from avi_talking_tpu.parallel import fsdp_extend_spec

    m = make_mesh(dp=4, tp=2)
    # largest divisible dim gets "dp"
    assert fsdp_extend_spec(P(), (768, 3072), m) == P(None, "dp")
    assert fsdp_extend_spec(P(), (3072, 768), m) == P("dp", None)
    # tp-sharded dim is respected; dp goes to the other dim
    assert fsdp_extend_spec(P(None, "tp"), (768, 3072), m) == P("dp", "tp")
    # small leaves stay replicated
    assert fsdp_extend_spec(P(), (128,), m) == P()
    # non-divisible dims skipped (5023 % 4 != 0 -> falls to dim 1... also
    # not divisible -> unchanged)
    assert fsdp_extend_spec(P(), (5023, 3), m) == P()
    # scalars untouched
    assert fsdp_extend_spec(P(), (), m) == P()
    # conv kernels (ndim != 2) are never FSDP-sharded: XLA's SPMD conv
    # partitioner CHECK-fails on sharded kernel dims
    assert fsdp_extend_spec(P(), (10, 512, 512), m) == P()
    assert fsdp_extend_spec(P(), (3, 3, 256, 256), m) == P()


@requires_8
@pytest.mark.slow
def test_fsdp_train_step_matches_replicated():
    """FSDP (params + Adam moments sharded over dp) must be numerically
    identical to the replicated dp step — GSPMD only changes layout."""
    import optax

    from avi_talking_tpu.models import EmoteConfig, EmoteTalkingHead
    from avi_talking_tpu.models.conditioning import StyleCondition
    from avi_talking_tpu.parallel import (
        fsdp_param_shardings,
        state_shardings_like,
    )
    from avi_talking_tpu.train import TalkingHeadTrainer

    cfg = EmoteConfig.tiny()
    head = EmoteTalkingHead(cfg)
    mesh = make_mesh(dp=4, tp=2)
    B, T = 8, 2 * cfg.flint.latent_frame_size
    rng = np.random.default_rng(0)
    batch = {
        "raw_audio": jnp.asarray(
            rng.standard_normal((B, T, 640)).astype(np.float32)),
        "expression": jnp.asarray(np.eye(8, dtype=np.float32)[
            rng.integers(0, 8, B)]),
        "intensity": jnp.asarray(np.eye(3, dtype=np.float32)[
            rng.integers(0, 3, B)]),
        "identity": jnp.asarray(np.eye(32, dtype=np.float32)[
            rng.integers(0, 32, B)]),
        "shape": jnp.zeros((B, cfg.n_shape)),
        "gt_exp": jnp.asarray(
            rng.standard_normal((B, T, cfg.n_exp)).astype(np.float32) * 0.1),
        "gt_jaw": jnp.asarray(
            rng.standard_normal((B, T, 3)).astype(np.float32) * 0.05),
    }
    cond = StyleCondition(batch["expression"], batch["intensity"],
                          batch["identity"], batch["shape"])
    params = head.init(jax.random.PRNGKey(0), batch["raw_audio"], cond)
    # sgd for the equivalence check: adam's first step maps near-zero
    # gradient noise to +-lr (g/(|g|+eps)), which sign-flips under the
    # different (but equally valid) sharded reduction order
    tx = optax.sgd(1e-2)
    trainer = TalkingHeadTrainer(head=head, tx=tx)

    # replicated baseline (pure single-device semantics)
    p_ref, o_ref, m_ref = jax.jit(trainer.train_step)(
        params, tx.init(params), batch, jax.random.PRNGKey(1))

    with mesh:
        p_sh = fsdp_param_shardings(params, mesh, min_size=256)
        params_f = jax.tree.map(jax.device_put, params, p_sh)
        opt_f = tx.init(params_f)
        o_sh = state_shardings_like(opt_f, params, p_sh, mesh)
        opt_f = jax.tree.map(
            lambda x, s: jax.device_put(x, s), opt_f, o_sh)
        step = jax.jit(
            trainer.train_step,
            in_shardings=(p_sh, o_sh, None, None),
            out_shardings=(p_sh, o_sh, None),
        )
        batch_sh = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P("dp")))
            if hasattr(x, "ndim") and x.ndim >= 1 else x,
            batch,
        )
        p_new, o_new, m_new = step(params_f, opt_f, batch_sh,
                                   jax.random.PRNGKey(1))

    # at least one large kernel is genuinely dp-sharded
    specs = jax.tree.leaves(
        jax.tree.map(lambda s: s.spec, p_sh,
                     is_leaf=lambda x: isinstance(x, NamedSharding)))
    assert any("dp" in [e for e in s if e] for s in specs if len(s)), specs
    np.testing.assert_allclose(float(m_new["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)
    # updated params match the replicated baseline
    for a, b in zip(jax.tree.leaves(p_new), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)


@requires_8
def test_pipeline_dp_mesh_serving_matches_unsharded():
    """use_mesh(dp): batched serving sharded over the mesh must reproduce
    the unsharded outputs, including the non-divisible-batch pad path."""
    from avi_talking_tpu.core import synthetic_assets
    from avi_talking_tpu.pipeline import AviTalkingPipeline, PipelineConfig

    pipe = AviTalkingPipeline.random_init(
        PipelineConfig.tiny(), flame_assets=synthetic_assets(n_shape=8, n_exp=6)
    )
    rng = np.random.default_rng(0)
    wavs = [rng.uniform(-0.3, 0.3, n).astype(np.float32)
            for n in (8000, 12000, 16000)]
    instrs = [f"caption {i}" for i in range(3)]
    ref = pipe.generate_batch(wavs, instrs, seed=1, length_buckets=(64,))

    sharded = AviTalkingPipeline.random_init(
        PipelineConfig.tiny(), flame_assets=synthetic_assets(n_shape=8, n_exp=6)
    )
    sharded.use_mesh(make_mesh(dp=4, tp=2))
    out = sharded.generate_batch(wavs, instrs, seed=1, length_buckets=(64,))
    for r, o in zip(ref, out):
        np.testing.assert_allclose(o["style_emb"], r["style_emb"],
                                   atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(o["exp"], r["exp"], atol=1e-4, rtol=1e-3)
