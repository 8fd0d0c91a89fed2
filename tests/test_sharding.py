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
