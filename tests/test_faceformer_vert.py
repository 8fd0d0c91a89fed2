"""Vertex-space FaceFormer variant: TF/AR consistency, regions, disen losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avi_talking_tpu.core import FlameModel, synthetic_assets
from avi_talking_tpu.models.faceformer_vert import (
    FaceFormerVert,
    FaceFormerVertConfig,
    FlameRegionSelector,
    convert_coeff2verts,
    disentangle_losses,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = FaceFormerVertConfig.tiny()
    rng = np.random.default_rng(0)
    template = jnp.asarray(rng.standard_normal(cfg.vertice_dim).astype(np.float32) * 0.1)
    model = FaceFormerVert(cfg, template=template)
    B, T = 2, 10
    audio = rng.standard_normal((B, T * 640)).astype(np.float32)
    verts = rng.standard_normal((B, T, cfg.vertice_dim)).astype(np.float32)
    emo = rng.standard_normal((B, T, cfg.emo_dim)).astype(np.float32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(audio), jnp.asarray(verts), jnp.asarray(emo)
    )
    return cfg, model, params, audio, verts, emo


def test_tf_outputs_template_at_zero_init(tiny):
    cfg, model, params, audio, verts, emo = tiny
    out = model.apply(params, audio, verts, emo)
    # zero-init head + zero obj_vector output => prediction == template
    np.testing.assert_allclose(
        np.asarray(out), np.broadcast_to(np.asarray(model.template), out.shape),
        atol=1e-5,
    )


def _randomize(params, scale=0.05, seed=3):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.default_rng(seed)
    return jax.tree_util.tree_unflatten(
        treedef,
        [jnp.asarray(rng.standard_normal(l.shape).astype(np.float32) * scale)
         for l in leaves],
    )


def test_ar_matches_teacher_forcing_on_own_outputs(tiny):
    cfg, model, params, audio, verts, emo = tiny
    T = verts.shape[1]
    p = _randomize(params["params"])
    # align start tokens: AR token0 = obj_vector(one_hot) = style; TF first
    # token = vertice_map(0) + style. zero the vertice_map bias so both are
    # style exactly.
    p["vertice_map"]["bias"] = jnp.zeros_like(p["vertice_map"]["bias"])
    params2 = {"params": p}
    ar = model.apply(params2, audio, T, emo, method=FaceFormerVert.predict)
    tf = model.apply(params2, audio, np.asarray(ar), emo)
    np.testing.assert_allclose(np.asarray(tf), np.asarray(ar), rtol=3e-4, atol=3e-5)


def test_region_selector():
    rng = np.random.default_rng(1)
    v = rng.uniform(-0.1, 0.1, (50, 3)).astype(np.float32)
    v[:, 1] += 1.45  # put everything in the face band
    sel = FlameRegionSelector.from_template(v)
    assert sel.frontal.shape == (50,)
    assert (sel.mouth & ~sel.frontal).sum() == 0  # mouth subset of frontal
    unfolded = sel.unfold("eye")
    assert unfolded.shape == (150,)
    assert (unfolded.reshape(50, 3) == sel.eye[:, None]).all()


def test_convert_coeff2verts_zeroes_global_pose():
    assets = synthetic_assets(n_shape=8, n_exp=6)
    flame = FlameModel(assets, n_shape=8, n_exp=6)
    rng = np.random.default_rng(2)
    # 9-dim coeff space for the tiny flame: 6 exp + 3 jaw
    coeff = jnp.asarray(rng.standard_normal((4, 9)).astype(np.float32))
    mean = jnp.zeros(9)
    std = jnp.ones(9)
    # tiny flame: n_exp=6 -> coeff layout [exp6, jaw3]
    verts = convert_coeff2verts(flame, coeff, mean, std)
    assert verts.shape == (4, assets.num_vertices * 3)
    assert np.isfinite(np.asarray(verts)).all()


def test_disentangle_losses(tiny):
    cfg, model, params, audio, verts, emo = tiny
    V = cfg.vertice_dim // 3
    sel = FlameRegionSelector(
        frontal=np.ones(V, bool),
        mouth=np.arange(V) < V // 2,
        eye=np.arange(V) >= V // 2,
    )
    losses = disentangle_losses(
        model, params, jnp.asarray(audio), jnp.asarray(verts), jnp.asarray(emo),
        sel, jax.random.PRNGKey(0),
    )
    assert set(losses) == {"verts", "verts_eye_area", "verts_mouth_area"}
    for v in losses.values():
        assert np.isfinite(float(v))


@pytest.mark.slow
def test_emo_cls_loss():
    """w_emo_cls_loss semantics (faceformer_disentangle.py:718-731): sampled
    frames rendered -> frozen FAN features -> CE vs the clip emotion label;
    differentiable w.r.t. vertices; -1 labels masked out."""
    from avi_talking_tpu.models import FanEncoder
    from avi_talking_tpu.train.emo_cls import EMO2IDX, EmoClsHead, EmoClsLoss

    assert EMO2IDX["happy"] == 5 and len(EMO2IDX) == 8

    assets = synthetic_assets(n_shape=8, n_exp=6)
    fan = FanEncoder()
    fan_vars = fan.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    head = EmoClsHead()
    head_vars = head.init(jax.random.PRNGKey(1), jnp.zeros((1, 512)))
    loss_fn = EmoClsLoss(
        faces=jnp.asarray(assets.faces), fan=fan, fan_vars=fan_vars,
        head=head, head_vars=head_vars, render_size=64, fan_size=64,
        stride=4,
    )
    rng = np.random.default_rng(3)
    B, T, V = 2, 8, assets.num_vertices
    verts = jnp.asarray(
        rng.standard_normal((B, T, V * 3)).astype(np.float32) * 0.1)
    labels = jnp.asarray([5, 1], jnp.int32)
    loss = loss_fn(verts, labels)
    assert np.isfinite(float(loss)) and float(loss) > 0
    g = jax.grad(lambda v: loss_fn(v, labels))(verts)
    assert np.isfinite(np.asarray(g)).all()
    # -1 labels contribute nothing; all-invalid batches stay finite
    l_mask = loss_fn(verts, jnp.asarray([5, -1], jnp.int32))
    assert np.isfinite(float(l_mask))
    l_none = loss_fn(verts, jnp.asarray([-1, -1], jnp.int32))
    assert float(l_none) == 0.0
