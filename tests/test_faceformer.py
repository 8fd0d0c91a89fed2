"""Stage-1 FaceFormer: teacher-forced forward + KV-cached AR consistency.

The strongest check: with the start tokens aligned (zero obj_embedding and
zero vertice_map bias — both zero at reference init too), running the
teacher-forced decoder on the AR loop's own outputs must reproduce those
outputs exactly. That validates the KV cache, on-the-fly ALiBi bias and the
single-key cross-attention shortcut against the parallel decoder, which is
itself torch-parity-tested.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avi_talking_tpu.models import FaceFormerCoeff, FaceFormerConfig


@pytest.fixture(scope="module")
def tiny_ff():
    cfg = FaceFormerConfig.tiny()
    model = FaceFormerCoeff(cfg)
    B, T = 2, 12
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((B, T * 640)).astype(np.float32)
    coeffs = rng.standard_normal((B, T, cfg.vertice_dim)).astype(np.float32)
    eye = rng.standard_normal((B, T, cfg.eye_dim)).astype(np.float32)
    emo = rng.standard_normal((B, T, cfg.emo_dim)).astype(np.float32)
    ref = rng.standard_normal((B, 1, cfg.vertice_dim)).astype(np.float32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(audio), jnp.asarray(coeffs),
        jnp.asarray(eye), jnp.asarray(emo), jnp.asarray(ref),
    )
    return cfg, model, params, audio, coeffs, eye, emo, ref


def test_teacher_forced_shapes(tiny_ff):
    cfg, model, params, audio, coeffs, eye, emo, ref = tiny_ff
    out = model.apply(params, audio, coeffs, eye, emo, ref)
    assert out.shape == coeffs.shape
    assert np.isfinite(np.asarray(out)).all()


def test_zero_init_head_outputs_zero(tiny_ff):
    cfg, model, params, audio, coeffs, eye, emo, ref = tiny_ff
    # vertice_map_r is zero-initialised like the reference
    # (faceformer.py:157-158) so the fresh model emits zeros.
    out = model.apply(params, audio, coeffs, eye, emo, ref)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def _randomize(params, scale=0.05, seed=7):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.default_rng(seed)
    new = [
        jnp.asarray(rng.standard_normal(l.shape).astype(np.float32) * scale)
        for l in leaves
    ]
    return jax.tree_util.tree_unflatten(treedef, new)


def test_ar_predict_consistent_with_teacher_forcing(tiny_ff):
    cfg, model, params, audio, coeffs, eye, emo, ref = tiny_ff
    T = coeffs.shape[1]
    # randomise weights, then align the two start tokens: zero
    # obj_embedding (AR start) and zero vertice_map bias (TF zero-shift start)
    p = _randomize(params["params"])
    p["obj_embedding"] = jnp.zeros_like(p["obj_embedding"])
    p["vertice_map"]["bias"] = jnp.zeros_like(p["vertice_map"]["bias"])
    params2 = {"params": p}

    ar = model.apply(
        params2, audio, T, eye, emo, ref, method=FaceFormerCoeff.predict
    )
    assert ar.shape == coeffs.shape

    # teacher-force on the AR outputs: shifted input tokens equal the AR
    # feedback tokens, so outputs must match step-for-step.
    tf = model.apply(params2, audio, np.asarray(ar), eye, emo, ref)
    np.testing.assert_allclose(np.asarray(tf), np.asarray(ar), rtol=2e-4, atol=2e-5)


def test_predict_jits(tiny_ff):
    cfg, model, params, audio, coeffs, eye, emo, ref = tiny_ff
    T = coeffs.shape[1]
    fn = jax.jit(
        lambda p, a: model.apply(p, a, T, eye, emo, ref, method=FaceFormerCoeff.predict)
    )
    out = fn(params, audio)
    assert out.shape == (2, T, cfg.vertice_dim)


def test_without_condition_merge():
    cfg = FaceFormerConfig.tiny()
    cfg = type(cfg)(**{**cfg.__dict__, "with_condition_merge": False})
    model = FaceFormerCoeff(cfg)
    B, T = 1, 8
    rng = np.random.default_rng(1)
    audio = rng.standard_normal((B, T * 640)).astype(np.float32)
    coeffs = rng.standard_normal((B, T, cfg.vertice_dim)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(audio), jnp.asarray(coeffs))
    out = model.apply(params, audio, coeffs)
    assert out.shape == coeffs.shape
