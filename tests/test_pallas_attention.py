"""Pallas fused biased attention: interpret-mode parity (CPU tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from avi_talking_tpu.ops.pallas import fused_bias_attention


def _ref(q, k, v, bias):
    logits = jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32)
    return jnp.einsum(
        "bhts,bhsd->bhtd", jax.nn.softmax(logits + bias, axis=-1), v
    )


def test_matches_xla_attention():
    rng = np.random.default_rng(0)
    B, H, T, d = 2, 4, 24, 16
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, H, T, d)).astype(np.float32))
        for _ in range(3)
    )
    bias = jnp.asarray(rng.standard_normal((B, H, T, T)).astype(np.float32))
    out = fused_bias_attention(q, k, v, bias, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref(q, k, v, bias)), rtol=1e-5, atol=1e-5
    )


def test_broadcast_bias_and_neg_inf_masking():
    rng = np.random.default_rng(1)
    B, H, T, d = 1, 2, 8, 8
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, H, T, d)).astype(np.float32))
        for _ in range(3)
    )
    # causal -1e9 bias shared across batch/head
    i = np.arange(T)
    bias = np.where(i[None, :] > i[:, None], -1e9, 0.0).astype(np.float32)
    bias = jnp.asarray(bias)[None, None]
    out = fused_bias_attention(q, k, v, bias, interpret=True)
    ref = _ref(q, k, v, jnp.broadcast_to(bias, (B, H, T, T)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
    assert np.isfinite(np.asarray(out)).all()


def test_mha_module_fused_path_interpret(monkeypatch):
    """MultiHeadAttention(use_fused_kernel) == standard path (interpret)."""
    import avi_talking_tpu.ops.pallas.attention as pa
    from avi_talking_tpu.ops import MultiHeadAttention

    orig = pa.fused_bias_attention

    def interp(q, k, v, bias, interpret=False):
        return orig(q, k, v, bias, interpret=True)

    monkeypatch.setattr(pa, "fused_bias_attention", interp)

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 10, 32)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((4, 10, 10)).astype(np.float32))
    mha = MultiHeadAttention(32, 4)
    params = mha.init(jax.random.PRNGKey(0), x, x, x)
    ref = mha.apply(params, x, x, x, bias)
    mha_f = MultiHeadAttention(32, 4, use_fused_kernel=True)
    got = mha_f.apply(params, x, x, x, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_pallas_rasterizer_matches_binned(monkeypatch):
    """Interpret-mode equality of the Pallas tile kernel vs rasterize_binned."""
    import jax.numpy as jnp

    from avi_talking_tpu.viz.rasterizer import (
        rasterize_binned,
        rasterize_binned_pallas,
    )

    rng = np.random.default_rng(4)
    V, F = 60, 40
    verts = jnp.asarray(rng.uniform(-0.9, 0.9, (V, 3)).astype(np.float32))
    faces = jnp.asarray(rng.integers(0, V, (F, 3)), jnp.int32)
    attrs = jnp.asarray(rng.standard_normal((V, 3)).astype(np.float32))
    ref_img, ref_mask = rasterize_binned(verts, faces, attrs, 32, 32,
                                         tile=16, cap=F)
    img, mask = rasterize_binned_pallas(verts, faces, attrs, 32, 32,
                                        tile=16, cap=64, chunk=32,
                                        interpret=True)
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(ref_mask))
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref_img),
                               rtol=1e-4, atol=1e-5)
