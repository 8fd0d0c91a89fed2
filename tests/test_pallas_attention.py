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


def test_pallas_rasterizer_gradients_match_xla():
    """The Pallas visibility kernel is wrapped so the whole binned path is
    differentiable; grads wrt vertices AND attributes must match the XLA
    binned path (both treat visibility as stop-gradient)."""
    import jax
    import jax.numpy as jnp

    from avi_talking_tpu.viz.rasterizer import (
        rasterize_binned,
        rasterize_binned_pallas,
    )

    rng = np.random.default_rng(7)
    V, F, H = 80, 60, 32
    verts = jnp.asarray(rng.uniform(-0.9, 0.9, (V, 3)).astype(np.float32))
    faces = jnp.asarray(rng.integers(0, V, (F, 3)), jnp.int32)
    attrs = jnp.asarray(rng.standard_normal((V, 3)).astype(np.float32))

    def loss_p(v, a):
        img, _ = rasterize_binned_pallas(v, faces, a, H, H, tile=16, cap=32,
                                         chunk=16, interpret=True)
        return (img ** 2).sum()

    def loss_x(v, a):
        img, _ = rasterize_binned(v, faces, a, H, H, tile=16, cap=32)
        return (img ** 2).sum()

    gp = jax.grad(loss_p, argnums=(0, 1))(verts, attrs)
    gx = jax.grad(loss_x, argnums=(0, 1))(verts, attrs)
    for p, x in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(p), np.asarray(x),
                                   rtol=1e-3, atol=1e-4)
    assert float(jnp.abs(gp[0]).sum()) > 0  # vertices actually get grads


def test_pallas_rasterizer_bwd_graph_shape():
    """Pin the hand-composed interp backward's graph structure: ONE packed
    (6+3C)-channel scatter + six tiny face->vertex scatters, and no
    block-shaped gather cotangents. Letting autodiff rebuild this backward
    costs 13.8 ms/frame + a 206 s compile on v5e (measured round 3 — see
    viz/rasterizer.py); this guard catches such a regression on CPU by
    bounding the scatter count in the lowered grad HLO."""
    import jax
    import jax.numpy as jnp

    from avi_talking_tpu.viz.rasterizer import rasterize_binned_pallas

    rng = np.random.default_rng(7)
    V, F, H = 80, 60, 32
    verts = jnp.asarray(rng.uniform(-0.9, 0.9, (V, 3)).astype(np.float32))
    faces = jnp.asarray(rng.integers(0, V, (F, 3)), jnp.int32)
    attrs = jnp.asarray(rng.standard_normal((V, 3)).astype(np.float32))

    def loss(v, a):
        img, _ = rasterize_binned_pallas(v, faces, a, H, H, tile=16, cap=32,
                                         chunk=16, interpret=True)
        return (img ** 2).sum()

    txt = jax.jit(jax.grad(loss, argnums=(0, 1))).lower(verts, attrs).as_text()
    n_scatter = txt.count('"stablehlo.scatter"(')
    # exactly 1 packed (K, F+1) + 6 dv column + 3 da scatters today; small
    # headroom but far below what an autodiff component backward emits.
    assert 0 < n_scatter <= 14, f"interp bwd scatter count drifted: {n_scatter}"


def test_per_corner_binned_and_pallas_match_dense():
    """Per-corner (F, 3, C) attributes through the binned and Pallas paths
    must match the dense rasterizer (which always supported them), values
    AND gradients — this is the path render_textured rides on TPU."""
    import jax
    import jax.numpy as jnp

    from avi_talking_tpu.viz.rasterizer import (
        rasterize,
        rasterize_binned,
        rasterize_binned_pallas,
    )

    rng = np.random.default_rng(11)
    V, F, H = 80, 64, 32
    verts = jnp.asarray(rng.uniform(-0.9, 0.9, (V, 3)).astype(np.float32))
    faces = jnp.asarray(rng.integers(0, V, (F, 3)), jnp.int32)
    cattrs = jnp.asarray(rng.standard_normal((F, 3, 4)).astype(np.float32))

    img_d, m_d = rasterize(verts, faces, cattrs, H, H, chunk=16,
                           per_corner=True)
    img_b, m_b = rasterize_binned(verts, faces, cattrs, H, H, tile=16,
                                  cap=F, per_corner=True)
    img_p, m_p = rasterize_binned_pallas(verts, faces, cattrs, H, H, tile=16,
                                         cap=64, chunk=32, interpret=True,
                                         per_corner=True)
    np.testing.assert_array_equal(np.asarray(m_b), np.asarray(m_d))
    np.testing.assert_array_equal(np.asarray(m_p), np.asarray(m_d))
    np.testing.assert_allclose(np.asarray(img_b), np.asarray(img_d),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_d),
                               rtol=1e-4, atol=1e-5)

    def loss_p(v, a):
        img, _ = rasterize_binned_pallas(v, faces, a, H, H, tile=16, cap=64,
                                         chunk=32, interpret=True,
                                         per_corner=True)
        return (img ** 2).sum()

    def loss_b(v, a):
        img, _ = rasterize_binned(v, faces, a, H, H, tile=16, cap=F,
                                  per_corner=True)
        return (img ** 2).sum()

    gp = jax.grad(loss_p, argnums=(0, 1))(verts, cattrs)
    gb = jax.grad(loss_b, argnums=(0, 1))(verts, cattrs)
    for p, b in zip(gp, gb):
        np.testing.assert_allclose(np.asarray(p), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
    assert float(jnp.abs(gp[1]).sum()) > 0  # corner attrs get gradients


def test_rasterize_auto_backends():
    """Dispatcher: dense for small meshes, binned/pallas selectable."""
    import jax.numpy as jnp

    from avi_talking_tpu.viz.rasterizer import rasterize_auto

    rng = np.random.default_rng(5)
    verts = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 50, 3)).astype(np.float32))
    faces = jnp.asarray(rng.integers(0, 50, (30, 3)), jnp.int32)
    attrs = jnp.asarray(rng.standard_normal((2, 50, 3)).astype(np.float32))
    img_d, m_d = rasterize_auto(verts, faces, attrs, 32, 32)  # dense (F small)
    img_b, m_b = rasterize_auto(verts, faces, attrs, 32, 32, tile=16, cap=32,
                                backend="binned")
    np.testing.assert_array_equal(np.asarray(m_d), np.asarray(m_b))
    np.testing.assert_allclose(np.asarray(img_d), np.asarray(img_b),
                               rtol=1e-4, atol=1e-5)


def test_binned_overflow_drops_farthest_first():
    """Cap overflow semantics: ``_bin_faces`` keys its top_k by DEPTH, so a
    tile past ``cap`` drops its farthest (occluded) faces — a near face
    must survive even when it carries the highest face index (index-keyed
    compaction would silently drop the visible winner here)."""
    import jax.numpy as jnp

    from avi_talking_tpu.viz.rasterizer import rasterize, rasterize_binned

    H, tile, cap = 16, 16, 8
    vs, fs = [], []
    # 12 tiny FAR triangles (indices 0..11) crowd the single tile past cap.
    for i in range(12):
        x = -0.9 + 0.15 * i
        b = len(vs)
        vs += [[x, -0.9, 0.9], [x + 0.05, -0.9, 0.9], [x, -0.85, 0.9]]
        fs.append([b, b + 1, b + 2])
    b = len(vs)  # one NEAR full-tile triangle at the HIGHEST index
    vs += [[-2.0, -2.0, 0.1], [2.0, -2.0, 0.1], [0.0, 3.0, 0.1]]
    fs.append([b, b + 1, b + 2])
    vs = jnp.asarray(np.asarray(vs, np.float32))
    fs = jnp.asarray(np.asarray(fs, np.int32))
    at = jnp.asarray(np.arange(vs.shape[0], dtype=np.float32)[:, None])
    img_d, m_d = rasterize(vs, fs, at, H, H)
    img_b, m_b = rasterize_binned(vs, fs, at, H, H, tile=tile, cap=cap)
    np.testing.assert_array_equal(np.asarray(m_b), np.asarray(m_d))
    np.testing.assert_array_equal(np.asarray(img_b), np.asarray(img_d))


def _head_proxy_mesh(n_lat=48, n_lon=44):
    """FLAME-density stand-in: a full-head ellipsoid (front AND back faces
    bin like FLAME's) at DECA-crop framing."""
    vs, fs = [], []
    for i in range(n_lat + 1):
        th = np.pi * i / n_lat
        for j in range(n_lon):
            ph = 2 * np.pi * j / n_lon
            vs.append([0.58 * np.sin(th) * np.cos(ph),
                       0.78 * np.cos(th),
                       0.5 * np.sin(th) * np.sin(ph) + 0.6])
    for i in range(n_lat):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            fs.append([a, b, a + n_lon])
            fs.append([b, b + n_lon, a + n_lon])
    return (np.asarray(vs, np.float32), np.asarray(fs, np.int32))


def test_auto_tile_rule():
    """tile=None picks 56 only where it divides both dims AND the mesh is
    FLAME-class (<=20k faces); BFM-class front-facing patches keep 32 (their
    per-tile counts would blow past cap — see rasterize_auto docstring)."""
    from avi_talking_tpu.viz.rasterizer import _auto_tile

    assert _auto_tile(224, 224, 9976) == 56   # EMOTE neural-loss renders
    assert _auto_tile(256, 256, 9976) == 32   # 56 doesn't divide 256
    assert _auto_tile(224, 224, 70789) == 32  # BFM stays on the safe tile


def test_tile56_overflow_is_exact_on_head_mesh():
    """The 224^2 tile=56 auto config OVERFLOWS its cap on a FLAME-density
    full-head mesh (at the real 9976-face density and cap=1024: max
    occupancy ~1.6k, ~38% of tiles — measured on the 72x72 proxy) yet must
    stay pixel-identical to the dense rasterizer: depth-keyed capping culls
    only occluded back-of-head faces. The test reproduces that regime at a
    CPU-friendly 4224 faces by shrinking cap to 512 (same visible-winner
    headroom ratio)."""
    import jax.numpy as jnp

    from avi_talking_tpu.viz.rasterizer import (
        bin_overflow,
        rasterize,
        rasterize_auto,
    )

    pv, pf = _head_proxy_mesh()
    assert pf.shape[0] >= 4096  # big enough for rasterize_auto to bin
    cap = 512
    mx, frac = bin_overflow(jnp.asarray(pv), jnp.asarray(pf), 224, 224,
                            tile=56, cap=cap)
    assert int(mx) > cap and float(frac) > 0  # the test exercises overflow
    rng = np.random.default_rng(3)
    pa = jnp.asarray(rng.standard_normal((pv.shape[0], 3)).astype(np.float32))
    img_d, m_d = rasterize(jnp.asarray(pv), jnp.asarray(pf), pa, 224, 224)
    img_b, m_b = rasterize_auto(jnp.asarray(pv)[None], jnp.asarray(pf),
                                pa[None], 224, 224, cap=cap,
                                backend="binned")
    np.testing.assert_array_equal(np.asarray(m_b[0]), np.asarray(m_d))
    np.testing.assert_allclose(np.asarray(img_b[0]), np.asarray(img_d),
                               rtol=1e-5, atol=1e-6)


def test_keybias_attention_matches_xla_and_grads():
    """Pallas key-bias attention (wav2vec2-encoder fast path): interpret-mode
    forward parity + custom_vjp gradient parity vs the XLA formulation."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from avi_talking_tpu.ops.pallas.attention import keybias_attention

    B, H, T, d = 2, 3, 16, 8
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, T, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, T, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, T, d)).astype(np.float32))
    lens = np.array([12, 16])
    kb = jnp.asarray(
        np.where(np.arange(T)[None] < lens[:, None], 0.0, -1e9).astype(
            np.float32))

    def xla(q, k, v, kb):
        s = jnp.einsum("bhtd,bhsd->bhts", q, k) + kb[:, None, None, :]
        return jnp.einsum("bhts,bhsd->bhtd", jax.nn.softmax(s, -1), v)

    out = keybias_attention(q, k, v, kb, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(xla(q, k, v, kb)),
                               atol=1e-5, rtol=1e-5)

    def loss_p(q, k, v, kb):
        return (keybias_attention(q, k, v, kb, True) ** 2).sum()

    def loss_x(q, k, v, kb):
        return (xla(q, k, v, kb) ** 2).sum()

    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(q, k, v, kb)
    gx = jax.grad(loss_x, argnums=(0, 1, 2, 3))(q, k, v, kb)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_keybias_distinct_per_batch_masks_parity():
    """Parity with DISTINCT per-batch masks (catches any kb-to-grid-step
    misalignment in the i // H index map). Head-batched grid steps were
    tried and RETIRED: the rank-3 batched kernel SIGABRTs Mosaic on real
    TPU, and the unrolled variant measured slower than hb=1 at its own
    target shape (see _attn_kernel_keybias docstring for the numbers)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from avi_talking_tpu.ops.pallas.attention import fused_keybias_attention

    B, H, T, d = 3, 4, 24, 8
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((B, H, T, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, T, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, T, d)).astype(np.float32))
    kb = jnp.asarray(
        np.where(np.arange(T)[None] < np.array([8, 16, 24])[:, None],
                 0.0, -1e9).astype(np.float32))
    ref = jnp.einsum(
        "bhts,bhsd->bhtd",
        jax.nn.softmax(jnp.einsum("bhtd,bhsd->bhts", q, k)
                       + kb[:, None, None, :], -1), v)
    out = fused_keybias_attention(q, k, v, kb, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_encoder_layer_pallas_path_matches_xla(monkeypatch):
    """EncoderLayer with the Pallas fast path forced on (interpret) equals
    the XLA path, with and without a (B,1,1,S) padding bias."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from avi_talking_tpu.audio import wav2vec2 as w2v
    from avi_talking_tpu.ops.pallas import attention as pa

    monkeypatch.setattr(pa, "pallas_available", lambda: True)
    orig = pa.fused_keybias_attention

    def interp(q, k, v, kb, interpret=False):
        return orig(q, k, v, kb, interpret=True)

    monkeypatch.setattr(pa, "fused_keybias_attention", interp)

    cfg_p = w2v.dataclasses.replace(
        w2v.Wav2Vec2Config.tiny(), use_pallas_attention=True)
    cfg_x = w2v.Wav2Vec2Config.tiny()  # default: XLA path
    layer_p = w2v.EncoderLayer(cfg_p)
    layer_x = w2v.EncoderLayer(cfg_x)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 12, 32)).astype(np.float32))
    variables = layer_x.init(jax.random.PRNGKey(0), x)
    for bias in (None,
                 jnp.asarray(np.where(np.arange(12) < 9, 0.0, -1e9)
                             .astype(np.float32))[None, None, None, :]
                 .repeat(2, 0)):
        ref = layer_x.apply(variables, x, attn_bias=bias)
        got = layer_p.apply(variables, x, attn_bias=bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def test_keybias_auto_policy_threshold(monkeypatch):
    """use_pallas_attention='auto' picks the kernel only above the measured
    B*H*T crossover; small shapes keep the XLA path even on TPU."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from avi_talking_tpu.audio import wav2vec2 as w2v
    from avi_talking_tpu.ops.pallas import attention as pa

    monkeypatch.setattr(pa, "pallas_available", lambda: True)
    calls = []
    orig = pa.fused_keybias_attention

    def spy(q, k, v, kb, interpret=False):
        calls.append(q.shape)
        return orig(q, k, v, kb, interpret=True)

    monkeypatch.setattr(pa, "fused_keybias_attention", spy)

    cfg = w2v.Wav2Vec2Config.tiny(hidden=32, heads=4)  # auto by default
    layer = w2v.EncoderLayer(cfg)
    small = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((2, 16, 32)).astype(np.float32))
    variables = layer.init(jax.random.PRNGKey(0), small)
    layer.apply(variables, small)  # 2*4*16 = 128 << threshold
    assert calls == []
    big = jnp.asarray(np.random.default_rng(1)
                      .standard_normal((32, 400, 32)).astype(np.float32))
    layer.apply(variables, big)  # 32*4*400 = 51_200 >= 48_000, T >= 384
    assert len(calls) == 1
    # large grid but SHORT sequence: whole-model measurements show the
    # kernel losing below T=384 (config docstring) -> XLA path
    short = jnp.asarray(np.random.default_rng(2)
                        .standard_normal((64, 200, 32)).astype(np.float32))
    layer.apply(variables, short)  # 64*4*200 = 51_200 but T=200 < 384
    assert len(calls) == 1
