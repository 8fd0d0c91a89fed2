"""Rasterizer correctness, mesh IO roundtrip, visualizer end-to-end."""

import os

import jax.numpy as jnp
import numpy as np

from avi_talking_tpu.viz import (
    FlameVisualizer,
    Mesh,
    compute_vertex_normals,
    rasterize,
    read_obj,
    render_normal_maps,
    write_obj,
)


def test_rasterize_single_triangle():
    # big triangle covering the image center
    verts = jnp.asarray(
        [[-0.9, -0.9, 0.5], [0.9, -0.9, 0.5], [0.0, 0.9, 0.5]], jnp.float32
    )
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    attrs = jnp.asarray([[1.0], [1.0], [1.0]])
    img, mask = rasterize(verts, faces, attrs, 32, 32, chunk=4)
    m = np.asarray(mask)
    assert m[16, 16]  # center covered
    assert not m[0, 0] and not m[0, 31]  # top corners empty
    np.testing.assert_allclose(np.asarray(img)[16, 16, 0], 1.0, atol=1e-5)


def test_rasterize_zbuffer_order():
    # two stacked triangles; nearer (smaller z) must win
    verts = jnp.asarray(
        [
            [-0.9, -0.9, 0.8], [0.9, -0.9, 0.8], [0.0, 0.9, 0.8],  # far, attr 1
            [-0.9, -0.9, 0.2], [0.9, -0.9, 0.2], [0.0, 0.9, 0.2],  # near, attr 2
        ],
        jnp.float32,
    )
    faces = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    attrs = jnp.asarray([[1.0]] * 3 + [[2.0]] * 3)
    img, mask = rasterize(verts, faces, attrs, 16, 16, chunk=1)
    assert np.asarray(img)[8, 8, 0] == 2.0
    # reversed face order gives the same result (z-buffer, not paint order)
    img2, _ = rasterize(verts, faces[::-1], attrs, 16, 16, chunk=1)
    assert np.asarray(img2)[8, 8, 0] == 2.0


def test_barycentric_interpolation():
    verts = jnp.asarray(
        [[-1.0, -1.0, 0.5], [1.0, -1.0, 0.5], [0.0, 1.0, 0.5]], jnp.float32
    )
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    attrs = jnp.asarray([[0.0], [1.0], [0.5]])
    img, mask = rasterize(verts, faces, attrs, 64, 64)
    # attribute at the centroid ~ mean of corners
    got = np.asarray(img)[int(64 * (1 - 1 / 3 * 1) / 2), 32, 0]  # y ~ -1/3+...
    c = np.asarray(img)[42, 32, 0]
    assert 0.3 < c < 0.7


def test_vertex_normals_flat_plane():
    verts = jnp.asarray(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], jnp.float32
    )
    faces = jnp.asarray([[0, 1, 2], [2, 1, 3]], jnp.int32)
    n = np.asarray(compute_vertex_normals(verts, faces))
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-6)
    np.testing.assert_allclose(n[:, :2], 0.0, atol=1e-6)


def test_render_normal_maps_shapes():
    rng = np.random.default_rng(0)
    verts = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 20, 3)).astype(np.float32))
    faces = jnp.asarray(rng.integers(0, 20, (12, 3)), jnp.int32)
    imgs = render_normal_maps(verts, faces, 32, 32, chunk=4)
    assert imgs.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(imgs)).all()


def test_meshio_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    v = rng.standard_normal((10, 3)).astype(np.float32)
    f = rng.integers(0, 10, (5, 3)).astype(np.int32)
    c = rng.uniform(0, 1, (10, 3)).astype(np.float32)
    p = str(tmp_path / "mesh.obj")
    write_obj(p, v, f, colors=c)
    m = read_obj(p)
    np.testing.assert_allclose(m.vertices, v, atol=1e-5)
    np.testing.assert_array_equal(m.faces, f)
    np.testing.assert_allclose(m.colors, c, atol=1e-3)
    # ply write
    Mesh(v, f).save(str(tmp_path / "mesh.ply"))
    assert os.path.getsize(tmp_path / "mesh.ply") > 0


def test_flame_visualizer_end_to_end(tmp_path):
    from avi_talking_tpu.core import FlameModel, synthetic_assets

    assets = synthetic_assets(n_shape=8, n_exp=6)
    model = FlameModel(assets, n_shape=8, n_exp=6)
    T = 4
    exp = jnp.asarray(np.random.default_rng(2).standard_normal((T, 6)).astype(np.float32) * 0.3)
    verts = model.vertices_only(jnp.zeros((T, 8)), exp)
    viz = FlameVisualizer(np.asarray(assets.faces), image_size=64, frame_chunk=2)
    out = viz.visualize_verts(verts, str(tmp_path / "out.mp4"))
    assert os.path.exists(out)
    imgs = viz.render_verts(verts)
    assert imgs.shape == (T, 64, 64, 3)


def test_per_corner_attributes_and_textured_render():
    import jax.numpy as jnp
    from avi_talking_tpu.viz import render_textured
    from avi_talking_tpu.viz.rasterizer import rasterize as _rast

    verts = jnp.asarray(
        [[-0.9, -0.9, 0.5], [0.9, -0.9, 0.5], [0.0, 0.9, 0.5]], jnp.float32
    )
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    # per-corner attrs equal per-vertex gather for a single tri
    per_vertex = jnp.asarray([[1.0], [2.0], [3.0]])
    per_corner = per_vertex[faces]
    img_a, _ = _rast(verts, faces, per_vertex, 16, 16, chunk=1)
    img_b, _ = _rast(verts, faces, per_corner, 16, 16, chunk=1, per_corner=True)
    np.testing.assert_allclose(np.asarray(img_a), np.asarray(img_b), atol=1e-6)

    uvs = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [0.5, 1.0]], jnp.float32)
    face_uvs = jnp.asarray([[0, 1, 2]], jnp.int32)
    tex = jnp.ones((8, 8, 3)) * 0.8
    out = render_textured(verts[None], faces, uvs, face_uvs, tex, 16, 16)
    assert out.shape == (1, 16, 16, 3)
    o = np.asarray(out)
    assert o[0, 8, 8].max() > 0.05  # lit textured interior
    assert (o[0, 0, 0] == 0).all()  # background


def test_fixed_view_renderer():
    from avi_talking_tpu.core import FlameModel, synthetic_assets
    from avi_talking_tpu.viz import FixedViewRenderer

    assets = synthetic_assets(n_shape=8, n_exp=6)
    model = FlameModel(assets, 8, 6)
    verts = model.vertices_only(jnp.zeros((3, 8)), jnp.ones((3, 6)) * 0.1)
    r = FixedViewRenderer(np.asarray(assets.faces), image_size=32,
                          cams=((8.0, 0.0, 0.0), (8.0, 0.1, 0.0)))
    imgs = r.render(verts)
    assert imgs.shape == (2, 3, 32, 32, 3)
    crop = r.crop_mouth(imgs)
    assert crop.shape[-3] == int(0.85 * 32) - int(0.45 * 32)


def test_binned_rasterizer_matches_dense():
    from avi_talking_tpu.viz.rasterizer import rasterize, rasterize_binned

    rng = np.random.default_rng(9)
    V, F = 60, 40
    verts = jnp.asarray(rng.uniform(-0.9, 0.9, (V, 3)).astype(np.float32))
    faces = jnp.asarray(rng.integers(0, V, (F, 3)), jnp.int32)
    attrs = jnp.asarray(rng.standard_normal((V, 2)).astype(np.float32))
    img_d, m_d = rasterize(verts, faces, attrs, 64, 64, chunk=8)
    img_b, m_b = rasterize_binned(verts, faces, attrs, 64, 64, tile=16, cap=F)
    np.testing.assert_array_equal(np.asarray(m_b), np.asarray(m_d))
    np.testing.assert_allclose(np.asarray(img_b), np.asarray(img_d),
                               rtol=1e-5, atol=1e-5)


def test_render_grads_finite_on_degenerate_mesh():
    """Gradients through the shaded/textured renders stay finite when some
    vertices belong to no face (zero accumulated normal) and most pixels are
    uncovered (zero normal image) — the x/max(norm(x), eps) pattern used to
    NaN here because sqrt is differentiated at 0 BEFORE the clamp
    (viz.rasterizer.safe_unit clamps the squared norm instead)."""
    import jax

    from avi_talking_tpu.viz import render_textured
    from avi_talking_tpu.viz.shading import render_shaded

    rng = np.random.default_rng(5)
    V, F = 120, 100  # random faces -> many unused vertices + degenerates
    verts = jnp.asarray(rng.uniform(-0.8, 0.8, (2, V, 3)).astype(np.float32))
    faces = jnp.asarray(rng.integers(0, V, (F, 3)), jnp.int32)
    uvs = jnp.asarray(rng.uniform(0, 1, (V, 2)).astype(np.float32))
    tex = jnp.asarray(rng.uniform(0, 1, (16, 16, 3)).astype(np.float32))

    g = jax.grad(lambda v: render_shaded(v, faces, 32, 32).sum())(verts)
    assert bool(jnp.all(jnp.isfinite(g))) and float(jnp.abs(g).sum()) > 0
    g = jax.grad(
        lambda v: render_textured(v, faces, uvs, faces, tex, 32, 32).sum()
    )(verts)
    assert bool(jnp.all(jnp.isfinite(g))) and float(jnp.abs(g).sum()) > 0


def test_bin_overflow_diagnostic():
    """bin_overflow reports the silent face-drop hazard of the binned
    rasterizers: with cap >= the reported max count, binned == dense."""
    from avi_talking_tpu.viz.rasterizer import (
        bin_overflow,
        rasterize,
        rasterize_binned,
    )

    rng = np.random.default_rng(2)
    V, F = 200, 3000
    verts = jnp.asarray(rng.uniform(-0.9, 0.9, (V, 3)).astype(np.float32))
    faces = jnp.asarray(rng.integers(0, V, (F, 3)), jnp.int32)
    mx, frac = bin_overflow(verts, faces, 64, 64, tile=16, cap=512)
    assert int(mx) > 512 and float(frac) > 0  # big random faces overflow
    img_b, m_b = rasterize_binned(verts, faces, verts, 64, 64, tile=16,
                                  cap=int(mx))
    img_d, m_d = rasterize(verts, faces, verts, 64, 64, chunk=512)
    np.testing.assert_array_equal(np.asarray(m_b), np.asarray(m_d))
    np.testing.assert_allclose(np.asarray(img_b), np.asarray(img_d),
                               rtol=1e-4, atol=1e-5)
    # batched form agrees
    mx2, frac2 = bin_overflow(jnp.stack([verts, verts]), faces, 64, 64,
                              tile=16, cap=int(mx))
    assert int(mx2) == int(mx) and float(frac2) == 0.0
