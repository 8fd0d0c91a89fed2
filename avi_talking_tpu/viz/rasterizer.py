"""Pure-JAX differentiable triangle rasterizer (pytorch3d replacement).

The reference delegates rasterization to pytorch3d's C++/CUDA
``rasterize_meshes`` (gdl/models/Renderer.py:116,
visualize/flame_visualization.py:86). On TPU there is no extension
mechanism — instead the rasterizer is expressed as dense masked math that
XLA maps onto the VPU: for a chunk of faces, edge-function barycentrics are
evaluated against the full pixel grid, and a z-buffer argmin folds chunks
sequentially (``lax.scan`` over face chunks => O(F/chunk) fused steps, flat
HBM footprint).

Conventions (matching the DECA/FLAME usage): vertices in NDC, x right /
y up in [-1, 1]; z is DEPTH (smaller = closer). Attributes are per-vertex
and interpolated with the barycentrics (hard rasterization, 1 face/pixel —
what SRenderY's rasterizer does for render losses and normal videos).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

BIG = 1e9


def _pixel_grid(h: int, w: int, dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
    ys = 1.0 - (2.0 * jnp.arange(h, dtype=dtype) + 1.0) / h
    xs = -1.0 + (2.0 * jnp.arange(w, dtype=dtype) + 1.0) / w
    return jnp.meshgrid(xs, ys)  # each (h, w) with [0]=x, [1]=y


@partial(jax.jit, static_argnums=(3, 4, 5, 6))
def rasterize(
    vertices: jax.Array,  # (V, 3) NDC, z = depth
    faces: jax.Array,  # (F, 3) int
    attributes: jax.Array,  # (V, C) per-vertex OR (F, 3, C) per-corner
    height: int,
    width: int,
    chunk: int = 2048,  # measured fastest on v5e (51 ms/frame @256^2, FLAME mesh)
    per_corner: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Hard-rasterize one mesh -> ((H, W, C) image, (H, W) mask).

    ``per_corner=True`` takes (F, 3, C) face-corner attributes (e.g. FLAME's
    per-face UV indices, which don't share per-vertex values across seams).
    """
    V = vertices.shape[0]
    F = faces.shape[0]
    C = attributes.shape[-1]
    dtype = vertices.dtype

    px, py = _pixel_grid(height, width, dtype)
    px = px.reshape(-1)  # (P,)
    py = py.reshape(-1)
    P = px.shape[0]

    n_chunks = -(-F // chunk)
    pad = n_chunks * chunk - F
    faces_p = jnp.concatenate([faces, jnp.zeros((pad, 3), faces.dtype)], axis=0)
    valid = jnp.concatenate(
        [jnp.ones((F,), bool), jnp.zeros((pad,), bool)]
    ).reshape(n_chunks, chunk)
    faces_p = faces_p.reshape(n_chunks, chunk, 3)

    tri_all = vertices[faces_p]  # (n_chunks, chunk, 3(corner), 3(xyz))
    if per_corner:
        attr_p = jnp.concatenate(
            [attributes, jnp.zeros((pad, 3, C), attributes.dtype)], axis=0
        )
        attr_all = attr_p.reshape(n_chunks, chunk, 3, C)
    else:
        attr_all = attributes[faces_p]  # (n_chunks, chunk, 3, C)

    def body(carry, inp):
        zbuf, img, mask = carry
        tri, attr, is_valid = inp  # (chunk, 3, 3), (chunk, 3, C), (chunk,)
        x0, y0 = tri[:, 0, 0, None], tri[:, 0, 1, None]  # (chunk, 1)
        x1, y1 = tri[:, 1, 0, None], tri[:, 1, 1, None]
        x2, y2 = tri[:, 2, 0, None], tri[:, 2, 1, None]
        denom = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2)  # (chunk, 1)
        safe = jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
        w0 = ((y1 - y2) * (px[None] - x2) + (x2 - x1) * (py[None] - y2)) / safe
        w1 = ((y2 - y0) * (px[None] - x2) + (x0 - x2) * (py[None] - y2)) / safe
        w2 = 1.0 - w0 - w1  # (chunk, P)
        inside = (
            (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0)
            & (jnp.abs(denom) > 1e-12)
            & is_valid[:, None]
        )
        z = (
            w0 * tri[:, 0, 2, None]
            + w1 * tri[:, 1, 2, None]
            + w2 * tri[:, 2, 2, None]
        )
        z = jnp.where(inside, z, BIG)  # (chunk, P)
        best = jnp.argmin(z, axis=0)  # (P,)
        best_z = jnp.take_along_axis(z, best[None], axis=0)[0]  # (P,)
        covered = best_z < BIG
        closer = covered & (best_z < zbuf)

        bary = jnp.stack(
            [
                jnp.take_along_axis(w0, best[None], axis=0)[0],
                jnp.take_along_axis(w1, best[None], axis=0)[0],
                jnp.take_along_axis(w2, best[None], axis=0)[0],
            ],
            axis=-1,
        )  # (P, 3)
        attr_best = attr[best]  # (P, 3, C)
        pix = jnp.einsum("pk,pkc->pc", bary, attr_best)  # (P, C)

        zbuf = jnp.where(closer, best_z, zbuf)
        img = jnp.where(closer[:, None], pix, img)
        mask = mask | closer
        return (zbuf, img, mask), None

    init = (
        jnp.full((P,), BIG, dtype),
        jnp.zeros((P, C), dtype),
        jnp.zeros((P,), bool),
    )
    (zbuf, img, mask), _ = jax.lax.scan(body, init, (tri_all, attr_all, valid))
    return img.reshape(height, width, C), mask.reshape(height, width)


def rasterize_batch(vertices, faces, attributes, height, width, chunk=2048):
    """vmap over batch: (B, V, 3), (B, V, C) -> (B, H, W, C), (B, H, W)."""
    return jax.vmap(lambda v, a: rasterize(v, faces, a, height, width, chunk))(
        vertices, attributes
    )


def _on_tpu() -> bool:
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    return plat in ("tpu", "axon")


def _auto_tile(height: int, width: int, n_faces: int) -> int:
    """Tile-size pick for ``rasterize_auto(tile=None)`` — see its docstring."""
    return 56 if (height % 56 == 0 and width % 56 == 0
                  and n_faces <= 20000) else 32


def rasterize_auto(vertices, faces, attributes, height, width,
                   tile=None, cap=1024, chunk=2048, backend=None,
                   per_corner=False):
    """Batch rasterization through the fastest available path.

    Dispatch (measured v5e, FLAME 9976 faces @256^2): Pallas binned
    4.6 ms/frame < XLA binned 9.6 ms < dense scan 56 ms. Meshes too small
    to bin (or odd sizes) fall back to the dense path; non-TPU backends use
    the XLA binned path (Mosaic kernels are TPU-only).
    ``tile``: None picks per image size — 56 where it divides both dims
    (224^2, the EMOTE neural-loss resolution: measured fwd 2.44 / grad
    2.93 ms vs tile=32's 3.10 / 3.94 on v5e; overflow past ``cap`` drops
    farthest-first, see ``rasterize_binned``), else the 32 default that
    won the 256^2 sweep. The 56 pick is gated on F <= 20k: per-tile face
    counts scale with tile area x mesh density, and for BFM-class meshes
    (~70k faces, a FRONT-FACING patch where every binned face can be
    visible) tile=56 would push counts past even render_bfm's cap=4096 —
    farthest-first dropping then cuts visible geometry, not occluded
    back-of-head faces as on full-head FLAME meshes.
    ``backend``: None (auto) | "pallas" | "binned" | "dense".
    ``per_corner``: attributes are (F, 3, C) face-corner values (UV seams)
    instead of (V, C) — supported by every backend; a leading batch dim
    ((B, F, 3, C) / (B, V, C)) pairs attributes with the vertex batch.
    """
    if tile is None:
        tile = _auto_tile(height, width, faces.shape[0])
    can_bin = faces.shape[0] >= 4096 and height % tile == 0 and width % tile == 0
    if backend is None:
        backend = ("pallas" if _on_tpu() else "binned") if can_bin else "dense"
    if attributes.ndim == (4 if per_corner else 3):  # batched attributes
        in_axes = (0, 0)
    else:
        in_axes = (0, None)
    if backend == "pallas":
        fn = lambda v, a: rasterize_binned_pallas(  # noqa: E731
            v, faces, a, height, width, tile=tile, cap=cap,
            per_corner=per_corner)
    elif backend == "binned":
        fn = lambda v, a: rasterize_binned(  # noqa: E731
            v, faces, a, height, width, tile, cap, per_corner)
    else:
        fn = lambda v, a: rasterize(  # noqa: E731
            v, faces, a, height, width, chunk, per_corner)
    return jax.vmap(fn, in_axes=in_axes)(vertices, attributes)


def safe_unit(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Normalize along the last axis with a NaN-free gradient at x == 0.

    ``x / maximum(norm(x), eps)`` differentiates sqrt at 0 (inf) BEFORE the
    clamp, so a zero vector (unused/degenerate vertex, uncovered pixel)
    poisons the whole gradient with NaN. Clamping the SQUARED norm first
    keeps rsqrt away from 0 in both value and derivative."""
    n2 = jnp.sum(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(n2, eps * eps))


def compute_vertex_normals(vertices: jax.Array, faces: jax.Array) -> jax.Array:
    """Area-weighted vertex normals, (B, V, 3) or (V, 3) input."""
    squeeze = vertices.ndim == 2
    if squeeze:
        vertices = vertices[None]
    tri = vertices[:, faces]  # (B, F, 3, 3)
    fn = jnp.cross(tri[:, :, 1] - tri[:, :, 0], tri[:, :, 2] - tri[:, :, 0])
    B, V = vertices.shape[:2]
    normals = jnp.zeros((B, V, 3), vertices.dtype)
    for k in range(3):
        normals = normals.at[:, faces[:, k]].add(fn)
    normals = safe_unit(normals, 1e-12)
    if squeeze:
        return normals[0]
    return normals


def render_normal_maps(
    vertices: jax.Array,  # (B, V, 3) NDC (z = depth)
    faces: jax.Array,
    height: int = 256,
    width: int = 256,
    chunk: int = 2048,
    background: float = 0.0,
) -> jax.Array:
    """Render per-pixel world-space normals in [0, 1] like the reference's
    normal-map visualisation (visualize/flame_visualization.py:75-143).

    Large spatially-coherent meshes (FLAME) go through the binned
    rasterizer (measured 4x faster on v5e: 14 vs 56 ms/frame at 256^2)."""
    normals = compute_vertex_normals(vertices, faces)
    img, mask = rasterize_auto(vertices, faces, normals, height, width,
                               chunk=chunk)
    shaded = img * 0.5 + 0.5
    return jnp.where(mask[..., None], shaded, background)



def _face_tile_overlap(vertices, faces, height, width, tile):
    """(n_tiles, F) bool: face bbox overlaps tile rect (NDC: x [-1,1]
    left->right; y [1,-1] top->bottom rows)."""
    F = faces.shape[0]
    dtype = vertices.dtype
    ty, tx = height // tile, width // tile
    tri = vertices[faces]  # (F, 3, 3)
    fx_min = tri[..., 0].min(axis=1)
    fx_max = tri[..., 0].max(axis=1)
    fy_min = tri[..., 1].min(axis=1)
    fy_max = tri[..., 1].max(axis=1)
    tile_w = 2.0 / tx
    tile_h = 2.0 / ty
    tx0 = -1.0 + jnp.arange(tx, dtype=dtype) * tile_w
    ty1 = 1.0 - jnp.arange(ty, dtype=dtype) * tile_h
    ox = (fx_min[None, :] <= (tx0 + tile_w)[:, None]) & (fx_max[None, :] >= tx0[:, None])
    oy = (fy_max[None, :] >= (ty1 - tile_h)[:, None]) & (fy_min[None, :] <= ty1[:, None])
    return (oy[:, None, :] & ox[None, :, :]).reshape(ty * tx, F)


def _bin_faces(vertices, faces, height, width, tile, cap):
    """Stage 1 of the tiled rasterizers: bbox face->tile binning.

    Returns (face_ids (n_tiles, cap) with F as the invalid sentinel,
    tri_p (F+1, 3, 3) padded corner table, per-tile pixel grids pxg/pyg
    (n_tiles, tile*tile), and (ty, tx))."""
    assert height % tile == 0 and width % tile == 0
    F = faces.shape[0]
    dtype = vertices.dtype
    ty, tx = height // tile, width // tile
    n_tiles = ty * tx

    tri = vertices[faces]  # (F, 3, 3)
    overlap = _face_tile_overlap(vertices, faces, height, width, tile)

    # compaction via top_k on a score key: ~5x faster than the vmapped
    # jnp.where(size=cap) lowering on v5e (1.3 ms vs 6.5 ms at 64 tiles x
    # 9976 faces). The score is DEPTH-keyed (nearest face highest) so a
    # tile past ``cap`` drops its FARTHEST faces first — overflow then
    # degrades to culling occluded geometry instead of whichever faces
    # happen to carry high indices (which could drop the visible winner).
    # zref keeps scores positive without a large additive constant that
    # would eat float32 mantissa (depth resolution survives).
    zmin = jax.lax.stop_gradient(tri[:, :, 2].min(axis=1))  # (F,)
    zref = zmin.max() + 1.0
    scores = jnp.where(overlap, zref - zmin[None], 0.0)
    top_vals, top_idx = jax.lax.top_k(scores, min(cap, F))
    face_ids = jnp.where(top_vals > 0, top_idx, F)
    # restore ascending-face-id order within each tile: stage 2 breaks
    # exact-z ties by FIRST table slot (jnp.argmin / the Pallas kernel's
    # smallest-row rule), and the dense path resolves them by lowest face
    # id — sorting keeps the three backends bit-identical when not
    # overflowing. The F sentinel sorts to the tail on its own.
    face_ids = jnp.sort(face_ids, axis=1)
    if cap > F:  # pad to the requested table width with the sentinel
        face_ids = jnp.concatenate(
            [face_ids, jnp.full((n_tiles, cap - F), F, face_ids.dtype)], axis=1
        )

    tri_p = jnp.concatenate([tri, jnp.zeros((1, 3, 3), dtype)], axis=0)

    pxg, pyg = _pixel_grid(height, width, dtype)
    pxg = pxg.reshape(ty, tile, tx, tile).transpose(0, 2, 1, 3).reshape(n_tiles, -1)
    pyg = pyg.reshape(ty, tile, tx, tile).transpose(0, 2, 1, 3).reshape(n_tiles, -1)
    return face_ids, tri_p, pxg, pyg, (ty, tx)


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def bin_overflow(
    vertices: jax.Array,  # (V, 3) or (B, V, 3)
    faces: jax.Array,
    height: int,
    width: int,
    tile: int = 32,
    cap: int = 1024,
) -> Tuple[jax.Array, jax.Array]:
    """Diagnostic for the binned rasterizers' silent face-drop hazard.

    Returns (max bbox-overlap face count over tiles, fraction of tiles
    whose count exceeds ``cap``). A nonzero fraction means tiles are
    dropping their farthest faces — raise ``cap`` (see render_bfm's 4096
    for the ~70k-face BFM mesh vs FLAME's 1024 default)."""
    if vertices.ndim == 3:
        counts = jax.vmap(
            lambda v: _face_tile_overlap(v, faces, height, width, tile)
            .sum(axis=1)
        )(vertices)
    else:
        counts = _face_tile_overlap(vertices, faces, height, width, tile).sum(
            axis=1
        )
    return counts.max(), (counts > cap).mean()


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def rasterize_binned(
    vertices: jax.Array,  # (V, 3) NDC, z = depth
    faces: jax.Array,  # (F, 3)
    attributes: jax.Array,  # (V, C) or (F, 3, C) with per_corner
    height: int,
    width: int,
    tile: int = 32,
    cap: int = 1024,
    per_corner: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Two-stage tiled rasterizer (pytorch3d-style coarse binning).

    Stage 1 bins faces to pixel tiles by bounding box (a (tiles, F) overlap
    matrix + fixed-``cap`` compaction with ``jnp.where(size=cap)`` — all
    static shapes). Stage 2 evaluates barycentrics only for the <=cap faces
    per tile, a ~F/cap work reduction over ``rasterize`` on meshes whose
    faces are spatially coherent (measured 4.3x on FLAME at 256^2, see
    docstring bench note). A tile past ``cap`` drops its FARTHEST faces
    first (depth-keyed top_k in ``_bin_faces``) so mild overflow culls
    occluded geometry, not the visible winner; a 56^2-pixel tile can show
    at most ~tile^2/avg-tri-area distinct winners, so cap=1024 stays
    visually exact for FLAME-density meshes even when ``bin_overflow``
    reports counts above it. Size cap by ``bin_overflow`` when exact
    parity with the dense path matters (e.g. render_bfm's 4096).
    """
    F = faces.shape[0]
    C = attributes.shape[-1]
    face_ids, tri_p, pxg, pyg, (ty, tx) = _bin_faces(
        vertices, faces, height, width, tile, cap
    )
    corner_attrs = attributes if per_corner else attributes[faces]
    attr_tri = jnp.concatenate(
        [corner_attrs, jnp.zeros((1, 3, C), attributes.dtype)], axis=0
    )

    def one_tile(args):
        ids, px, py = args  # (cap,), (tp,), (tp,)
        t = tri_p[ids]  # (cap, 3, 3)
        a = attr_tri[ids]  # (cap, 3, C)
        valid = (ids < F)[:, None]
        x0, y0 = t[:, 0, 0, None], t[:, 0, 1, None]
        x1, y1 = t[:, 1, 0, None], t[:, 1, 1, None]
        x2, y2 = t[:, 2, 0, None], t[:, 2, 1, None]
        denom = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2)
        safe = jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
        w0 = ((y1 - y2) * (px[None] - x2) + (x2 - x1) * (py[None] - y2)) / safe
        w1 = ((y2 - y0) * (px[None] - x2) + (x0 - x2) * (py[None] - y2)) / safe
        w2 = 1.0 - w0 - w1
        inside = (
            (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & (jnp.abs(denom) > 1e-12) & valid
        )
        z = w0 * t[:, 0, 2, None] + w1 * t[:, 1, 2, None] + w2 * t[:, 2, 2, None]
        z = jnp.where(inside, z, BIG)
        best = jnp.argmin(z, axis=0)  # (tp,)
        best_z = jnp.take_along_axis(z, best[None], axis=0)[0]
        mask = best_z < BIG
        bary = jnp.stack(
            [
                jnp.take_along_axis(w0, best[None], axis=0)[0],
                jnp.take_along_axis(w1, best[None], axis=0)[0],
                jnp.take_along_axis(w2, best[None], axis=0)[0],
            ],
            axis=-1,
        )
        pix = jnp.einsum("pk,pkc->pc", bary, a[best])
        pix = jnp.where(mask[:, None], pix, 0.0)
        return pix, mask

    pix, mask = jax.lax.map(one_tile, (face_ids, pxg, pyg))  # (n_tiles, tp[,C])
    img = (
        pix.reshape(ty, tx, tile, tile, C)
        .transpose(0, 2, 1, 3, 4)
        .reshape(height, width, C)
    )
    m = (
        mask.reshape(ty, tx, tile, tile)
        .transpose(0, 2, 1, 3)
        .reshape(height, width)
    )
    return img, m


def rasterize_binned_batch(vertices, faces, attributes, height, width,
                           tile=32, cap=1024):
    return jax.vmap(
        lambda v, a: rasterize_binned(v, faces, a, height, width, tile, cap)
    )(vertices, attributes)


def _bary_weights(x0, y0, x1, y1, x2, y2, pxg, pyg):
    """Shared barycentric math so the custom_vjp fwd/bwd formulations in
    ``rasterize_binned_pallas`` stay bit-identical (same op order)."""
    denom = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2)
    safe = jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
    w0 = ((y1 - y2) * (pxg - x2) + (x2 - x1) * (pyg - y2)) / safe
    w1 = ((y2 - y0) * (pxg - x2) + (x0 - x2) * (pyg - y2)) / safe
    return w0, w1, 1.0 - w0 - w1


def rasterize_binned_pallas(
    vertices: jax.Array,
    faces: jax.Array,
    attributes: jax.Array,  # (V, C) or (F, 3, C) with per_corner
    height: int,
    width: int,
    tile: int = 32,
    cap: int = 1024,
    chunk: int = 256,
    interpret: bool = False,
    per_corner: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Binned rasterizer with stage-2 visibility as a Pallas kernel
    (ops/pallas/rasterize.py); same semantics as ``rasterize_binned`` AND
    fully differentiable: the kernel resolves (winner face, depth) per pixel
    under stop_gradient — exactly the role argmin plays in the XLA path —
    and attribute interpolation is recomputed here in XLA so gradients flow
    into ``vertices``/``attributes``. Perf: see bench.py
    ``raster_256_pallas_ms`` (the single source of truth; ~4.6-7.9 ms/frame
    across rounds vs ~10 ms XLA binned at 256^2 tile=32 cap=1024,
    tunnel-load variance) — the DEFAULT on TPU via ``rasterize_auto``."""
    from ..ops.pallas.rasterize import rasterize_tiles_visibility

    V = vertices.shape[0]
    F = faces.shape[0]
    C = attributes.shape[-1]
    face_ids, tri_p, pxg, pyg, (ty, tx) = _bin_faces(
        vertices, faces, height, width, tile, cap
    )
    n_tiles = ty * tx
    tri_t = jax.lax.stop_gradient(tri_p[face_ids].reshape(n_tiles, cap, 9))
    valid_t = (face_ids < F).astype(jnp.float32)[..., None]

    zbuf, slot = rasterize_tiles_visibility(
        tri_t, valid_t, pxg, pyg, chunk=chunk, interpret=interpret
    )
    covered = (slot >= 0) & (zbuf < BIG)
    # winning GLOBAL face id per pixel (F sentinel when uncovered)
    gid = jnp.where(
        covered, jnp.take_along_axis(face_ids, jnp.maximum(slot, 0), axis=1), F
    )  # (n_tiles, px_n)

    # differentiable interpolation: one face per pixel, plain XLA, under a
    # custom_vjp that uses DIFFERENT formulations for the two directions.
    #
    # LAYOUT NOTE (the OOM that motivated this shape): gathering whole
    # corner/attribute blocks per pixel — tri_p[gid] (n_tiles, px_n, 3, 3)
    # and attr_tri[gid] (n_tiles, px_n, 3, C) — is the FAST forward (one
    # gather each), but differentiating it makes the backward accumulate
    # cotangents in those same shapes, and XLA tile-pads the trailing
    # (3, 3)/(3, C) minor dims to (4..8, 128): measured 56.9x padding
    # expansion — a 12.25 GB HLO temp (gather cotangent) plus a 2.44 GB
    # (frames, F+1, 3, 3) table cotangent for one (4, 32)-frame render-loss
    # step at 224^2, >16G HBM. The backward therefore re-derives the same
    # pixels from per-COMPONENT tables ((F+1,) per corner coordinate,
    # (C, F+1) per attribute row, built straight from vertices/attributes):
    # every gather cotangent is then (n_tiles, px_n)-shaped, which tiles
    # perfectly, and the bwd is hand-composed (see _interp_bwd) as
    # elementwise-vjp + one packed scatter. Both formulations are
    # bit-identical in value; the boundary output is C-LEADING so the
    # incoming pixel cotangent tiles on (n_tiles, px_n) too. Measured v5e,
    # FLAME @256^2: fwd 4.6 ms/frame (component-only fwd was 8.3), and the
    # neural render-loss train step fits in HBM.
    # gid/covered are per-frame (batched under vmap) so they MUST be
    # explicit custom_vjp args (a closed-over BatchTracer escapes the
    # custom_vjp trace); faces/pxg/pyg are per-call constants and safe to
    # close over. Their cotangents are None (non-differentiable).
    dtype = vertices.dtype

    K = 6 + 3 * C  # packed interp channels: 3 corners x (x, y) + 3 x C attrs
    pdt = jnp.result_type(dtype, attributes.dtype)

    def _gather_packed(v, a, gid_):
        # ONE channel-LEADING (K, F+1) table — corner coords then the three
        # corner-attribute rows — gathered once by gid: the (K, nt, px_n)
        # result tiles perfectly, where block-shaped gathers like
        # tri_pp[gid] -> (nt, px, 3, 3) tile-pad their (3, 3) minor dims
        # ~56x (see the layout note above — it bites the forward too).
        corner_a = a if per_corner else a[faces.reshape(-1)].reshape(F, 3, C)
        tab = jnp.concatenate(
            [v[faces.reshape(-1), :2].reshape(F, 6).astype(pdt),
             corner_a.reshape(F, 3 * C).astype(pdt)], axis=1
        )  # (F, K): [x0 y0 x1 y1 x2 y2 | a0(C) a1(C) a2(C)]
        tab = jnp.concatenate([tab, jnp.zeros((1, K), pdt)], axis=0).T
        return tab[:, gid_]  # (K, n_tiles, px_n)

    def _pix_from_packed(g_, cov):  # -> (C, n_tiles, px_n)
        w0, w1, w2 = _bary_weights(g_[0], g_[1], g_[2], g_[3], g_[4], g_[5],
                                   pxg, pyg)
        pix = (
            w0[None] * g_[6:6 + C]
            + w1[None] * g_[6 + C:6 + 2 * C]
            + w2[None] * g_[6 + 2 * C:]
        )
        return jnp.where(cov[None], pix, 0.0)

    def _pix_block(v, a, gid_, cov):  # fast fwd -> (C, n_tiles, px_n)
        return _pix_from_packed(_gather_packed(v, a, gid_), cov)

    interp = jax.custom_vjp(_pix_block)

    def _interp_fwd(v, a, gid_, cov):
        packed = _gather_packed(v, a, gid_)
        # stash the gathered PLANES (primal values — safe; the OOM pitfall
        # above is about block-shaped gather COTANGENTS, which this bwd
        # never forms) so the backward needs no re-gather at all.
        return _pix_from_packed(packed, cov), (packed, gid_, cov)

    def _interp_bwd(res, g):
        # Hand-composed backward in three measured-cheap pieces (letting
        # jax.vjp run through the whole component form instead produced a
        # 206 s backward compile and 13.8 ms/frame of XLA overhead — 40x
        # the cost of its constituent ops):
        #   1. slice per-pixel planes out of the forward's packed-gather
        #      residual (no gathers in the bwd),
        #   2. vjp through a PURE ELEMENTWISE pixel function of those
        #      planes (fuses into one VPU pass),
        #   3. ONE packed (6+3C)-channel scatter-add into (K, F+1) tables
        #      (measured 0.3 ms/frame) + six tiny (F,)->(V,) scatters.
        packed_res, gid_, cov = res

        planes = tuple(packed_res[i] for i in range(6))  # 6 x (nt, px_n)
        atabs = tuple(
            packed_res[6 + k * C:6 + (k + 1) * C] for k in range(3)
        )  # 3 x (C, n_tiles, px_n)

        def pixel_fn(pl, ap):  # elementwise over (n_tiles, px_n) planes
            x0, y0, x1, y1, x2, y2 = pl
            ws = _bary_weights(x0, y0, x1, y1, x2, y2, pxg, pyg)
            pix_t = ws[0][None] * ap[0] + ws[1][None] * ap[1] + ws[2][None] * ap[2]
            return jnp.where(cov[None], pix_t, 0.0)

        dplanes, databs = jax.vjp(pixel_fn, planes, atabs)[1](g)

        # pack every per-pixel gradient plane into one scatter: channels
        # 0..5 are corner coords (k0x k0y k1x k1y k2x k2y), 6.. are the
        # 3 corner-attribute blocks of C rows each.
        packed = jnp.concatenate(
            [jnp.stack(dplanes).reshape(6, -1)]
            + [d.reshape(C, -1) for d in databs],
            axis=0,
        )  # (K, n_tiles*px_n)
        tabs = jnp.zeros((K, F + 1), pdt).at[:, gid_.reshape(-1)].add(packed)

        dv = jnp.zeros((V, 3), pdt)
        for k in range(3):
            dv = dv.at[faces[:, k], 0].add(tabs[2 * k, :F])
            dv = dv.at[faces[:, k], 1].add(tabs[2 * k + 1, :F])
        if per_corner:  # face rows are unique: the tables ARE the gradient
            da = tabs[6:, :F].T.reshape(F, 3, C)
        else:
            da = jnp.zeros((V, C), pdt)
            for k in range(3):
                da = da.at[faces[:, k]].add(
                    tabs[6 + k * C:6 + (k + 1) * C, :F].T)
        return dv.astype(dtype), da.astype(attributes.dtype), None, None

    interp.defvjp(_interp_fwd, _interp_bwd)
    pix_t = interp(vertices, attributes, gid, covered)

    img = (
        pix_t.reshape(C, ty, tx, tile, tile)
        .transpose(1, 3, 2, 4, 0)
        .reshape(height, width, C)
    )
    m = covered.reshape(ty, tx, tile, tile).transpose(0, 2, 1, 3).reshape(height, width)
    return img, m
