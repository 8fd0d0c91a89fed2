"""Pallas TPU kernel: per-tile z-buffer rasterization.

Stage 2 of the binned rasterizer (viz/rasterizer.rasterize_binned) as a
hand-written kernel: the XLA version lax.map's over tiles, materialising
(cap, tile_px) score blocks in HBM between steps; here each grid step keeps
its tile's z-buffer/argmin state in VMEM across face chunks — one HBM read
per face table entry, one write per output pixel.

Inputs are the stage-1 binning products (per-tile gathered face/attribute
tables, static cap). Float mask output (1.0 = covered).

Measured (v5e, FLAME-sized mesh, 256^2): 17 ms/frame vs 14 ms for the XLA
lax.map formulation (viz/rasterizer.rasterize_binned with tile=64) — XLA
already keeps the per-tile state pipelined at these sizes, so this kernel is
OPT-IN (viz.rasterizer.rasterize_binned_pallas), retained as the base for
shapes where the one-hot winner-gather can be replaced with cheaper
scalar-prefetch indexing.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e9


def _make_kernel(cap: int, px_n: int, chunk: int, c_dim: int):
    n_chunks = cap // chunk

    def kernel(tri_ref, attr_ref, valid_ref, px_ref, py_ref, img_ref, mask_ref,
               zbuf, best_attr):
        # tri_ref: (cap, 9) flattened corners; attr_ref: (cap, 3*C);
        # px/py/mask are (8, px_n//8) blocks (TPU (8,128) tiling); img is
        # (px_n, C). The squeezed leading dim is the tile grid axis.
        zbuf[:] = jnp.full((1, px_n), BIG, jnp.float32)
        best_attr[:] = jnp.zeros((px_n, c_dim), jnp.float32)

        px = px_ref[:].reshape(px_n)
        py = py_ref[:].reshape(px_n)

        def body(ci, _):
            sl = pl.ds(ci * chunk, chunk)
            tri = tri_ref[sl, :]  # (chunk, 9)
            valid = valid_ref[sl, :]  # (chunk, 1)
            x0, y0 = tri[:, 0:1], tri[:, 1:2]
            x1, y1 = tri[:, 3:4], tri[:, 4:5]
            x2, y2 = tri[:, 6:7], tri[:, 7:8]
            z0, z1, z2 = tri[:, 2:3], tri[:, 5:6], tri[:, 8:9]
            denom = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2)
            safe = jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
            w0 = ((y1 - y2) * (px[None] - x2) + (x2 - x1) * (py[None] - y2)) / safe
            w1 = ((y2 - y0) * (px[None] - x2) + (x0 - x2) * (py[None] - y2)) / safe
            w2 = 1.0 - w0 - w1  # (chunk, px)
            inside = (
                (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
                & (jnp.abs(denom) > 1e-12) & (valid > 0)
            )
            z = w0 * z0 + w1 * z1 + w2 * z2
            z = jnp.where(inside, z, BIG)
            best = jnp.argmin(z, axis=0)  # (px,)
            best_z = jnp.min(z, axis=0)  # (px,)
            # float select (Mosaic: bool minor-dim broadcasts unsupported)
            closer = (best_z < zbuf[0, :]).astype(jnp.float32)

            attr = attr_ref[sl, :]  # (chunk, 3*C)
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (chunk, px_n), 0)
                == best[None, :]
            ).astype(jnp.float32)
            # gather winner barycentrics + attrs via the one-hot matmul (MXU)
            w0b = jnp.sum(w0 * onehot, axis=0)
            w1b = jnp.sum(w1 * onehot, axis=0)
            w2b = jnp.sum(w2 * onehot, axis=0)
            a = jax.lax.dot_general(
                onehot, attr, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (px, 3*C)
            pix = (
                w0b[:, None] * a[:, 0:c_dim]
                + w1b[:, None] * a[:, c_dim : 2 * c_dim]
                + w2b[:, None] * a[:, 2 * c_dim :]
            )
            m = closer[:, None]
            best_attr[:] = pix * m + best_attr[:] * (1.0 - m)
            zbuf[0, :] = best_z * closer + zbuf[0, :] * (1.0 - closer)
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)
        img_ref[:] = best_attr[:]
        mask_ref[:] = (zbuf[0, :] < BIG).astype(jnp.float32).reshape(8, px_n // 8)

    return kernel


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def rasterize_tiles_pallas(
    tri: jax.Array,  # (n_tiles, cap, 9) corner xyz flattened
    attr: jax.Array,  # (n_tiles, cap, 3*C)
    valid: jax.Array,  # (n_tiles, cap, 1) float 0/1
    px: jax.Array,  # (n_tiles, px_n)
    py: jax.Array,  # (n_tiles, px_n)
    chunk: int = 512,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    n_tiles, cap, _ = tri.shape
    px_n = px.shape[1]
    assert px_n % 8 == 0
    c3 = attr.shape[-1]
    c_dim = c3 // 3
    kernel = _make_kernel(cap, px_n, chunk, c_dim)
    px8 = px.reshape(n_tiles, 8, px_n // 8)
    py8 = py.reshape(n_tiles, 8, px_n // 8)
    img, mask = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((None, cap, 9), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, cap, c3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, cap, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, px_n // 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, px_n // 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, px_n, c_dim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, px_n // 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, px_n, c_dim), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 8, px_n // 8), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, px_n), jnp.float32),
            pltpu.VMEM((px_n, c_dim), jnp.float32),
        ],
        interpret=interpret,
    )(tri, attr, valid, px8, py8)
    return img, mask.reshape(n_tiles, px_n) > 0.5


# ---------------------------------------------------------------------------
# v2: select-free inner loop.
#
# The v1 kernel pays for a per-chunk argmin + one-hot MXU gather of winner
# barycentrics. v2 keeps only (best_z, best_face_slot) per pixel across the
# face loop (two cheap VPU reductions per chunk) and reconstructs the winner's
# barycentrics ONCE at the end: a single one-hot matmul gathers the winning
# face's corners + attributes per pixel, then barycentrics are recomputed for
# exactly one face per pixel. Per-chunk work drops from ~25 ops/elem (+MXU
# latency in the loop) to ~18 VPU ops/elem with no loop-carried matmul.
# ---------------------------------------------------------------------------


def _make_kernel_v2(cap: int, px_n: int, chunk: int, c_dim: int):
    n_chunks = cap // chunk

    def kernel(tri_ref, attr_ref, valid_ref, px_ref, py_ref, img_ref, mask_ref,
               zbuf, best_slot):
        zbuf[:] = jnp.full((1, px_n), BIG, jnp.float32)
        best_slot[:] = jnp.full((1, px_n), -1.0, jnp.float32)

        px = px_ref[:].reshape(px_n)
        py = py_ref[:].reshape(px_n)

        def body(ci, _):
            sl = pl.ds(ci * chunk, chunk)
            tri = tri_ref[sl, :]  # (chunk, 9)
            valid = valid_ref[sl, :]  # (chunk, 1)
            x0, y0 = tri[:, 0:1], tri[:, 1:2]
            x1, y1 = tri[:, 3:4], tri[:, 4:5]
            x2, y2 = tri[:, 6:7], tri[:, 7:8]
            z0, z1, z2 = tri[:, 2:3], tri[:, 5:6], tri[:, 8:9]
            denom = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2)
            safe = jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
            w0 = ((y1 - y2) * (px[None] - x2) + (x2 - x1) * (py[None] - y2)) / safe
            w1 = ((y2 - y0) * (px[None] - x2) + (x0 - x2) * (py[None] - y2)) / safe
            w2 = 1.0 - w0 - w1  # (chunk, px)
            inside = (
                (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
                & (jnp.abs(denom) > 1e-12) & (valid > 0)
            )
            z = jnp.where(inside, w0 * z0 + w1 * z1 + w2 * z2, BIG)
            best_z = jnp.min(z, axis=0)  # (px,)
            # smallest chunk-local row holding best_z (deterministic ties)
            rows = jax.lax.broadcasted_iota(jnp.float32, (chunk, px_n), 0)
            row_of_min = jnp.min(
                jnp.where(z <= best_z[None, :], rows, float(cap)), axis=0
            )
            closer = (best_z < zbuf[0, :]).astype(jnp.float32)
            zbuf[0, :] = best_z * closer + zbuf[0, :] * (1.0 - closer)
            slot = row_of_min + (ci * chunk).astype(jnp.float32)
            best_slot[0, :] = slot * closer + best_slot[0, :] * (1.0 - closer)
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)

        # final gather: one-hot over the full cap table (ONE matmul per tile)
        slots = best_slot[0, :]
        onehot = (
            jax.lax.broadcasted_iota(jnp.float32, (cap, px_n), 0)
            == slots[None, :]
        ).astype(jnp.float32)
        tri_all = tri_ref[:]  # (cap, 9)
        attr_all = attr_ref[:]  # (cap, 3C)
        gathered = jax.lax.dot_general(
            onehot, jnp.concatenate([tri_all, attr_all], axis=1),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (px, 9 + 3C)
        gx0, gy0, gz0 = gathered[:, 0], gathered[:, 1], gathered[:, 2]
        gx1, gy1 = gathered[:, 3], gathered[:, 4]
        gx2, gy2 = gathered[:, 6], gathered[:, 7]
        denom = (gy1 - gy2) * (gx0 - gx2) + (gx2 - gx1) * (gy0 - gy2)
        safe = jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
        w0 = ((gy1 - gy2) * (px - gx2) + (gx2 - gx1) * (py - gy2)) / safe
        w1 = ((gy2 - gy0) * (px - gx2) + (gx0 - gx2) * (py - gy2)) / safe
        w2 = 1.0 - w0 - w1
        a = gathered[:, 9:]
        pix = (
            w0[:, None] * a[:, 0:c_dim]
            + w1[:, None] * a[:, c_dim : 2 * c_dim]
            + w2[:, None] * a[:, 2 * c_dim :]
        )
        covered = (zbuf[0, :] < BIG).astype(jnp.float32)
        img_ref[:] = pix * covered[:, None]
        mask_ref[:] = covered.reshape(8, px_n // 8)

    return kernel


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def rasterize_tiles_pallas_v2(
    tri: jax.Array,  # (n_tiles, cap, 9)
    attr: jax.Array,  # (n_tiles, cap, 3*C)
    valid: jax.Array,  # (n_tiles, cap, 1) float 0/1
    px: jax.Array,  # (n_tiles, px_n)
    py: jax.Array,  # (n_tiles, px_n)
    chunk: int = 256,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    n_tiles, cap, _ = tri.shape
    px_n = px.shape[1]
    assert px_n % 8 == 0 and cap % chunk == 0
    c3 = attr.shape[-1]
    c_dim = c3 // 3
    kernel = _make_kernel_v2(cap, px_n, chunk, c_dim)
    px8 = px.reshape(n_tiles, 8, px_n // 8)
    py8 = py.reshape(n_tiles, 8, px_n // 8)
    img, mask = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((None, cap, 9), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, cap, c3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, cap, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, px_n // 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, px_n // 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, px_n, c_dim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, px_n // 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, px_n, c_dim), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 8, px_n // 8), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, px_n), jnp.float32),
            pltpu.VMEM((1, px_n), jnp.float32),
        ],
        interpret=interpret,
    )(tri, attr, valid, px8, py8)
    return img, mask.reshape(n_tiles, px_n) > 0.5
