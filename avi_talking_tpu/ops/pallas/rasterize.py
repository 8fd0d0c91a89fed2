"""Pallas TPU kernel: per-tile z-buffer visibility for the binned rasterizer.

Stage 2 of the binned rasterizer (viz/rasterizer.rasterize_binned) as a
hand-written kernel, replacing the reference's pytorch3d CUDA rasterizer on
the render-loss hot path. Design:

- The kernel resolves VISIBILITY ONLY: per pixel, the winning face slot and
  its depth, kept in (1, px_n) VMEM lane vectors across the face loop. Per
  face-chunk it costs ~18 VPU ops/element (barycentric in/out test + two
  min-reductions) with no loop-carried matmul or argmin.
- The winner's attribute interpolation is recomputed OUTSIDE the kernel in
  XLA from the returned slots (one face per pixel — cheap), which makes the
  whole path differentiable for free: visibility is a stop-gradient decision
  (exactly like jnp.argmin in the XLA path) and gradients flow through the
  XLA interpolation into vertices and attributes.

Measured (v5e, FLAME-sized mesh: 9976 faces, 5023 verts; numbers are the
shipping bench.py lines — BENCH_r02: raster_256_pallas_ms 5.84 vs
raster_256_xla_binned_ms 10.13, ~1.7x; tunnel-load variance puts the
Pallas path at 5.4-5.9 ms across rounds):
  256^2 tile=32 cap=1024 including top_k binning — the DEFAULT on TPU via
  viz.rasterizer.rasterize_auto. bench.py is the single source of truth
  for these numbers; do not hand-update them here without a bench run.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e9


def _make_visibility_kernel(cap: int, px_n: int, chunk: int):
    n_chunks = cap // chunk

    def kernel(tri_ref, valid_ref, px_ref, py_ref, z_ref, slot_ref):
        # per-pixel state lives in (1, px_n) lane vectors: all face-axis
        # reductions land there naturally and no sublane/lane reshapes are
        # needed (Mosaic rejects (px,)->(8, px/8) shape casts)
        z_ref[:] = jnp.full((1, px_n), BIG, jnp.float32)
        slot_ref[:] = jnp.full((1, px_n), -1.0, jnp.float32)

        px = px_ref[:]  # (1, px_n)
        py = py_ref[:]

        def body(ci, _):
            sl = pl.ds(ci * chunk, chunk)
            tri = tri_ref[sl, :]  # (chunk, 9) corner xyz flattened
            valid = valid_ref[sl, :]  # (chunk, 1)
            x0, y0 = tri[:, 0:1], tri[:, 1:2]
            x1, y1 = tri[:, 3:4], tri[:, 4:5]
            x2, y2 = tri[:, 6:7], tri[:, 7:8]
            z0, z1, z2 = tri[:, 2:3], tri[:, 5:6], tri[:, 8:9]
            denom = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2)
            safe = jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
            # one reciprocal per FACE ((chunk, 1)) instead of two divides
            # per face-pixel: the w's here only gate visibility (the
            # differentiable interp recomputes them in XLA), so the <=1 ulp
            # drift vs a true divide is invisible off knife-edge pixels
            inv = 1.0 / safe
            w0 = ((y1 - y2) * (px - x2) + (x2 - x1) * (py - y2)) * inv
            w1 = ((y2 - y0) * (px - x2) + (x0 - x2) * (py - y2)) * inv
            w2 = 1.0 - w0 - w1  # (chunk, px)
            inside = (
                (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
                & (jnp.abs(denom) > 1e-12) & (valid > 0)
            )
            z = jnp.where(inside, w0 * z0 + w1 * z1 + w2 * z2, BIG)
            best_z = jnp.min(z, axis=0, keepdims=True)  # (1, px)
            # smallest chunk-local row holding best_z (deterministic ties,
            # matching jnp.argmin's first-index semantics)
            rows = jax.lax.broadcasted_iota(
                jnp.int32, (chunk, px_n), 0
            ).astype(jnp.float32)
            row_of_min = jnp.min(
                jnp.where(z <= best_z, rows, float(cap)), axis=0, keepdims=True
            )
            closer = (best_z < z_ref[:]).astype(jnp.float32)
            z_ref[:] = best_z * closer + z_ref[:] * (1.0 - closer)
            slot = row_of_min + (ci * chunk).astype(jnp.float32)
            slot_ref[:] = slot * closer + slot_ref[:] * (1.0 - closer)
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def rasterize_tiles_visibility(
    tri: jax.Array,  # (n_tiles, cap, 9) corner xyz flattened
    valid: jax.Array,  # (n_tiles, cap, 1) float 0/1
    px: jax.Array,  # (n_tiles, px_n)
    py: jax.Array,  # (n_tiles, px_n)
    chunk: int = 256,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """-> (zbuf (n_tiles, px_n) f32, slot (n_tiles, px_n) int32, -1=empty)."""
    n_tiles, cap, _ = tri.shape
    px_n = px.shape[1]
    assert px_n % 8 == 0 and cap % chunk == 0
    kernel = _make_visibility_kernel(cap, px_n, chunk)
    px1 = px.reshape(n_tiles, 1, px_n)
    py1 = py.reshape(n_tiles, 1, px_n)
    zout, slot = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((None, cap, 9), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, cap, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, px_n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, px_n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, 1, px_n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, px_n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, 1, px_n), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, px_n), jnp.float32),
        ),
        interpret=interpret,
    )(tri, valid, px1, py1)
    return (
        zout.reshape(n_tiles, px_n),
        slot.reshape(n_tiles, px_n).astype(jnp.int32),
    )
