"""Bisect the differentiable render path's cost (HLO bytes + wall time).

The neural-step breakdown (scripts/profile_neural_breakdown.py) shows the
render-bearing variants accessing TBs per step. This script compiles each
stage of viz.rasterizer.rasterize_binned_pallas separately over a frame
batch and prints cost_analysis flops / bytes + chained wall time, for:

  bin        _bin_faces only (overlap + top_k compaction)
  vis        binning + Pallas visibility kernel
  fwd        full render forward (render_jax, no grad)
  fwdbwd     full render forward + backward (grad wrt vertices)
  normals    compute_vertex_normals alone (scatter-add path)
  fwdbwd_all render + vertex-normal shading as the neural loss uses it

Timing per CLAUDE.md: chained steps, one sync; never the AOT-execute path.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--stages", default="bin,vis,fwd,fwdbwd,normals")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from avi_talking_tpu.core import synthetic_assets
    from avi_talking_tpu.viz import rasterizer as rz
    from avi_talking_tpu.viz.visualizer import FixedViewRenderer

    print(f"platform: {jax.devices()[0].platform}")
    R = args.image_size
    N = args.frames
    assets = synthetic_assets(num_vertices=5023, n_shape=300, n_exp=50,
                              num_faces=9976)
    faces = jnp.asarray(assets.faces)
    renderer = FixedViewRenderer(np.asarray(assets.faces), image_size=R)
    rng = np.random.default_rng(0)
    verts = jnp.asarray(
        rng.uniform(-0.8, 0.8, (N, 5023, 3)).astype(np.float32))

    def _bin1(v):  # (V, 3) -> scalar
        face_ids, tri_p, pxg, pyg, _ = rz._bin_faces(v, faces, R, R, 32, 1024)
        return face_ids.sum() + tri_p.sum()

    def bin_only(v):
        return jax.vmap(_bin1)(v).sum()

    def _vis1(v):
        from avi_talking_tpu.ops.pallas.rasterize import (
            rasterize_tiles_visibility,
        )
        face_ids, tri_p, pxg, pyg, (ty, tx) = rz._bin_faces(
            v, faces, R, R, 32, 1024)
        n_tiles = ty * tx
        tri_t = tri_p[face_ids].reshape(n_tiles, 1024, 9)
        valid_t = (face_ids < faces.shape[0]).astype(jnp.float32)[..., None]
        zbuf, slot = rasterize_tiles_visibility(tri_t, valid_t, pxg, pyg)
        return zbuf.sum() + slot.sum()

    def vis_only(v):
        return jax.vmap(_vis1)(v).sum()

    def fwd(v):
        img = renderer.render_jax(v, 0)  # (N, V, 3) -> (N, R, R, 3)
        return img.sum()

    def fwdbwd(v):
        return jax.grad(lambda vv: fwd(vv))(v).sum()

    def normals(v):
        return rz.compute_vertex_normals(v, faces).sum()

    # textured render (per-corner UV + normals through one rasterization)
    uv_rng = np.random.default_rng(1)
    uvs = jnp.asarray(uv_rng.uniform(0, 1, (5023, 2)).astype(np.float32))
    tex = jnp.asarray(uv_rng.uniform(0, 1, (256, 256, 3)).astype(np.float32))

    def textured(v):
        from avi_talking_tpu.viz.shading import render_textured

        return render_textured(v, faces, uvs, faces, tex, R, R).sum()

    def texturedbwd(v):
        return jax.grad(textured)(v).sum()

    STAGES = {
        "bin": (bin_only, verts),
        "vis": (vis_only, verts),
        "fwd": (fwd, verts),
        "fwdbwd": (fwdbwd, verts),
        "normals": (normals, verts),
        "textured": (textured, verts),
        "texturedbwd": (texturedbwd, verts),
    }
    for name in args.stages.split(","):
        fn, x = STAGES[name]
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        lowered = jfn.lower(x)
        compiled = lowered.compile()
        ct = time.perf_counter() - t0
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = ca.get("flops", float("nan"))
        byt = ca.get("bytes accessed", float("nan"))
        out = jfn(x)
        out.block_until_ready()
        t0 = time.perf_counter()
        r = x
        acc = None
        for _ in range(args.steps):
            acc = jfn(r)
            # chain steps through a zero-valued data dependency
            r = x + (acc * 0).astype(x.dtype)
        jax.block_until_ready(acc)
        dt = (time.perf_counter() - t0) / args.steps
        print(f"{name:10s} t={dt*1e3:8.1f}ms ({dt*1e3/N:6.2f} ms/frame)  "
              f"flops={flops/1e9:8.1f}G  bytes={byt/1e9:8.2f}G  "
              f"compile={ct:5.1f}s", flush=True)


if __name__ == "__main__":
    main()
