"""Rasterizer shootout on the real TPU: XLA binned vs Pallas v1 vs v2.

Times the stage-2 tile loop at FLAME-production shapes (5023 verts / 9976
faces) for the render-loss sizes (256^2 and 224^2) over tile/cap/chunk
variants. Run on the chip: `python scripts/profile_raster.py`.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from avi_talking_tpu.core import synthetic_assets
    from avi_talking_tpu.core.projection import batch_orth_proj
    from avi_talking_tpu.ops.pallas.rasterize import rasterize_tiles_pallas_v2
    from avi_talking_tpu.viz.rasterizer import _bin_faces, rasterize_binned

    assets = synthetic_assets(num_vertices=5023, n_shape=300, n_exp=50,
                              num_faces=9976)
    faces = jnp.asarray(assets.faces)
    rng = np.random.default_rng(0)
    verts = jnp.asarray(assets.v_template)
    cam = jnp.asarray([[8.0, 0.0, -0.01]], jnp.float32)
    proj = batch_orth_proj(verts[None], cam)[0]
    ndc = jnp.stack([proj[:, 0], -proj[:, 1], -proj[:, 2]], axis=-1)
    attrs = jnp.asarray(rng.standard_normal((5023, 3)).astype(np.float32))
    F = faces.shape[0]

    def timeit(fn, *args, n=20):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n * 1e3  # ms

    for H in (256, 224):
        for tile, cap in ((64, 2048), (56, 1024), (32, 1024), (32, 512)):
            if H % tile:
                continue
            t_xla = timeit(
                jax.jit(lambda v, a, _t=tile, _c=cap, _H=H: rasterize_binned(
                    v, faces, a, _H, _H, tile=_t, cap=_c)), ndc, attrs)

            face_ids, tri_p, pxg, pyg, (ty, tx) = _bin_faces(
                ndc, faces, H, H, tile, cap)
            n_tiles = ty * tx
            attr_tri = jnp.concatenate(
                [attrs[faces], jnp.zeros((1, 3, 3), attrs.dtype)], axis=0)
            tri_t = tri_p[face_ids].reshape(n_tiles, cap, 9)
            attr_t = attr_tri[face_ids].reshape(n_tiles, cap, 9)
            valid_t = (face_ids < F).astype(jnp.float32)[..., None]

            for chunk in (128, 256, 512):
                if cap % chunk:
                    continue
                try:
                    t2 = timeit(lambda *a, _c=chunk: rasterize_tiles_pallas_v2(
                        *a, chunk=_c), tri_t, attr_t, valid_t, pxg, pyg)
                except Exception as e:
                    t2 = float("nan")
                    print(f"  v2 failed ({type(e).__name__}): {str(e)[:120]}")
                print(f"H={H} tile={tile} cap={cap} chunk={chunk}: "
                      f"xla_full={t_xla:.2f}ms stage2_v2={t2:.2f}ms", flush=True)


if __name__ == "__main__":
    main()
