"""DECA/EMOCA detail branch: per-pixel UV displacement decoding.

TPU-native equivalent of the detail stage used by the reference's
``Visualizer3DMM`` (/root/reference/BlendshapeVisualizer/EMOCA/
blendshape_visualizer.py:30-44 + gdl/models/DECA.py:741-751 detail encode,
DECA.py displacement composition; generator architecture from
gdl/models/DecaDecoder.py:27-64):

    E_detail: image -> 128-d detail code (same ResnetEncoder trunk as the
              coarse encoder; models.emoca.DecaEncoder with outsize 128)
    D_detail: cat[jaw(3), exp(50), detail(128)] -> Generator -> (256, 256, 1)
              UV displacement map (tanh * out_scale)
    displacement -> detail normals: displace UV-space coarse geometry along
              coarse normals, re-derive normals on the dense UV grid, blend
              by the face mask.

UV-space geometry (``world2uv``) reuses the framework rasterizer with the
mesh's UV coordinates as screen positions — the pytorch3d-free equivalent of
DECA's SRenderY.world2uv.

Quirk preserved: DECA constructs ``nn.BatchNorm2d(ch, 0.8)`` — the 0.8 is
the *eps* positional arg, so the imported network must run BatchNorm with
eps=0.8 to match (not a typo here).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..viz.rasterizer import compute_vertex_normals, rasterize


def _upsample2x_bilinear(x: jax.Array) -> jax.Array:
    """torch nn.Upsample(scale_factor=2, mode='bilinear',
    align_corners=False) equivalent."""
    B, H, W, C = x.shape
    out_h, out_w = 2 * H, 2 * W
    # source coords for align_corners=False: (i + 0.5) / scale - 0.5
    yi = (jnp.arange(out_h) + 0.5) / 2.0 - 0.5
    xi = (jnp.arange(out_w) + 0.5) / 2.0 - 0.5
    y0 = jnp.clip(jnp.floor(yi), 0, H - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xi), 0, W - 1).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    wy = jnp.clip(yi - y0, 0.0, 1.0)[None, :, None, None]
    wx = jnp.clip(xi - x0, 0.0, 1.0)[None, None, :, None]
    g = lambda ys, xs: x[:, ys][:, :, xs]  # noqa: E731
    top = g(y0, x0) * (1 - wx) + g(y0, x1) * wx
    bot = g(y1, x0) * (1 - wx) + g(y1, x1) * wx
    return top * (1 - wy) + bot * wy


class DetailGenerator(nn.Module):
    """gdl DecaDecoder.Generator (DecaDecoder.py:27-64), NHWC.

    latent (B, latent_dim) -> Linear -> (8, 8, 128) -> 5x [upsample2x +
    conv3x3 + BN(eps .8) + LeakyReLU(.2)] -> conv3x3 -> tanh * out_scale
    -> (B, 256, 256, out_channels).
    """

    latent_dim: int = 181  # jaw 3 + exp 50 + detail 128
    out_channels: int = 1
    out_scale: float = 0.01
    init_size: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array, train: bool = False) -> jax.Array:
        s = self.init_size
        h = nn.Dense(128 * s * s, dtype=self.dtype, name="l1")(z)
        h = h.reshape(z.shape[0], 128, s, s).transpose(0, 2, 3, 1)  # NCHW->NHWC
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn_in")(h)
        widths = (128, 64, 64, 32, 16)
        for i, w in enumerate(widths):
            h = _upsample2x_bilinear(h)
            h = nn.Conv(w, (3, 3), padding=1, dtype=self.dtype,
                        name=f"conv{i}")(h)
            h = nn.BatchNorm(use_running_average=not train, epsilon=0.8,
                             dtype=self.dtype, name=f"bn{i}")(h)
            h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_out")(h)
        return jnp.tanh(h) * self.out_scale


# --------------------------------------------------------------------------
# UV-space geometry
# --------------------------------------------------------------------------

def grid_faces(h: int, w: int) -> np.ndarray:
    """Dense triangulation of an h x w grid (DECA util.generate_triangles)."""
    idx = np.arange(h * w).reshape(h, w)
    a, b, c, d = idx[:-1, :-1], idx[1:, :-1], idx[1:, 1:], idx[:-1, 1:]
    t1 = np.stack([a, b, c], axis=-1).reshape(-1, 3)
    t2 = np.stack([a, c, d], axis=-1).reshape(-1, 3)
    return np.concatenate([t1, t2], axis=0).astype(np.int32)


def world2uv(
    verts: jax.Array,  # (V, 3) world/model-space vertices
    faces: jax.Array,  # (F, 3)
    uv_coords: jax.Array,  # (Vt, 2) in [0, 1]
    uv_faces: jax.Array,  # (F, 3) indices into uv_coords
    size: int = 256,
) -> jax.Array:
    """Rasterize per-vertex 3D positions into UV space -> (size, size, 3).

    SRenderY.world2uv equivalent: screen positions are the UV coordinates
    (mapped to NDC), attributes are the 3D positions, taken per corner so UV
    seams don't bleed.
    """
    uv_ndc = jnp.concatenate(
        [uv_coords * 2.0 - 1.0, jnp.zeros((uv_coords.shape[0], 1),
                                          uv_coords.dtype)],
        axis=-1,
    )
    corner_attrs = verts[faces]  # (F, 3, 3)
    img, _ = rasterize(
        uv_ndc[uv_faces].reshape(-1, 3),
        jnp.arange(uv_faces.size, dtype=jnp.int32).reshape(-1, 3),
        corner_attrs.reshape(-1, 3),
        size, size,
    )
    return img


def detail_normals(
    uv_coarse_verts: jax.Array,  # (H, W, 3) world2uv of coarse verts
    uv_coarse_normals: jax.Array,  # (H, W, 3) world2uv of coarse normals
    uv_z: jax.Array,  # (H, W, 1) displacement from DetailGenerator
    uv_face_mask: Optional[jax.Array] = None,  # (H, W, 1) 1=face region
    dense_faces: Optional[jax.Array] = None,
) -> jax.Array:
    """DECA displacement composition: displace along coarse normals, re-derive
    normals on the dense UV grid, blend with coarse normals by the mask."""
    H, W = uv_z.shape[:2]
    detail_verts = uv_coarse_verts + uv_z * uv_coarse_normals
    if dense_faces is None:
        dense_faces = jnp.asarray(grid_faces(H, W))
    dense = detail_verts.reshape(1, H * W, 3)
    normals = compute_vertex_normals(dense, dense_faces).reshape(H, W, 3)
    if uv_face_mask is not None:
        normals = normals * uv_face_mask + uv_coarse_normals * (1 - uv_face_mask)
    return normals


@dataclasses.dataclass
class DecaDetailModel:
    """Bundles the detail generator with precomputed UV assets.

    ``decode(jaw, exp, detail_code, coarse_verts)`` -> (H, W, 3) detail
    normal map in UV space, ready for texture-sampled shading.
    """

    generator: DetailGenerator
    variables: Dict
    faces: jax.Array
    uv_coords: jax.Array
    uv_faces: jax.Array
    uv_size: int = 256
    uv_face_mask: Optional[jax.Array] = None

    def decode(
        self,
        jaw: jax.Array,  # (B, 3)
        exp: jax.Array,  # (B, n_exp)
        detail_code: jax.Array,  # (B, n_detail)
        coarse_verts: jax.Array,  # (B, V, 3)
    ) -> Tuple[jax.Array, jax.Array]:
        z = jnp.concatenate([jaw, exp, detail_code], axis=-1)
        uv_z = self.generator.apply(self.variables, z)  # (B, S, S, 1)

        def one(verts, disp):
            uv_v = world2uv(verts, self.faces, self.uv_coords, self.uv_faces,
                            self.uv_size)
            vn = compute_vertex_normals(verts[None], self.faces)[0]
            uv_n = world2uv(vn, self.faces, self.uv_coords, self.uv_faces,
                            self.uv_size)
            return detail_normals(uv_v, uv_n, disp, self.uv_face_mask)

        return jax.vmap(one)(coarse_verts, uv_z), uv_z


# --------------------------------------------------------------------------
# torch import
# --------------------------------------------------------------------------

def detail_generator_params_from_torch(
    sd: Mapping[str, Any], prefix: str = "", dtype=jnp.float32
) -> Dict:
    """gdl Generator state dict (l1.0.*, conv_blocks.N.*) -> variables.

    conv_blocks indices (DecaDecoder.py:36-59): 0 bn_in; per up-block i
    (of 5): conv at 2+4i... concretely convs at 2,6,10,14,18, bns at
    3,7,11,15,19; final conv at 21.
    """

    def t(key):
        return np.asarray(sd[prefix + key], dtype=np.float32)

    def conv(key):
        out = {"kernel": jnp.asarray(t(f"{key}.weight").transpose(2, 3, 1, 0), dtype)}
        if prefix + f"{key}.bias" in sd:
            out["bias"] = jnp.asarray(t(f"{key}.bias"), dtype)
        return out

    def bn(key):
        return (
            {"scale": jnp.asarray(t(f"{key}.weight"), dtype),
             "bias": jnp.asarray(t(f"{key}.bias"), dtype)},
            {"mean": jnp.asarray(t(f"{key}.running_mean"), dtype),
             "var": jnp.asarray(t(f"{key}.running_var"), dtype)},
        )

    params: Dict[str, Any] = {"l1": {
        "kernel": jnp.asarray(t("l1.0.weight").T, dtype),
        "bias": jnp.asarray(t("l1.0.bias"), dtype),
    }}
    stats: Dict[str, Any] = {}
    params["bn_in"], stats["bn_in"] = bn("conv_blocks.0")
    for i in range(5):
        params[f"conv{i}"] = conv(f"conv_blocks.{2 + 4 * i}")
        params[f"bn{i}"], stats[f"bn{i}"] = bn(f"conv_blocks.{3 + 4 * i}")
    params["conv_out"] = conv("conv_blocks.21")
    return {"params": params, "batch_stats": stats}
