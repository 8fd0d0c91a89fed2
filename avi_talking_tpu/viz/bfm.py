"""BFM09 / Deep3DFaceRecon 3DMM visualizer (the reference's "d3dfr" path).

TPU-native equivalent of the BFM blendshape visualizers
(/root/reference/BlendshapeVisualizer/face_d3dfr/BFM09Model.py:8-167,
BaseModel.py:17-234, blendshape_visualizer.py:10-24; the ``official_d3dfr``
variant shares the math): a 257-d Deep3DFaceRecon coefficient vector
[id 80 | exp 64 | tex 80 | euler 3 | SH gamma 27 | translation 3]
(BFM09Model.py:78-88) decodes to a colored mesh which is perspective-
projected (focal 1015*256/224, camera at (0,0,10), BaseModel.py:49-59) and
rendered — here through our own z-buffer rasterizer instead of pytorch3d.

Everything is a pure function over a ``BfmAssets`` pytree; the decode is
one fused batch of MXU matmuls (blendshape einsums), jit/vmap-safe.

The D3DFR coefficient *encoder* (ReconNetWrapper, d3dfr_pytorch.py:394-432:
torchvision ResNet50 backbone + zero-init 1x1-conv heads) is
``D3dfrReconNet`` below, reusing our flax ResNet50.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..infra.torch_compat import to_np
from ..models.resnet import ResNet50, resnet50_params_from_torch
from .rasterizer import rasterize_auto

BFM_COEFF_DIM = 257
D3DFR_DEFAULT_FOCAL = 1015.0 * 256.0 / 224.0
D3DFR_DEFAULT_IMG_SIZE = 256


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BfmAssets:
    """BFM09 model tensors (BFM09Model.py:46-72).

    meanshape (3V,); id_base (3V, 80); exp_base (3V, 64); meantex (3V,);
    tex_base (3V, 80); tri (F, 3) int32 (0-based); point_buf (V, K) int32
    (0-based face ids per vertex, padded with F = the appended zero-normal
    row); keypoints (68,) int32; optional skinmask (V,).
    """

    meanshape: jax.Array
    id_base: jax.Array
    exp_base: jax.Array
    meantex: jax.Array
    tex_base: jax.Array
    tri: jax.Array
    point_buf: jax.Array
    keypoints: jax.Array
    skinmask: Optional[jax.Array] = None

    def tree_flatten(self):
        fields = [f.name for f in dataclasses.fields(self)]
        return tuple(getattr(self, n) for n in fields), fields

    @classmethod
    def tree_unflatten(cls, fields, values):
        return cls(**dict(zip(fields, values)))

    @property
    def num_vertices(self) -> int:
        return self.meanshape.shape[0] // 3

    @classmethod
    def from_mat(cls, path: str) -> "BfmAssets":
        """Load ``BFM09_model_info.mat`` (blendshape_visualizer.py:14-16).
        1-based tri/point_buf/keypoints are shifted to 0-based as the
        reference does (BFM09Model.py:16-17,66-72)."""
        from scipy.io import loadmat  # host-side, one-time

        m = loadmat(path)
        return cls(
            meanshape=jnp.asarray(m["meanshape"], jnp.float32).reshape(-1),
            id_base=jnp.asarray(m["idBase"], jnp.float32),
            exp_base=jnp.asarray(m["exBase"], jnp.float32),
            meantex=jnp.asarray(m["meantex"], jnp.float32).reshape(-1),
            tex_base=jnp.asarray(m["texBase"], jnp.float32),
            tri=jnp.asarray(m["tri"], jnp.int32) - 1,
            point_buf=jnp.asarray(m["point_buf"], jnp.int32) - 1,
            keypoints=jnp.asarray(m["keypoints"], jnp.int32).reshape(-1) - 1,
            skinmask=jnp.asarray(m["skinmask"], jnp.float32).reshape(-1),
        )


def split_coeffs(coeffs: jax.Array) -> Tuple[jax.Array, ...]:
    """(B, 257) -> id(80), exp(64), tex(80), angles(3), gamma(27), trans(3)
    (BFM09Model.py:78-88)."""
    return (coeffs[:, :80], coeffs[:, 80:144], coeffs[:, 144:224],
            coeffs[:, 224:227], coeffs[:, 227:254], coeffs[:, 254:257])


def merge_coeffs(id_c, exp_c, tex_c, angles, gamma, trans) -> jax.Array:
    return jnp.concatenate([id_c, exp_c, tex_c, angles, gamma, trans], axis=1)


def bfm_shape(assets: BfmAssets, id_c: jax.Array, exp_c: jax.Array) -> jax.Array:
    """(B, 80), (B, 64) -> (B, V, 3) vertices, re-centered on the meanshape
    centroid (BFM09Model.py:140-150)."""
    B = id_c.shape[0]
    flat = (id_c @ assets.id_base.T + exp_c @ assets.exp_base.T
            + assets.meanshape[None])
    vs = flat.reshape(B, -1, 3)
    return vs - assets.meanshape.reshape(1, -1, 3).mean(axis=1, keepdims=True)


def bfm_texture(assets: BfmAssets, tex_c: jax.Array) -> jax.Array:
    """(B, 80) -> (B, V, 3) albedo in [0, 255] space (BFM09Model.py:152-158)."""
    flat = tex_c @ assets.tex_base.T + assets.meantex[None]
    return flat.reshape(tex_c.shape[0], -1, 3)


def euler_rotation(angles: jax.Array) -> jax.Array:
    """(B, 3) XYZ euler -> (B, 3, 3), transposed for row-vector use
    (BaseModel.py:127-172: R = (Rz Ry Rx)^T, applied as v @ R)."""
    sx, sy, sz = (jnp.sin(angles[:, i]) for i in range(3))
    cx, cy, cz = (jnp.cos(angles[:, i]) for i in range(3))
    z = jnp.zeros_like(sx)
    o = jnp.ones_like(sx)
    rx = jnp.stack([o, z, z, z, cx, -sx, z, sx, cx], -1).reshape(-1, 3, 3)
    ry = jnp.stack([cy, z, sy, z, o, z, -sy, z, cy], -1).reshape(-1, 3, 3)
    rz = jnp.stack([cz, -sz, z, sz, cz, z, z, z, o], -1).reshape(-1, 3, 3)
    return jnp.transpose(rz @ ry @ rx, (0, 2, 1))


def rigid_transform(vs: jax.Array, rot: jax.Array, trans: jax.Array) -> jax.Array:
    """(B, V, 3) @ (B, 3, 3) + (B, 3) (BaseModel.py:229-234)."""
    return vs @ rot + trans[:, None, :]


def bfm_vertex_normals(assets: BfmAssets, vs: jax.Array) -> jax.Array:
    """Area-weighted vertex normals via per-vertex face lists
    (BaseModel.py:97-113: UNnormalized face normals e1 x e2 with
    e1 = v1 - v2, e2 = v2 - v3, a zero row appended for padding, summed
    over ``point_buf`` then L2-normalized)."""
    tri = assets.tri
    v1 = vs[:, tri[:, 0]]
    v2 = vs[:, tri[:, 1]]
    v3 = vs[:, tri[:, 2]]
    face_norm = jnp.cross(v1 - v2, v2 - v3)  # (B, F, 3)
    face_norm = jnp.concatenate(
        [face_norm, jnp.zeros_like(face_norm[:, :1])], axis=1)
    vn = face_norm[:, assets.point_buf].sum(axis=2)  # (B, V, 3)
    from .rasterizer import safe_unit
    return safe_unit(vn, 1e-12)  # NaN-free grad at zero normals


# SH constants (BaseModel.py:190-196)
_A0 = np.pi
_A1 = 2.0 * np.pi / np.sqrt(3.0)
_A2 = 2.0 * np.pi / np.sqrt(8.0)
_C0 = 1.0 / np.sqrt(4.0 * np.pi)
_C1 = np.sqrt(3.0) / np.sqrt(4.0 * np.pi)
_C2 = 3.0 * np.sqrt(5.0) / np.sqrt(12.0 * np.pi)
_D0 = 0.5 / np.sqrt(3.0)


def bfm_sh_basis(normals: jax.Array) -> jax.Array:
    """(..., 3) normals -> (..., 9) d3dfr SH basis (BaseModel.py:198-222;
    note the sign/ordering differs from DECA's 9-band basis in
    viz/shading.py — this matches d3dfr exactly)."""
    nx, ny, nz = normals[..., 0], normals[..., 1], normals[..., 2]
    return jnp.stack(
        [
            jnp.full_like(nx, _A0 * _C0),
            -_A1 * _C1 * ny,
            _A1 * _C1 * nz,
            -_A1 * _C1 * nx,
            _A2 * _C2 * nx * ny,
            -_A2 * _C2 * ny * nz,
            _A2 * _C2 * _D0 * (3.0 * nz ** 2 - 1.0),
            -_A2 * _C2 * nx * nz,
            _A2 * _C2 * 0.5 * (nx ** 2 - ny ** 2),
        ],
        axis=-1,
    )


def add_illumination(face_texture: jax.Array, normals: jax.Array,
                     gamma: jax.Array) -> jax.Array:
    """(B, V, 3) albedo x SH lighting from (B, 27) gamma
    (BaseModel.py:174-227; ambient offset +0.8 on the DC term)."""
    g = gamma.reshape(-1, 3, 9)
    g = g.at[:, :, 0].add(0.8)
    Y = bfm_sh_basis(normals)  # (B, V, 9)
    lighting = jnp.einsum("bvk,bck->bvc", Y, g)  # (B, V, 3)
    return face_texture * lighting


def project_vs(vs: jax.Array, focal: float = D3DFR_DEFAULT_FOCAL,
               img_size: int = D3DFR_DEFAULT_IMG_SIZE) -> jax.Array:
    """(B, V, 3) camera-frame perspective projection (BaseModel.py:115-125):
    z-reversal, camera at (0, 0, 10), pinhole p_mat; returns (B, V, 2) in
    y-UP image coords (the reference flips landmarks' y afterwards)."""
    cam = vs * jnp.asarray([1.0, 1.0, -1.0]) + jnp.asarray([0.0, 0.0, 10.0])
    half = img_size // 2
    x = focal * cam[..., 0] / cam[..., 2] + half
    y = focal * cam[..., 1] / cam[..., 2] + half
    return jnp.stack([x, y], axis=-1)


def bfm_decode(
    assets: BfmAssets,
    coeffs: jax.Array,
    focal: float = D3DFR_DEFAULT_FOCAL,
    img_size: int = D3DFR_DEFAULT_IMG_SIZE,
) -> Dict[str, jax.Array]:
    """(B, 257) -> dict of vs (world), vs_t (posed), lms_proj (68, 2, image
    row/col convention: y flipped, BFM09Model.py:106-109), color / gray_color
    (SH-lit, [0, 255])."""
    id_c, exp_c, tex_c, angles, gamma, trans = split_coeffs(coeffs)
    vs = bfm_shape(assets, id_c, exp_c)
    rot = euler_rotation(angles)
    vs_t = rigid_transform(vs, rot, trans)
    lms = project_vs(vs_t[:, assets.keypoints], focal, img_size)
    lms = jnp.stack([lms[..., 0], img_size - lms[..., 1]], axis=-1)
    tex = bfm_texture(assets, tex_c)
    # normals in the UNposed frame, rotated (BFM09Model.py:112-113)
    norm = bfm_vertex_normals(assets, vs) @ rot
    color = add_illumination(tex, norm, gamma)
    gray = add_illumination(jnp.full_like(tex, 127.0), norm, gamma)
    return {"vs": vs, "vs_t": vs_t, "lms_proj": lms, "texture": tex,
            "color": color, "gray_color": gray}


def render_bfm(
    assets: BfmAssets,
    coeffs: jax.Array,
    img_size: int = D3DFR_DEFAULT_IMG_SIZE,
    focal: float = D3DFR_DEFAULT_FOCAL,
    gray: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """(B, 257) -> ((B, H, W, 3) render clamped to [0, 255], (B, H, W) mask).

    Replaces the pytorch3d SoftPhong renderer (BaseModel.py:66-95) with our
    z-buffer rasterizer: vertices go to NDC (y up, matching the projection's
    y-up image frame) with camera-frame z as depth (smaller = closer wins).
    """
    out = bfm_decode(assets, coeffs, focal, img_size)
    vs_t = out["vs_t"]
    pix = project_vs(vs_t, focal, img_size)  # (B, V, 2) y-up
    ndc_xy = 2.0 * pix / img_size - 1.0
    depth = 10.0 - vs_t[..., 2]  # camera-frame z
    ndc = jnp.concatenate([ndc_xy, depth[..., None]], axis=-1)
    color = out["gray_color"] if gray else out["color"]
    # rasterize_auto bins the ~70k-face BFM mesh (Pallas on TPU) instead of
    # the dense O(F) scan; BFM is denser than FLAME so give each tile a
    # deeper face budget (~91k bbox face-tile pairs over 49 tiles at 224^2)
    img, mask = rasterize_auto(ndc, assets.tri, color, img_size, img_size,
                               cap=4096)
    return jnp.clip(img, 0.0, 255.0), mask


class Visualizer3dmmBfm:
    """Batch coeff-sequence -> rendered frames, mirroring the reference's
    ``Visualizer3DMM`` driver (face_d3dfr/blendshape_visualizer.py:10-24)."""

    def __init__(self, assets: BfmAssets,
                 img_size: int = D3DFR_DEFAULT_IMG_SIZE,
                 focal: Optional[float] = None):
        self.assets = assets
        self.img_size = img_size
        self.focal = float(focal if focal is not None
                           else 1015.0 * img_size / 224.0)
        self._render = jax.jit(
            lambda a, c: render_bfm(a, c, self.img_size, self.focal))

    def __call__(self, coeffs: jax.Array) -> jax.Array:
        img, _ = self._render(self.assets, coeffs)
        return img


# --- D3DFR coefficient encoder ------------------------------------------------


class D3dfrReconNet(nn.Module):
    """Image -> 257-d BFM coefficients (ReconNetWrapper,
    d3dfr_pytorch.py:394-432): torchvision ResNet50 trunk (global pool) +
    per-group zero-init 1x1-conv ("final_layers") heads, concatenated in
    the split_coeffs order. Input (B, H, W, 3)."""

    head_dims: Tuple[int, ...] = (80, 64, 80, 3, 27, 2, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        feat = ResNet50(dtype=self.dtype, name="backbone")(x, train)
        outs = [
            nn.Dense(d, dtype=self.dtype,
                     kernel_init=nn.initializers.zeros,
                     name=f"head{i}")(feat)
            for i, d in enumerate(self.head_dims)
        ]
        return jnp.concatenate(outs, axis=-1)


def d3dfr_params_from_torch(
    sd: Mapping[str, Any], prefix: str = "",
    head_dims: Tuple[int, ...] = (80, 64, 80, 3, 27, 2, 1),
    heads_key: str = "final_layers",
) -> Dict[str, Any]:
    """ReconNetWrapper state dict -> flax variables. ``heads_key`` is
    ``final_layers`` for ReconNetWrapper, ``fianl_layers`` (sic) for
    ResNet50_nofc (d3dfr_pytorch.py:371,429)."""
    back = resnet50_params_from_torch(sd, prefix=f"{prefix}backbone.")
    P: Dict[str, Any] = {"backbone": back["params"]}
    S: Dict[str, Any] = {"backbone": back["batch_stats"]}
    for i in range(len(head_dims)):
        w = to_np(sd[f"{prefix}{heads_key}.{i}.weight"])  # (O, 2048, 1, 1)
        b = to_np(sd[f"{prefix}{heads_key}.{i}.bias"])
        P[f"head{i}"] = {"kernel": w[:, :, 0, 0].T, "bias": b}
    return {"params": P, "batch_stats": S}
