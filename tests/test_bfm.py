"""Parity tests for the BFM09/Deep3DFaceRecon visualizer path (SURVEY §2.5
"BFM visualizers"). The torch oracle re-implements the published
Deep3DFaceRecon decode math (euler XYZ rotation, point_buf vertex normals,
9-band SH with +0.8 ambient, pinhole projection) on synthetic BFM assets.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from avi_talking_tpu.viz.bfm import (
    BfmAssets,
    D3dfrReconNet,
    Visualizer3dmmBfm,
    add_illumination,
    bfm_decode,
    bfm_shape,
    bfm_texture,
    bfm_vertex_normals,
    d3dfr_params_from_torch,
    euler_rotation,
    merge_coeffs,
    project_vs,
    render_bfm,
    split_coeffs,
)

RNG = np.random.default_rng(0)


def _grid_mesh(n=6):
    """Triangulated n x n plane with slight z noise: V=n^2 verts, faces,
    per-vertex face lists padded with F (the zero-normal row)."""
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    verts = np.stack(
        [ii.ravel() / (n - 1) - 0.5, jj.ravel() / (n - 1) - 0.5,
         RNG.normal(0, 0.05, n * n)], axis=1).astype(np.float32)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a, b, c, d = (i * n + j, i * n + j + 1, (i + 1) * n + j,
                          (i + 1) * n + j + 1)
            faces += [(a, b, c), (b, d, c)]
    faces = np.asarray(faces, np.int32)
    F, V = len(faces), n * n
    lists = [[] for _ in range(V)]
    for fi, f in enumerate(faces):
        for v in f:
            lists[v].append(fi)
    K = max(len(l) for l in lists)
    point_buf = np.full((V, K), F, np.int32)  # pad with the zero row
    for v, l in enumerate(lists):
        point_buf[v, : len(l)] = l
    return verts, faces, point_buf


def _synth_assets(n=6, n_id=8, n_exp=6, n_tex=5, n_kp=10):
    verts, faces, point_buf = _grid_mesh(n)
    V = verts.shape[0]
    return BfmAssets(
        meanshape=jnp.asarray(verts.reshape(-1)),
        id_base=jnp.asarray(RNG.normal(0, 0.02, (3 * V, n_id)).astype(np.float32)),
        exp_base=jnp.asarray(RNG.normal(0, 0.02, (3 * V, n_exp)).astype(np.float32)),
        meantex=jnp.asarray(RNG.uniform(80, 180, 3 * V).astype(np.float32)),
        tex_base=jnp.asarray(RNG.normal(0, 5.0, (3 * V, n_tex)).astype(np.float32)),
        tri=jnp.asarray(faces),
        point_buf=jnp.asarray(point_buf),
        keypoints=jnp.asarray(RNG.choice(V, n_kp, replace=False).astype(np.int32)),
    )


def _coeffs(assets, B=2, dims=(257,)):
    n_id = assets.id_base.shape[1]
    n_exp = assets.exp_base.shape[1]
    n_tex = assets.tex_base.shape[1]
    id_c = RNG.normal(0, 1, (B, 80)).astype(np.float32)
    id_c[:, n_id:] = 0
    exp_c = RNG.normal(0, 1, (B, 64)).astype(np.float32)
    exp_c[:, n_exp:] = 0
    tex_c = RNG.normal(0, 1, (B, 80)).astype(np.float32)
    tex_c[:, n_tex:] = 0
    angles = RNG.normal(0, 0.3, (B, 3)).astype(np.float32)
    gamma = RNG.normal(0, 0.2, (B, 27)).astype(np.float32)
    trans = np.concatenate(
        [RNG.normal(0, 0.1, (B, 2)), RNG.normal(0, 0.1, (B, 1))], 1
    ).astype(np.float32)
    return id_c, exp_c, tex_c, angles, gamma, trans


def _pad_bases(assets):
    """Synthetic bases are narrower than 80/64/80; embed them in
    full-width zero-padded bases so the 257-d coeff layout holds."""
    V3 = assets.meanshape.shape[0]

    def pad(base, width):
        out = np.zeros((V3, width), np.float32)
        out[:, : base.shape[1]] = np.asarray(base)
        return jnp.asarray(out)

    return BfmAssets(
        meanshape=assets.meanshape,
        id_base=pad(assets.id_base, 80),
        exp_base=pad(assets.exp_base, 64),
        meantex=assets.meantex,
        tex_base=pad(assets.tex_base, 80),
        tri=assets.tri,
        point_buf=assets.point_buf,
        keypoints=assets.keypoints,
    )


# --- torch oracle (published Deep3DFaceRecon math) ----------------------------


def t_rotation(angles):
    n_b = angles.shape[0]
    sx, sy, sz = (torch.sin(angles[:, i]) for i in range(3))
    cx, cy, cz = (torch.cos(angles[:, i]) for i in range(3))
    rotXYZ = torch.eye(3).view(1, 3, 3).repeat(n_b * 3, 1, 1).view(3, n_b, 3, 3)
    rotXYZ[0, :, 1, 1], rotXYZ[0, :, 1, 2] = cx, -sx
    rotXYZ[0, :, 2, 1], rotXYZ[0, :, 2, 2] = sx, cx
    rotXYZ[1, :, 0, 0], rotXYZ[1, :, 0, 2] = cy, sy
    rotXYZ[1, :, 2, 0], rotXYZ[1, :, 2, 2] = -sy, cy
    rotXYZ[2, :, 0, 0], rotXYZ[2, :, 0, 1] = cz, -sz
    rotXYZ[2, :, 1, 0], rotXYZ[2, :, 1, 1] = sz, cz
    return rotXYZ[2].bmm(rotXYZ[1]).bmm(rotXYZ[0]).permute(0, 2, 1)


def t_norm(vs, tri, point_buf):
    v1, v2, v3 = (vs[:, tri[:, i], :] for i in range(3))
    face_norm = torch.cross(v1 - v2, v2 - v3, dim=-1)
    empty = torch.zeros((face_norm.size(0), 1, 3), dtype=face_norm.dtype)
    face_norm = torch.cat((face_norm, empty), 1)
    v_norm = face_norm[:, point_buf, :].sum(2)
    return v_norm / v_norm.norm(dim=2).unsqueeze(2)


def t_illum(face_texture, norm, gamma):
    n_b, num_vertex, _ = face_texture.size()
    gamma = gamma.view(-1, 3, 9).clone()
    gamma[:, :, 0] += 0.8
    gamma = gamma.permute(0, 2, 1)
    a0, a1, a2 = np.pi, 2 * np.pi / np.sqrt(3.0), 2 * np.pi / np.sqrt(8.0)
    c0 = 1 / np.sqrt(4 * np.pi)
    c1 = np.sqrt(3.0) / np.sqrt(4 * np.pi)
    c2 = 3 * np.sqrt(5.0) / np.sqrt(12 * np.pi)
    d0 = 0.5 / np.sqrt(3.0)
    norm = norm.reshape(-1, 3)
    nx, ny, nz = norm[:, 0], norm[:, 1], norm[:, 2]
    Y0 = torch.ones(n_b * num_vertex) * a0 * c0
    arrH = [Y0, -a1 * c1 * ny, a1 * c1 * nz, -a1 * c1 * nx,
            a2 * c2 * nx * ny, -a2 * c2 * ny * nz,
            a2 * c2 * d0 * (3 * nz.pow(2) - 1), -a2 * c2 * nx * nz,
            a2 * c2 * 0.5 * (nx.pow(2) - ny.pow(2))]
    Y = torch.stack(arrH, 1).view(n_b, num_vertex, 9)
    return face_texture * Y.bmm(gamma)


def t_project(vs, focal, img_size):
    p = torch.tensor([[focal, 0.0, img_size // 2],
                      [0.0, focal, img_size // 2],
                      [0.0, 0.0, 1.0]])
    rz = torch.diag(torch.tensor([1.0, 1.0, -1.0]))
    cam = vs @ rz + torch.tensor([0.0, 0.0, 10.0])
    aug = cam @ p.T
    return aug[:, :, :2] / aug[:, :, 2:].reshape(vs.shape[0], -1, 1)


def test_bfm_decode_parity():
    assets = _pad_bases(_synth_assets())
    id_c, exp_c, tex_c, angles, gamma, trans = _coeffs(assets)
    coeffs = merge_coeffs(*[jnp.asarray(a) for a in
                            (id_c, exp_c, tex_c, angles, gamma, trans)])
    out = jax.jit(lambda a, c: bfm_decode(a, c))(assets, coeffs)

    mean = torch.tensor(np.asarray(assets.meanshape))
    idb = torch.tensor(np.asarray(assets.id_base))
    exb = torch.tensor(np.asarray(assets.exp_base))
    mtex = torch.tensor(np.asarray(assets.meantex))
    texb = torch.tensor(np.asarray(assets.tex_base))
    tri = torch.tensor(np.asarray(assets.tri), dtype=torch.long)
    pbuf = torch.tensor(np.asarray(assets.point_buf), dtype=torch.long)
    kp = torch.tensor(np.asarray(assets.keypoints), dtype=torch.long)
    B = id_c.shape[0]

    shape_flat = (torch.einsum("ij,aj->ai", idb, torch.tensor(id_c))
                  + torch.einsum("ij,aj->ai", exb, torch.tensor(exp_c)) + mean)
    vs = shape_flat.view(B, -1, 3) - mean.view(1, -1, 3).mean(1, keepdim=True)
    rot = t_rotation(torch.tensor(angles))
    vs_t = vs @ rot + torch.tensor(trans).view(-1, 1, 3)
    lms = t_project(vs_t[:, kp], 1015.0 * 256.0 / 224.0, 256)
    lms = torch.stack([lms[:, :, 0], 256 - lms[:, :, 1]], dim=2)
    tex = (torch.einsum("ij,aj->ai", texb, torch.tensor(tex_c))
           + mtex).view(B, -1, 3)
    norm = t_norm(vs, tri, pbuf).bmm(rot)
    color = t_illum(tex, norm, torch.tensor(gamma))

    np.testing.assert_allclose(np.asarray(out["vs_t"]), vs_t.numpy(),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["lms_proj"]), lms.numpy(),
                               atol=1e-3, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["color"]), color.numpy(),
                               atol=1e-3, rtol=1e-4)


def test_bfm_render_smoke_and_grads():
    assets = _pad_bases(_synth_assets())
    # front-facing grid at z ~ 0 fills the image center
    coeffs = np.zeros((1, 257), np.float32)
    coeffs[0, 227] = coeffs[0, 236] = coeffs[0, 245] = 0.2  # some DC light
    img, mask = render_bfm(assets, jnp.asarray(coeffs), img_size=64)
    assert img.shape == (1, 64, 64, 3) and mask.shape == (1, 64, 64)
    assert bool(mask.any()), "mesh should cover some pixels"
    assert float(img.max()) <= 255.0 and float(img.min()) >= 0.0
    inside = np.asarray(mask[0])
    assert inside[32, 32], "center pixel should be covered"

    viz = Visualizer3dmmBfm(assets, img_size=32)
    seq = jnp.asarray(np.tile(coeffs, (3, 1)))
    frames = viz(seq)
    assert frames.shape == (3, 32, 32, 3)
    assert np.isfinite(np.asarray(frames)).all()


def test_d3dfr_recon_net_zero_init_and_shapes():
    # The ResNet50 backbone importer is pinned by test_emoca.py's torch
    # oracle; here we pin the ReconNetWrapper head semantics.
    net = D3dfrReconNet()
    x = jnp.zeros((1, 64, 64, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    y = net.apply(variables, x)
    assert y.shape == (1, 257)
    # zero-init heads -> exactly zero coefficients at init (reference
    # zero-initializes final_layers, d3dfr_pytorch.py:425-427)
    assert float(jnp.abs(y).max()) == 0.0
    out = bfm_decode(_pad_bases(_synth_assets()), y)
    assert np.isfinite(np.asarray(out["color"])).all()


def test_split_merge_roundtrip():
    c = jnp.asarray(RNG.normal(0, 1, (3, 257)).astype(np.float32))
    parts = split_coeffs(c)
    assert [p.shape[1] for p in parts] == [80, 64, 80, 3, 27, 3]
    np.testing.assert_array_equal(np.asarray(merge_coeffs(*parts)),
                                  np.asarray(c))
