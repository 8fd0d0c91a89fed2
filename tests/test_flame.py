"""FLAME LBS parity against an independent torch oracle.

The oracle below re-implements the published SMPL/FLAME linear-blend-skinning
math (Loper et al. 2015 eq. 2-4) in torch, written from the formulas — it is
the same math the reference uses (gdl/utils/lbs.py:142-232), so agreement
pins our core.flame to the reference's numerics without its code.
"""

import numpy as np
import torch

import jax.numpy as jnp

from avi_talking_tpu.core import (
    FlameModel,
    batch_orth_proj,
    lbs,
    synthetic_assets,
    vertices2landmarks,
)
from avi_talking_tpu.core.flame import FLAME_PARENTS


def torch_rodrigues(rvec):
    angle = torch.norm(rvec + 1e-8, dim=1, keepdim=True)
    axis = rvec / angle
    cos, sin = torch.cos(angle)[:, None], torch.sin(angle)[:, None]
    rx, ry, rz = axis[:, 0], axis[:, 1], axis[:, 2]
    zeros = torch.zeros_like(rx)
    K = torch.stack(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], dim=1
    ).reshape(-1, 3, 3)
    eye = torch.eye(3).unsqueeze(0)
    return eye + sin * K + (1 - cos) * K.bmm(K)


def torch_lbs_oracle(betas, pose, a):
    """SMPL-style LBS from first principles (torch, float64-capable)."""
    B = betas.shape[0]
    v_template = torch.from_numpy(np.asarray(a.v_template))
    shapedirs = torch.from_numpy(np.asarray(a.shapedirs))
    posedirs = torch.from_numpy(np.asarray(a.posedirs))
    j_regressor = torch.from_numpy(np.asarray(a.j_regressor))
    weights = torch.from_numpy(np.asarray(a.lbs_weights))
    J = j_regressor.shape[0]

    v_shaped = v_template[None] + torch.einsum("bl,mkl->bmk", betas, shapedirs)
    joints = torch.einsum("bik,ji->bjk", v_shaped, j_regressor)
    rot = torch_rodrigues(pose.reshape(-1, 3)).reshape(B, J, 3, 3)
    pose_feat = (rot[:, 1:] - torch.eye(3)).reshape(B, -1)
    v_posed = v_shaped + (pose_feat @ posedirs).reshape(B, -1, 3)

    # forward kinematics
    parents = FLAME_PARENTS[:J]
    rel_joints = joints.clone()
    for i in range(1, J):
        rel_joints[:, i] -= joints[:, parents[i]]
    chains = []
    for i in range(J):
        tf = torch.cat(
            [
                torch.cat([rot[:, i], rel_joints[:, i, :, None]], dim=2),
                torch.tensor([0.0, 0, 0, 1]).expand(B, 1, 4),
            ],
            dim=1,
        )
        chains.append(tf if i == 0 else chains[parents[i]].bmm(tf))
    A = torch.stack(chains, dim=1)
    # subtract rest-pose joint contribution
    jh = torch.cat([joints, torch.zeros(B, J, 1)], dim=2)
    init_bone = A.reshape(B * J, 4, 4).bmm(jh.reshape(B * J, 4, 1)).reshape(B, J, 4)
    A_rel = A - torch.nn.functional.pad(init_bone[..., None], (3, 0))

    T = torch.einsum("bvj,bjpq->bvpq", weights[None].expand(B, -1, -1), A_rel)
    vh = torch.cat([v_posed, torch.ones(B, v_posed.shape[1], 1)], dim=2)
    verts = torch.einsum("bvpq,bvq->bvp", T, vh)[..., :3]
    return verts, A[..., :3, 3]


def test_lbs_matches_oracle():
    a = synthetic_assets(num_vertices=96, n_shape=8, n_exp=6, seed=3)
    rng = np.random.default_rng(0)
    B = 4
    betas = rng.standard_normal((B, 14)).astype(np.float32)
    pose = (rng.standard_normal((B, 15)) * 0.3).astype(np.float32)

    verts_ref, joints_ref = torch_lbs_oracle(
        torch.from_numpy(betas), torch.from_numpy(pose), a
    )
    verts, joints = lbs(jnp.asarray(betas), jnp.asarray(pose), a)
    np.testing.assert_allclose(
        np.asarray(verts), verts_ref.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(joints), joints_ref.numpy(), rtol=1e-4, atol=1e-5
    )


def test_zero_pose_is_shape_only():
    a = synthetic_assets(seed=1)
    B = 2
    betas = np.zeros((B, 14), np.float32)
    pose = np.zeros((B, 15), np.float32)
    verts, _ = lbs(jnp.asarray(betas), jnp.asarray(pose), a)
    np.testing.assert_allclose(
        np.asarray(verts), np.tile(np.asarray(a.v_template)[None], (B, 1, 1)),
        rtol=1e-5, atol=1e-5,
    )


def test_flame_model_call_shapes():
    a = synthetic_assets(seed=2)
    model = FlameModel(assets=a, n_shape=8, n_exp=6, with_mediapipe=True)
    B = 3
    shape = jnp.zeros((B, 8))
    exp = jnp.ones((B, 6)) * 0.1
    pose = jnp.asarray(np.random.default_rng(0).standard_normal((B, 6)).astype(np.float32) * 0.1)
    verts, lmk2d, lmk3d, lmk_mp = model(shape, exp, pose)
    assert verts.shape == (B, a.num_vertices, 3)
    assert lmk2d.shape == (B, 17 + 16, 3)  # dynamic contour + static
    assert lmk3d.shape == (B, 16, 3)
    assert lmk_mp.shape == (B, 21, 3)
    assert np.isfinite(np.asarray(verts)).all()


def test_vertices_only_jit_and_vmap_over_time():
    import jax

    a = synthetic_assets(seed=4)
    model = FlameModel(assets=a, n_shape=8, n_exp=6)
    T = 10
    exp = jnp.asarray(np.random.default_rng(1).standard_normal((T, 6)).astype(np.float32) * 0.2)
    jaw = jnp.asarray(np.random.default_rng(2).standard_normal((T, 3)).astype(np.float32) * 0.1)

    @jax.jit
    def seq_to_verts(exp, jaw):
        pose = jnp.concatenate([jnp.zeros((exp.shape[0], 3)), jaw], axis=1)
        shape = jnp.zeros((exp.shape[0], 8))
        return model.vertices_only(shape, exp, pose)

    verts = seq_to_verts(exp, jaw)
    assert verts.shape == (T, a.num_vertices, 3)


def test_landmark_interpolation_barycentric():
    a = synthetic_assets(seed=5)
    B, V = 2, a.num_vertices
    verts = jnp.asarray(np.random.default_rng(3).standard_normal((B, V, 3)).astype(np.float32))
    lmk = vertices2landmarks(verts, a.faces, a.lmk_faces_idx, a.lmk_bary_coords)
    # manual check for first landmark of first batch
    f = int(a.lmk_faces_idx[0])
    tri = np.asarray(verts)[0, np.asarray(a.faces)[f]]
    expected = (np.asarray(a.lmk_bary_coords)[0][:, None] * tri).sum(0)
    np.testing.assert_allclose(np.asarray(lmk)[0, 0], expected, rtol=1e-5, atol=1e-6)


def test_batch_orth_proj():
    X = jnp.asarray(np.random.default_rng(4).standard_normal((2, 5, 3)).astype(np.float32))
    cam = jnp.asarray([[2.0, 0.1, -0.2], [1.0, 0.0, 0.0]])
    out = batch_orth_proj(X, cam)
    np.testing.assert_allclose(
        np.asarray(out[0, :, 0]), 2.0 * (np.asarray(X)[0, :, 0] + 0.1), rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(X)[1], rtol=1e-6)


def test_flame_tex():
    from avi_talking_tpu.core.flame import FlameTex

    rng = np.random.default_rng(7)
    side, n = 8, 4
    mean = jnp.asarray(rng.uniform(0, 255, side * side * 3).astype(np.float32))
    basis = jnp.asarray(rng.standard_normal((side * side * 3, n)).astype(np.float32))
    tex_model = FlameTex(texture_mean=mean, texture_basis=basis, n_tex=n)
    code = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32))
    tex = tex_model(code)
    assert tex.shape == (2, side, side, 3)
    assert float(tex.min()) >= 0.0 and float(tex.max()) <= 1.0
    # zero code -> mean texture
    np.testing.assert_allclose(
        np.asarray(tex_model(jnp.zeros((1, n)))).reshape(-1),
        np.clip(np.asarray(mean) / 255.0, 0, 1), rtol=1e-5, atol=1e-6,
    )
