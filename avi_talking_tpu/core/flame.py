"""FLAME 3D head model as pure-functional JAX (linear blend skinning).

TPU-first re-design of the reference's torch FLAME decoder
(/root/reference/BlendshapeVisualizer/EMOCA/gdl/models/DecaFLAME.py:44-298 and
gdl/utils/lbs.py:103-380):

  * assets are a frozen pytree of jnp arrays (no nn.Module buffers, no
    chumpy/pickle at runtime — converted once on host to npz),
  * ``lbs`` is expressed as einsums/matmuls so a (B*T)-flattened frame batch
    becomes a handful of large MXU matmuls (blend_shapes is a
    (B, n_betas) x (n_betas, V*3) matmul — the FLOPs hot spot #3 of the
    reference's inference call stack, SURVEY.md §3.1),
  * the 4x4 homogeneous-transform kinematic chain over FLAME's 5 joints is
    unrolled statically (parents are static metadata), so there is no scan
    and XLA fuses the whole decoder.

Conventions match the reference: pose layout [global(3), neck(3), jaw(3),
eyes(6)] in axis-angle; betas = concat[shape, expression]; landmark sets:
static 68-pt 2D (with dynamic contour), full 68-pt 3D, mediapipe 105-pt.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .rotations import batch_rodrigues, rot_mat_to_euler_y

FLAME_NUM_VERTICES = 5023
FLAME_NUM_JOINTS = 5  # global, neck, jaw, eye_l, eye_r
# static kinematic tree of FLAME: parents[k] for joints above
FLAME_PARENTS = (-1, 0, 1, 1, 1)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class FlameAssets:
    """FLAME model tensors (a pytree — can be donated/sharded/jitted over).

    Shapes (V=num vertices, J=num joints, F=num faces, L=landmarks):
      v_template (V, 3); shapedirs (V, 3, n_shape + n_exp);
      posedirs ((J-1)*9, V*3); j_regressor (J, V); lbs_weights (V, J);
      faces (F, 3) int32; static landmark embeddings; optional dynamic
      contour and mediapipe embeddings.
    """

    v_template: jax.Array
    shapedirs: jax.Array
    posedirs: jax.Array
    j_regressor: jax.Array
    lbs_weights: jax.Array
    faces: jax.Array
    lmk_faces_idx: Optional[jax.Array] = None  # (L68,)
    lmk_bary_coords: Optional[jax.Array] = None  # (L68, 3)
    dynamic_lmk_faces_idx: Optional[jax.Array] = None  # (79, 17)
    dynamic_lmk_bary_coords: Optional[jax.Array] = None  # (79, 17, 3)
    full_lmk_faces_idx: Optional[jax.Array] = None  # (68,)
    full_lmk_bary_coords: Optional[jax.Array] = None  # (68, 3)
    mediapipe_lmk_faces_idx: Optional[jax.Array] = None  # (105,)
    mediapipe_lmk_bary_coords: Optional[jax.Array] = None  # (105, 3)

    # pytree plumbing -----------------------------------------------------
    def tree_flatten(self):
        fields = [f.name for f in dataclasses.fields(self)]
        return tuple(getattr(self, n) for n in fields), tuple(fields)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(**dict(zip(aux, children)))

    @property
    def num_vertices(self) -> int:
        return self.v_template.shape[0]

    @property
    def num_joints(self) -> int:
        return self.j_regressor.shape[0]


def blend_shapes(betas: jax.Array, shape_disps: jax.Array) -> jax.Array:
    """(B, n) x (V, 3, n) -> (B, V, 3) PCA displacement (one MXU matmul)."""
    v, three, n = shape_disps.shape
    flat = shape_disps.reshape(v * three, n)
    return (betas @ flat.T).reshape(betas.shape[0], v, three)


def vertices2joints(j_regressor: jax.Array, vertices: jax.Array) -> jax.Array:
    """(J, V) x (B, V, 3) -> (B, J, 3)."""
    return jnp.einsum("bvk,jv->bjk", vertices, j_regressor)


def _rigid_transform_chain(
    rot_mats: jax.Array,  # (B, J, 3, 3)
    joints: jax.Array,  # (B, J, 3)
    parents: tuple[int, ...],
) -> tuple[jax.Array, jax.Array]:
    """Forward kinematics; parents are static so the chain is unrolled.

    Returns posed joints (B, J, 3) and relative transforms A (B, J, 4, 4)
    matching ``batch_rigid_transform`` (gdl/utils/lbs.py:326-380).
    """
    B, J = joints.shape[:2]
    rel_joints = joints - jnp.concatenate(
        [jnp.zeros_like(joints[:, :1])]
        + [joints[:, parents[i] : parents[i] + 1] for i in range(1, J)],
        axis=1,
    )

    def make_tf(R, t):  # (B,3,3),(B,3) -> (B,4,4)
        top = jnp.concatenate([R, t[:, :, None]], axis=2)
        bottom = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], R.dtype)[None, None, :], (R.shape[0], 1, 4)
        )
        return jnp.concatenate([top, bottom], axis=1)

    transforms = [make_tf(rot_mats[:, 0], rel_joints[:, 0])]
    for i in range(1, J):
        transforms.append(transforms[parents[i]] @ make_tf(rot_mats[:, i], rel_joints[:, i]))
    transforms = jnp.stack(transforms, axis=1)  # (B, J, 4, 4)

    posed_joints = transforms[..., :3, 3]
    # subtract the contribution of the rest-pose joint location
    joints_h = jnp.concatenate([joints, jnp.zeros_like(joints[..., :1])], axis=-1)
    init_bone = transforms @ joints_h[..., None]  # (B, J, 4, 1)
    rel_transforms = transforms - jnp.concatenate(
        [jnp.zeros_like(transforms[..., :3]), init_bone], axis=-1
    )
    return posed_joints, rel_transforms


def lbs(
    betas: jax.Array,  # (B, n_shape + n_exp)
    pose: jax.Array,  # (B, J*3) axis-angle
    assets: FlameAssets,
    detach_pose_correctives: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Linear blend skinning -> (vertices (B, V, 3), posed joints (B, J, 3)).

    Port of the math in gdl/utils/lbs.py:142-232 (pose2rot=True path).
    """
    B = betas.shape[0]
    J = assets.num_joints
    dtype = betas.dtype

    v_shaped = assets.v_template[None] + blend_shapes(betas, assets.shapedirs)
    joints = vertices2joints(assets.j_regressor, v_shaped)

    rot_mats = batch_rodrigues(pose.reshape(-1, 3)).reshape(B, J, 3, 3)
    ident = jnp.eye(3, dtype=dtype)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(B, -1)  # (B, (J-1)*9)
    pose_offsets = (pose_feature @ assets.posedirs).reshape(B, -1, 3)
    if detach_pose_correctives:
        pose_offsets = jax.lax.stop_gradient(pose_offsets)
    v_posed = v_shaped + pose_offsets

    posed_joints, rel_tf = _rigid_transform_chain(rot_mats, joints, FLAME_PARENTS[:J])

    # skinning: W (V, J) x A (B, J, 16) -> per-vertex transforms (B, V, 4, 4)
    T = jnp.einsum("vj,bjpq->bvpq", assets.lbs_weights, rel_tf)
    v_h = jnp.concatenate([v_posed, jnp.ones_like(v_posed[..., :1])], axis=-1)
    verts = jnp.einsum("bvpq,bvq->bvp", T, v_h)[..., :3]
    return verts, posed_joints


def vertices2landmarks(
    vertices: jax.Array,  # (B, V, 3)
    faces: jax.Array,  # (F, 3) int
    lmk_faces_idx: jax.Array,  # (L,) or (B, L)
    lmk_bary_coords: jax.Array,  # (L, 3) or (B, L, 3)
) -> jax.Array:
    """Barycentric landmark interpolation (gdl/utils/lbs.py:103-139)."""
    if lmk_faces_idx.ndim == 1:
        lmk_faces_idx = jnp.broadcast_to(
            lmk_faces_idx[None], (vertices.shape[0],) + lmk_faces_idx.shape
        )
    if lmk_bary_coords.ndim == 2:
        lmk_bary_coords = jnp.broadcast_to(
            lmk_bary_coords[None], (vertices.shape[0],) + lmk_bary_coords.shape
        )
    lmk_faces = faces[lmk_faces_idx]  # (B, L, 3) vertex ids
    lmk_vertices = jnp.take_along_axis(
        vertices[:, :, None, :], lmk_faces[..., None].astype(jnp.int32), axis=1
    )  # (B, L, 3, 3)
    return jnp.einsum("blfi,blf->bli", lmk_vertices, lmk_bary_coords)


def _neck_chain_indices(parents: tuple[int, ...]) -> tuple[int, ...]:
    chain = []
    idx = 1  # NECK_IDX
    while idx != -1:
        chain.append(idx)
        idx = parents[idx]
    return tuple(chain)


@dataclasses.dataclass(frozen=True)
class FlameModel:
    """Callable FLAME decoder mirroring gdl DecaFLAME.FLAME / FLAME_mediapipe.

    ``__call__(shape, exp, pose)`` with pose (B, 6) = [global(3), jaw(3)]
    returns (vertices, landmarks2d, landmarks3d[, landmarks2d_mediapipe]).
    """

    assets: FlameAssets
    n_shape: int = 100
    n_exp: int = 50
    with_mediapipe: bool = False

    def full_pose(
        self,
        pose_params: jax.Array,  # (B, 6) global + jaw
        eye_pose_params: Optional[jax.Array] = None,  # (B, 6)
        neck_pose: Optional[jax.Array] = None,  # (B, 3)
    ) -> jax.Array:
        B = pose_params.shape[0]
        dtype = pose_params.dtype
        if eye_pose_params is None:
            eye_pose_params = jnp.zeros((B, 6), dtype)
        if neck_pose is None:
            neck_pose = jnp.zeros((B, 3), dtype)
        return jnp.concatenate(
            [pose_params[:, :3], neck_pose, pose_params[:, 3:], eye_pose_params], axis=1
        )

    def vertices_only(
        self,
        shape_params: jax.Array,
        expression_params: jax.Array,
        pose_params: Optional[jax.Array] = None,
    ) -> jax.Array:
        """The hot path: coefficients -> vertices, no landmarks."""
        B = shape_params.shape[0]
        if pose_params is None:
            pose_params = jnp.zeros((B, 6), shape_params.dtype)
        betas = jnp.concatenate([shape_params, expression_params], axis=1)
        verts, _ = lbs(betas, self.full_pose(pose_params), self.assets)
        return verts

    def _dynamic_landmarks(self, full_pose: jax.Array):
        """Contour landmark selection from the neck-chain y rotation
        (gdl/models/DecaFLAME.py:108-150)."""
        assets = self.assets
        B = full_pose.shape[0]
        chain = _neck_chain_indices(FLAME_PARENTS[: assets.num_joints])
        aa = full_pose.reshape(B, -1, 3)[:, list(chain)]  # (B, C, 3)
        rots = batch_rodrigues(aa.reshape(-1, 3)).reshape(B, -1, 3, 3)
        rel = jnp.broadcast_to(jnp.eye(3, dtype=full_pose.dtype)[None], (B, 3, 3))
        for i in range(len(chain)):
            rel = rots[:, i] @ rel
        y_deg = jnp.round(jnp.clip(rot_mat_to_euler_y(rel) * 180.0 / np.pi, max=39.0))
        y = y_deg.astype(jnp.int32)
        neg = (y < 0).astype(jnp.int32)
        below = (y < -39).astype(jnp.int32)
        neg_vals = below * 78 + (1 - below) * (39 - y)
        idx = neg * neg_vals + (1 - neg) * y  # (B,)
        return (
            assets.dynamic_lmk_faces_idx[idx],  # (B, 17)
            assets.dynamic_lmk_bary_coords[idx],  # (B, 17, 3)
        )

    def __call__(
        self,
        shape_params: jax.Array,
        expression_params: Optional[jax.Array] = None,
        pose_params: Optional[jax.Array] = None,
        eye_pose_params: Optional[jax.Array] = None,
    ):
        B = shape_params.shape[0]
        dtype = shape_params.dtype
        if expression_params is None:
            expression_params = jnp.zeros((B, self.n_exp), dtype)
        if pose_params is None:
            pose_params = jnp.zeros((B, 6), dtype)
        betas = jnp.concatenate([shape_params, expression_params], axis=1)
        fp = self.full_pose(pose_params, eye_pose_params)
        vertices, _ = lbs(betas, fp, self.assets)

        assets = self.assets
        outs = [vertices]
        if assets.lmk_faces_idx is not None:
            if assets.dynamic_lmk_faces_idx is not None:
                dyn_idx, dyn_bary = self._dynamic_landmarks(fp)
                lf = jnp.concatenate(
                    [dyn_idx, jnp.broadcast_to(assets.lmk_faces_idx[None], (B,) + assets.lmk_faces_idx.shape)],
                    axis=1,
                )
                lb = jnp.concatenate(
                    [dyn_bary, jnp.broadcast_to(assets.lmk_bary_coords[None], (B,) + assets.lmk_bary_coords.shape)],
                    axis=1,
                )
            else:
                lf, lb = assets.lmk_faces_idx, assets.lmk_bary_coords
            landmarks2d = vertices2landmarks(vertices, assets.faces, lf, lb)
        else:
            landmarks2d = None
        if assets.full_lmk_faces_idx is not None:
            landmarks3d = vertices2landmarks(
                vertices, assets.faces, assets.full_lmk_faces_idx, assets.full_lmk_bary_coords
            )
        else:
            landmarks3d = None
        if self.with_mediapipe and assets.mediapipe_lmk_faces_idx is not None:
            lmk_mp = vertices2landmarks(
                vertices,
                assets.faces,
                assets.mediapipe_lmk_faces_idx,
                assets.mediapipe_lmk_bary_coords,
            )
            return vertices, landmarks2d, landmarks3d, lmk_mp
        return vertices, landmarks2d, landmarks3d


@dataclasses.dataclass(frozen=True)
class FlameTex:
    """FLAME PCA albedo model (gdl/models/DecaFLAME.py FLAMETex):
    texture = mean + basis @ texcode, reshaped to (512, 512, 3) in [0, 255].

    Assets (texture mean/basis npz) are the external FLAME texture download;
    ``n_tex`` selects the leading PCA components like the reference's
    tex_params."""

    texture_mean: jax.Array  # (512*512*3,)
    texture_basis: jax.Array  # (512*512*3, n_components)
    n_tex: int = 50

    @classmethod
    def from_npz(cls, path: str, n_tex: int = 50) -> "FlameTex":
        import numpy as _np

        z = _np.load(path)
        mean = _np.asarray(z["mean"], _np.float32).reshape(-1)
        basis = _np.asarray(z["tex_dir"] if "tex_dir" in z else z["basis"],
                            _np.float32).reshape(mean.shape[0], -1)
        return cls(jnp.asarray(mean), jnp.asarray(basis[:, :n_tex]), n_tex)

    def __call__(self, texcode: jax.Array) -> jax.Array:
        """(B, n_tex) -> (B, 512, 512, 3) albedo in [0, 1]."""
        flat = self.texture_mean[None] + texcode @ self.texture_basis[:, : self.n_tex].T
        B = texcode.shape[0]
        side = int(round((flat.shape[1] // 3) ** 0.5))
        tex = flat.reshape(B, side, side, 3)
        return jnp.clip(tex / 255.0, 0.0, 1.0)
