"""DECA detail branch: generator parity vs torch oracle + UV geometry.

Oracle re-implements the published gdl Generator (DecaDecoder.py:27-64,
including the BatchNorm2d(ch, 0.8)=eps quirk) in torch inside the test and
checks our flax net after ``detail_generator_params_from_torch``.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from avi_talking_tpu.models.deca_detail import (  # noqa: E402
    DecaDetailModel,
    DetailGenerator,
    detail_generator_params_from_torch,
    detail_normals,
    grid_faces,
    world2uv,
)


def _torch_generator(latent_dim=16, out_channels=1, out_scale=0.01):
    sample_mode = "bilinear"
    g = tnn.Sequential()  # placeholder; build the published structure

    class G(tnn.Module):
        def __init__(self):
            super().__init__()
            self.out_scale = out_scale
            self.init_size = 32 // 4
            self.l1 = tnn.Sequential(tnn.Linear(latent_dim, 128 * self.init_size ** 2))
            self.conv_blocks = tnn.Sequential(
                tnn.BatchNorm2d(128),
                tnn.Upsample(scale_factor=2, mode=sample_mode),
                tnn.Conv2d(128, 128, 3, stride=1, padding=1),
                tnn.BatchNorm2d(128, 0.8),
                tnn.LeakyReLU(0.2, inplace=True),
                tnn.Upsample(scale_factor=2, mode=sample_mode),
                tnn.Conv2d(128, 64, 3, stride=1, padding=1),
                tnn.BatchNorm2d(64, 0.8),
                tnn.LeakyReLU(0.2, inplace=True),
                tnn.Upsample(scale_factor=2, mode=sample_mode),
                tnn.Conv2d(64, 64, 3, stride=1, padding=1),
                tnn.BatchNorm2d(64, 0.8),
                tnn.LeakyReLU(0.2, inplace=True),
                tnn.Upsample(scale_factor=2, mode=sample_mode),
                tnn.Conv2d(64, 32, 3, stride=1, padding=1),
                tnn.BatchNorm2d(32, 0.8),
                tnn.LeakyReLU(0.2, inplace=True),
                tnn.Upsample(scale_factor=2, mode=sample_mode),
                tnn.Conv2d(32, 16, 3, stride=1, padding=1),
                tnn.BatchNorm2d(16, 0.8),
                tnn.LeakyReLU(0.2, inplace=True),
                tnn.Conv2d(16, out_channels, 3, stride=1, padding=1),
                tnn.Tanh(),
            )

        def forward(self, z):
            out = self.l1(z)
            out = out.view(out.shape[0], 128, self.init_size, self.init_size)
            return self.conv_blocks(out) * self.out_scale

    del g
    torch.manual_seed(0)
    m = G().eval()
    for mod in m.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            mod.running_mean.uniform_(-0.2, 0.2)
            mod.running_var.uniform_(0.7, 1.4)
    return m


@pytest.mark.slow
def test_detail_generator_parity():
    latent = 16
    oracle = _torch_generator(latent_dim=latent)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    variables = detail_generator_params_from_torch(sd)

    rng = np.random.default_rng(0)
    z = rng.standard_normal((2, latent)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(z)).numpy().transpose(0, 2, 3, 1)

    gen = DetailGenerator(latent_dim=latent)
    got = np.asarray(gen.apply(variables, jnp.asarray(z)))
    assert got.shape == want.shape == (2, 256, 256, 1)
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-3)


def test_detail_generator_importer_covers_all_params():
    oracle = _torch_generator(latent_dim=16)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    n_torch = sum(v.size for k, v in sd.items()
                  if "num_batches_tracked" not in k)
    variables = detail_generator_params_from_torch(sd)
    assert sum(x.size for x in jax.tree.leaves(variables)) == n_torch


def test_world2uv_and_detail_normals_flat_plane():
    """A flat z=0 plane displaced by a centered bump must produce detail
    normals that tilt away from +z around the bump but stay +z far away."""
    n = 8
    ys, xs = np.mgrid[0:n, 0:n].astype(np.float32) / (n - 1)
    verts = jnp.asarray(
        np.stack([xs * 2 - 1, ys * 2 - 1, np.zeros_like(xs)], -1).reshape(-1, 3)
    )
    faces = jnp.asarray(grid_faces(n, n))
    uv = jnp.asarray(np.stack([xs, ys], -1).reshape(-1, 2))

    S = 32
    uv_v = world2uv(verts, faces, uv, faces, size=S)
    # rasterized UV positions must reproduce the plane: z == 0, x/y ramps
    assert np.allclose(np.asarray(uv_v[..., 2]), 0.0, atol=1e-5)
    inner = np.asarray(uv_v[S // 4 : -S // 4, S // 4 : -S // 4, 0])
    assert inner.std() > 0.1  # x actually ramps

    uv_n = jnp.zeros((S, S, 3)).at[..., 2].set(1.0)
    bump = np.zeros((S, S, 1), np.float32)
    bump[12:20, 12:20] = 0.3
    dn = np.asarray(detail_normals(uv_v, uv_n, jnp.asarray(bump)))
    norms = np.linalg.norm(dn, axis=-1)
    assert np.allclose(norms, 1.0, atol=1e-3)
    assert dn[2, 2, 2] > 0.99  # far from bump: still +z
    edge = dn[12, 16]  # on the bump edge: tilted
    assert edge[2] < 0.9


@pytest.mark.slow
def test_deca_detail_model_end_to_end():
    """decode(): jaw+exp+detail -> uv_z -> per-batch detail normal maps."""
    n = 6
    ys, xs = np.mgrid[0:n, 0:n].astype(np.float32) / (n - 1)
    verts = np.stack([xs * 2 - 1, ys * 2 - 1, 0.1 * xs], -1).reshape(-1, 3)
    faces = grid_faces(n, n)
    uv = np.stack([xs, ys], -1).reshape(-1, 2)

    gen = DetailGenerator(latent_dim=7, init_size=2)  # tiny: 2 -> 64
    variables = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 7)))
    model = DecaDetailModel(
        generator=gen, variables=variables,
        faces=jnp.asarray(faces), uv_coords=jnp.asarray(uv),
        uv_faces=jnp.asarray(faces), uv_size=64,
    )
    B = 2
    normals, uv_z = model.decode(
        jnp.zeros((B, 3)), jnp.zeros((B, 2)), jnp.ones((B, 2)),
        jnp.asarray(np.stack([verts] * B)),
    )
    assert normals.shape == (B, 64, 64, 3)
    assert uv_z.shape == (B, 64, 64, 1)
    assert np.isfinite(np.asarray(normals)).all()
    assert float(jnp.abs(uv_z).max()) <= 0.01 + 1e-6  # tanh * out_scale
