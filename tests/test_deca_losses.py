"""Parity tests for train.deca_losses vs torch oracles re-implemented from
the reference semantics (gdl/layers/losses/DecaLosses.py, gdl/models/DECA.py
_compute_loss). Oracles are NCHW torch; ours are NHWC jnp."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from avi_talking_tpu.train import deca_losses as dl

RNG = np.random.default_rng(0)


def nhwc(x_nchw):
    return jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))


# ---------------------------------------------------------------- oracles


def torch_shading_white(shading):
    rgb_diff = (shading.mean([0, 2, 3]) - 0.99) ** 2
    return rgb_diff.mean()


def torch_shading_smooth(shading):
    dx = shading[:, :, 1:-1, 1:] - shading[:, :, 1:-1, :-1]
    dy = shading[:, :, 1:, 1:-1] - shading[:, :, :-1, 1:-1]
    return (dx**2).mean() + (dy**2).mean()


def torch_albedo_constancy(albedo, alpha=15.0):
    chrom = albedo / (torch.sum(albedo, dim=1, keepdim=True) + 1e-6)
    wx = torch.exp(-alpha * (chrom[:, :, 1:, :] - chrom[:, :, :-1, :]) ** 2).detach()
    wy = torch.exp(-alpha * (chrom[:, :, :, 1:] - chrom[:, :, :, :-1]) ** 2).detach()
    lx = (albedo[:, :, 1:, :] - albedo[:, :, :-1, :]) ** 2 * wx
    ly = (albedo[:, :, :, 1:] - albedo[:, :, :, :-1]) ** 2 * wy
    return lx.mean() + ly.mean()


def torch_kl(texcode):
    mu, logvar = texcode[:, :128], texcode[:, 128:]
    kld = mu.pow(2).add_(logvar.exp()).mul_(-1).add_(1).add_(logvar)
    return torch.sum(kld).mul_(-0.5)


def torch_batch_kp(gt3, pred2, weights=None):
    gt3 = gt3.clone()
    if weights is not None:
        gt3[:, :, 2] = weights[None, :] * gt3[:, :, 2]
    kp_gt = gt3.view(-1, 3)
    kp_pred = pred2.contiguous().view(-1, 2)
    vis = kp_gt[:, 2]
    k = torch.sum(vis) * 2.0 + 1e-8
    dif_abs = torch.abs(kp_gt[:, :2] - kp_pred).sum(1)
    return torch.matmul(dif_abs, vis) / k


def torch_weighted_landmark(pred, gt2):
    w = torch.ones((68,))
    w[5:7] = 2
    w[10:12] = 2
    w[27:36] = 1.5
    w[30] = w[31] = w[35] = 3
    w[60:68] = 1.5
    w[48:60] = 1.5
    w[48] = w[54] = 3
    gt3 = torch.cat([gt2, torch.ones((gt2.shape[0], gt2.shape[1], 1))], dim=2)
    return torch_batch_kp(gt3, pred, w)


def torch_ring(ring, ring_type, margin):
    total = (ring[0] - ring[0]).sum()
    if ring_type == "51":
        diff, count = ring[-1], 0.0
        for i in range(6):
            for j in range(6):
                pd = (ring[i] - ring[j]).pow(2).sum(1)
                nd = (ring[i] - diff).pow(2).sum(1)
                total = total + F.relu(margin + pd - nd).mean()
                count += 1.0
    else:
        perms = [(a, p, n) for a in range(3) for p in range(3) if p != a
                 for n in range(3, 6)]
        count = 0.0
        for a, p, n in perms:
            pd = (ring[a] - ring[p]).pow(2).sum(1)
            nd = (ring[p] - ring[n]).pow(2).sum(1)
            total = total + F.relu(margin + pd - nd).mean()
            count += 1.0
    return total / count


class TorchIDMRF:
    """IDMRFLoss semantics for precomputed features (DecaLosses.py:461-546),
    patch_size=1."""

    def mrf(self, gen, tar):
        meanT = torch.mean(tar, 1, keepdim=True)
        gen_f, tar_f = gen - meanT, tar - meanT
        gen_n = gen_f / torch.norm(gen_f, p=2, dim=1, keepdim=True)
        tar_n = tar_f / torch.norm(tar_f, p=2, dim=1, keepdim=True)
        dists = []
        for i in range(tar.size(0)):
            t_i = tar_n[i : i + 1]
            g_i = gen_n[i : i + 1]
            patches = (
                t_i.unfold(2, 1, 1).unfold(3, 1, 1)
                .permute(0, 2, 3, 1, 4, 5).reshape(-1, t_i.shape[1], 1, 1))
            dists.append(F.conv2d(g_i, patches))
        cd = torch.cat(dists, dim=0)
        cd = -(cd - 1) / 2
        rel = cd / (torch.min(cd, dim=1, keepdim=True)[0] + 1e-5)
        cs = torch.exp((1.0 - rel) / 0.5)
        cs = cs / torch.sum(cs, dim=1, keepdim=True)
        k_max = torch.max(cs.view(cs.shape[0], cs.shape[1], -1), dim=2)[0]
        div = torch.mean(k_max, dim=1)
        return torch.sum(-torch.log(div))

    def __call__(self, gen_feats, tar_feats):
        style = sum(self.mrf(gen_feats[k], tar_feats[k])
                    for k in ("relu_3_2", "relu_4_2"))
        content = self.mrf(gen_feats["relu_4_2"], tar_feats["relu_4_2"])
        return style + content


# ------------------------------------------------------------------ tests


def test_shading_white_parity():
    x = RNG.uniform(0.2, 1.4, (2, 3, 9, 9)).astype(np.float32)
    ours = dl.shading_white_loss(nhwc(x))
    ref = torch_shading_white(torch.tensor(x))
    assert abs(float(ours) - float(ref)) < 1e-6


def test_shading_smooth_parity():
    x = RNG.uniform(0, 1, (2, 3, 9, 9)).astype(np.float32)
    ours = dl.shading_smooth_loss(nhwc(x))
    ref = torch_shading_smooth(torch.tensor(x))
    assert abs(float(ours) - float(ref)) < 1e-6


def test_albedo_constancy_parity():
    x = RNG.uniform(0.05, 1, (2, 3, 8, 8)).astype(np.float32)
    ours = dl.albedo_constancy_loss(nhwc(x))
    ref = torch_albedo_constancy(torch.tensor(x))
    assert abs(float(ours) - float(ref)) < 1e-6


def test_kl_parity():
    x = RNG.standard_normal((4, 256)).astype(np.float32)
    ours = dl.kl_loss(jnp.asarray(x))
    ref = torch_kl(torch.tensor(x))
    assert abs(float(ours) - float(ref)) < 1e-3
    # the coarse tower's 50-d PCA texcode is not a VAE code: loud error,
    # not a silent (B, 0)-vs-(B, 50) broadcast
    import pytest as _pytest

    with _pytest.raises(ValueError, match="VAE"):
        dl.kl_loss(jnp.asarray(x[:, :50]))
    # configurable split for non-reference VAE widths
    ours64 = dl.kl_loss(jnp.asarray(x[:, :128]), mu_dim=64)
    ref64 = torch_kl(torch.tensor(x[:, :128]), mu_dim=64) if \
        "mu_dim" in torch_kl.__code__.co_varnames else None
    assert np.isfinite(float(ours64))


def test_landmark_losses_parity():
    pred = RNG.standard_normal((3, 68, 2)).astype(np.float32)
    gt = RNG.standard_normal((3, 68, 2)).astype(np.float32)
    gt3 = np.concatenate([gt, np.ones((3, 68, 1), np.float32)], axis=-1)
    ours_plain = dl.deca_landmark_loss(jnp.asarray(pred), jnp.asarray(gt))
    ref_plain = torch_batch_kp(torch.tensor(gt3), torch.tensor(pred))
    assert abs(float(ours_plain) - float(ref_plain)) < 1e-6
    ours_w = dl.deca_weighted_landmark_loss(jnp.asarray(pred), jnp.asarray(gt))
    ref_w = torch_weighted_landmark(torch.tensor(pred), torch.tensor(gt))
    assert abs(float(ours_w) - float(ref_w)) < 1e-6


def test_light_and_code_regs_parity():
    light = RNG.standard_normal((2, 9, 3)).astype(np.float32)
    tl = torch.tensor(light)
    ref_light = ((torch.mean(tl, dim=2)[:, :, None] - tl) ** 2).mean()
    assert abs(float(dl.light_reg(jnp.asarray(light))) - float(ref_light)) < 1e-7
    code = RNG.standard_normal((2, 100)).astype(np.float32)
    ref_shape = (torch.sum(torch.tensor(code) ** 2) / 2).item()
    assert abs(float(dl.shape_reg(jnp.asarray(code))) - ref_shape) < 1e-3


@pytest.mark.parametrize("ring_type", ["51", "33"])
def test_ring_loss_parity(ring_type):
    R = 7 if ring_type == "51" else 6
    ring = RNG.standard_normal((R, 4, 16)).astype(np.float32) * 0.3
    ours = dl.ring_loss(jnp.asarray(ring), ring_type, margin=0.5)
    ref = torch_ring(torch.tensor(ring), ring_type, 0.5)
    assert abs(float(ours) - float(ref)) < 1e-5


def test_albedo_ring_and_same_parity():
    ring = RNG.standard_normal((4, 3, 8)).astype(np.float32)
    ours = dl.albedo_ring_loss(jnp.asarray(ring), margin=0.1)
    tr = torch.tensor(ring)
    total, count = torch.zeros(()), 0.0
    for i in range(3):
        for j in range(3):
            pd = (tr[i] - tr[j]).pow(2).sum(1)
            nd = (tr[i] - tr[-1]).pow(2).sum(1)
            total = total + F.relu(0.1 + pd - nd).mean()
            count += 1
    assert abs(float(ours) - float(total / count)) < 1e-6
    ours_same = dl.albedo_same_loss(jnp.asarray(ring))
    ref_same = sum((tr[i] - tr[j]).pow(2).mean() for i in range(3)
                   for j in range(3)) / 4
    assert abs(float(ours_same) - float(ref_same)) < 1e-6


def test_photometric_normalization_modes():
    pred = RNG.uniform(0, 1, (2, 3, 6, 6)).astype(np.float32)
    gt = RNG.uniform(0, 1, (2, 3, 6, 6)).astype(np.float32)
    masks = (RNG.uniform(0, 1, (2, 1, 6, 6)) > 0.4).astype(np.float32)
    tp, tg, tm = map(torch.tensor, (pred, gt, masks))
    base = tm * (tp - tg).abs()
    refs = {
        "mean": base.mean(),
        "rel_mask_value": (base * tm.mean(dim=(1, 2, 3), keepdim=True)).mean(),
        "abs_mask_value": (base * tm.sum(dim=(1, 2, 3), keepdim=True)).mean(),
    }
    for mode, ref in refs.items():
        ours = dl.photometric_loss(nhwc(pred), nhwc(gt), nhwc(masks), mode)
        assert abs(float(ours) - float(ref)) < 1e-6, mode


def test_idmrf_parity():
    feats = {
        "relu_3_2": RNG.uniform(0, 1, (2, 7, 5, 5)).astype(np.float32),
        "relu_4_2": RNG.uniform(0, 1, (2, 6, 3, 3)).astype(np.float32),
    }
    feats_t = {
        "relu_3_2": RNG.uniform(0, 1, (2, 7, 5, 5)).astype(np.float32),
        "relu_4_2": RNG.uniform(0, 1, (2, 6, 3, 3)).astype(np.float32),
    }
    ours = dl.IDMRFLoss()(
        {k: nhwc(v) for k, v in feats.items()},
        {k: nhwc(v) for k, v in feats_t.items()},
    )
    ref = TorchIDMRF()(
        {k: torch.tensor(v) for k, v in feats.items()},
        {k: torch.tensor(v) for k, v in feats_t.items()},
    )
    assert abs(float(ours) - float(ref)) < 5e-4


def test_coarse_losses_composes():
    B, H, W = 2, 8, 8
    codedict = {
        "predicted_landmarks": jnp.asarray(
            RNG.standard_normal((B, 68, 2)).astype(np.float32)),
        "lmk": jnp.asarray(RNG.standard_normal((B, 68, 2)).astype(np.float32)),
        "predicted_images": jnp.asarray(
            RNG.uniform(0, 1, (B, H, W, 3)).astype(np.float32)),
        "images": jnp.asarray(RNG.uniform(0, 1, (B, H, W, 3)).astype(np.float32)),
        "masks": jnp.ones((B, H, W, 1)),
        "shading": jnp.asarray(RNG.uniform(0, 2, (B, H, W, 3)).astype(np.float32)),
        "albedo": jnp.asarray(RNG.uniform(0, 1, (B, 4, 4, 3)).astype(np.float32)),
        "shapecode": jnp.asarray(RNG.standard_normal((B, 10)).astype(np.float32)),
        "expcode": jnp.asarray(RNG.standard_normal((B, 6)).astype(np.float32)),
        "texcode": jnp.asarray(RNG.standard_normal((B, 5)).astype(np.float32)),
        "lightcode": jnp.asarray(RNG.standard_normal((B, 9, 3)).astype(np.float32)),
    }
    terms = dl.coarse_losses(codedict)
    for k in ("landmark", "eye_distance", "lip_distance", "photometric",
              "shape_reg", "expression_reg", "tex_reg", "light_reg",
              "shading_white", "shading_smooth", "albedo_constancy"):
        assert k in terms and np.isfinite(float(terms[k])), k
    total = sum(float(v) for v in terms.values())
    assert np.isfinite(total)
