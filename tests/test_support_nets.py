"""Parity tests for the PD-FGC support nets (SURVEY §2.7): ResNetSE audio
embedder, PatchGAN discriminator family, GAN objectives.

Oracles re-implement the published architectures in torch inside this file
(voxceleb ResNetSE / SPADE PatchGAN — never importing reference code) with
random weights; importers must reproduce outputs.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from avi_talking_tpu.models.resnet_se import ResNetSE, resnet_se_params_from_torch
from avi_talking_tpu.models.discriminator import (
    FeatureDiscriminator,
    ImageDiscriminator,
    MultiscaleDiscriminator,
    NLayerDiscriminator,
    SpectralConv,
    avg_pool_no_pad_count,
    multiscale_params_from_torch,
    nlayer_params_from_torch,
)
from avi_talking_tpu.train.gan import (
    feature_matching_loss,
    gan_loss_d,
    gan_loss_g,
)

torch.manual_seed(0)


# --- torch oracles (published architectures, re-implemented) -----------------


class TSELayer(tnn.Module):
    def __init__(self, channel, reduction=8):
        super().__init__()
        self.avg_pool = tnn.AdaptiveAvgPool2d(1)
        self.fc = tnn.Sequential(
            tnn.Linear(channel, channel // reduction), tnn.ReLU(),
            tnn.Linear(channel // reduction, channel), tnn.Sigmoid())

    def forward(self, x):
        b, c, _, _ = x.size()
        y = self.avg_pool(x).view(b, c)
        return x * self.fc(y).view(b, c, 1, 1)


class TSEBasicBlock(tnn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.relu = tnn.ReLU()
        self.se = TSELayer(planes)
        self.downsample = downsample

    def forward(self, x):
        res = x
        out = self.bn1(self.relu(self.conv1(x)))  # relu BEFORE bn
        out = self.se(self.bn2(self.conv2(out)))
        if self.downsample is not None:
            res = self.downsample(x)
        return self.relu(out + res)


class TResNetSE(tnn.Module):
    def __init__(self, layers, num_filters, n_out, n_mels=16,
                 encoder_type="SAP"):
        super().__init__()
        self.encoder_type = encoder_type
        self.inplanes = num_filters[0]
        self.conv1 = tnn.Conv2d(1, num_filters[0], 3, 1, 1)
        self.relu = tnn.ReLU()
        self.bn1 = tnn.BatchNorm2d(num_filters[0])
        self.layer1 = self._make(num_filters[0], layers[0], 1)
        self.layer2 = self._make(num_filters[1], layers[1], 2)
        self.layer3 = self._make(num_filters[2], layers[2], 2)
        self.layer4 = self._make(num_filters[3], layers[3], 2)
        outmap = int(n_mels / 8)
        cdim = num_filters[3] * outmap
        self.attention = tnn.Sequential(
            tnn.Conv1d(cdim, 128, 1), tnn.ReLU(), tnn.BatchNorm1d(128),
            tnn.Conv1d(128, cdim, 1), tnn.Softmax(dim=2))
        self.fc = tnn.Linear(cdim * (2 if encoder_type == "ASP" else 1), n_out)

    def _make(self, planes, blocks, stride):
        down = None
        if stride != 1 or self.inplanes != planes:
            down = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes))
        layers = [TSEBasicBlock(self.inplanes, planes, stride, down)]
        self.inplanes = planes
        for _ in range(1, blocks):
            layers.append(TSEBasicBlock(planes, planes))
        return tnn.Sequential(*layers)

    def forward(self, x):
        x = self.bn1(self.relu(self.conv1(x)))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = x.reshape(x.size(0), -1, x.size(-1))
        w = self.attention(x)
        mu = torch.sum(x * w, dim=2)
        if self.encoder_type == "ASP":
            sg = torch.sqrt(
                (torch.sum(x ** 2 * w, dim=2) - mu ** 2).clamp(min=1e-5))
            mu = torch.cat((mu, sg), 1)
        return self.fc(mu.view(mu.size(0), -1))


def _randomize_bn_stats(model):
    g = torch.Generator().manual_seed(7)
    for m in model.modules():
        if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)


@pytest.mark.parametrize("enc", ["SAP", "ASP"])
def test_resnet_se_parity(enc):
    layers, filters, n_mels, n_out = (1, 1, 1, 1), (8, 16, 24, 32), 16, 10
    tm = TResNetSE(layers, filters, n_out, n_mels, enc).eval()
    _randomize_bn_stats(tm)
    x = torch.randn(2, 1, n_mels, 24)
    with torch.no_grad():
        ref = tm(x).numpy()
    fm = ResNetSE(layers=layers, num_filters=filters, n_out=n_out,
                  n_mels=n_mels, encoder_type=enc)
    variables = resnet_se_params_from_torch(tm.state_dict(), layers)
    # flax input NHWC: (B, n_mels, T, 1)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    out = fm.apply(variables, xj)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


# --- PatchGAN discriminators --------------------------------------------------


def _t_nlayer(input_nc=3, ndf=8, n_layers=4, spectral=True):
    mods = {}
    seq0 = tnn.Sequential(tnn.Conv2d(input_nc, ndf, 4, 2, 2),
                          tnn.LeakyReLU(0.2, False))
    mods["model0"] = seq0
    nf = ndf
    for n in range(1, n_layers):
        nf_prev, nf = nf, min(nf * 2, 512)
        stride = 1 if n == n_layers - 1 else 2
        conv = tnn.Conv2d(nf_prev, nf, 4, stride, 2)
        # bias removed under a norm layer (architecture.py semantics)
        delattr(conv, "bias")
        conv.register_parameter("bias", None)
        if spectral:
            conv = tnn.utils.spectral_norm(conv)
        inner = tnn.Sequential(conv, tnn.InstanceNorm2d(nf, affine=False))
        mods[f"model{n}"] = tnn.Sequential(inner, tnn.LeakyReLU(0.2, False))
    mods[f"model{n_layers}"] = tnn.Sequential(tnn.Conv2d(nf, 1, 4, 1, 2))
    model = tnn.Module()
    for k, v in mods.items():
        model.add_module(k, v)

    def forward(x):
        results = [x]
        for _, sub in model.named_children():
            results.append(sub(results[-1]))
        return results

    model.forward = forward
    return model


def test_nlayer_discriminator_parity():
    tm = _t_nlayer(ndf=8, n_layers=4)
    tm.eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        _ = tm.forward(x)  # settle spectral u/v buffers? (eval: no update)
        feats_t = tm.forward(x)
    fm = NLayerDiscriminator(ndf=8, n_layers=4)
    variables = nlayer_params_from_torch(tm.state_dict(), n_layers=4)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    feats_j = fm.apply(variables, xj)
    assert len(feats_j) == len(feats_t)
    for ft, fj in zip(feats_t, feats_j):
        np.testing.assert_allclose(
            np.asarray(fj), ft.numpy().transpose(0, 2, 3, 1),
            atol=2e-4, rtol=1e-3)


def test_multiscale_discriminator_parity():
    tds = [_t_nlayer(ndf=8, n_layers=3) for _ in range(2)]
    for t in tds:
        t.eval()
    x = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        o0 = tds[0].forward(x)
        xd = torch.nn.functional.avg_pool2d(
            x, 3, 2, padding=[1, 1], count_include_pad=False)
        o1 = tds[1].forward(xd)
    sd = {}
    for i, t in enumerate(tds):
        for k, v in t.state_dict().items():
            sd[f"discriminator_{i}.{k}"] = v
    fm = MultiscaleDiscriminator(num_d=2, ndf=8, n_layers=3)
    variables = multiscale_params_from_torch(sd, num_d=2, n_layers=3)
    out = fm.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    for ref, got in ((o0, out[0]), (o1, out[1])):
        np.testing.assert_allclose(
            np.asarray(got[-1]), ref[-1].numpy().transpose(0, 2, 3, 1),
            atol=2e-4, rtol=1e-3)


def test_avg_pool_no_pad_count_matches_torch():
    x = torch.randn(2, 3, 9, 11)
    ref = torch.nn.functional.avg_pool2d(
        x, 3, 2, padding=[1, 1], count_include_pad=False).numpy()
    got = avg_pool_no_pad_count(jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), ref, atol=1e-6)


def test_spectral_conv_power_iteration_converges():
    m = SpectralConv(4, kernel_size=3, stride=1, padding=1, use_bias=False)
    x = jnp.ones((1, 8, 8, 2))
    variables = m.init(jax.random.PRNGKey(0), x)
    k = variables["params"]["kernel"]
    wmat = np.asarray(jnp.transpose(k, (3, 2, 0, 1)).reshape(4, -1))
    true_sigma = np.linalg.svd(wmat, compute_uv=False)[0]
    v = variables
    for _ in range(50):
        _, upd = m.apply(v, x, update_stats=True, mutable=["spectral"])
        v = {"params": v["params"], **upd}
    u = np.asarray(v["spectral"]["u"])
    vv = np.asarray(v["spectral"]["v"])
    est = float(u @ wmat @ vv)
    assert abs(est - true_sigma) / true_sigma < 1e-4


def test_image_discriminator_parity():
    from avi_talking_tpu.models.discriminator import (
        image_discriminator_params_from_torch,
    )

    n_layers, ndf = 3, 8
    seq = [tnn.Conv2d(3, ndf, 4, 2, 1), tnn.LeakyReLU(0.2, True)]
    mult_prev, mult = 1, 1
    for n in range(1, n_layers):
        mult_prev, mult = mult, min(2 ** n, 8)
        seq += [tnn.Conv2d(ndf * mult_prev, ndf * mult, 4, 2, 1, bias=False),
                tnn.BatchNorm2d(ndf * mult), tnn.LeakyReLU(0.2, True)]
    mult_prev, mult = mult, min(2 ** n_layers, 8)
    seq += [tnn.Conv2d(ndf * mult_prev, ndf * mult, 4, 1, 1, bias=False),
            tnn.BatchNorm2d(ndf * mult), tnn.LeakyReLU(0.2, True)]
    seq += [tnn.Conv2d(ndf * mult, 1, 4, 1, 1)]
    tm = tnn.Module()
    tm.model = tnn.Sequential(*seq)
    tm.eval()
    _randomize_bn_stats(tm)
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        ref = tm.model(x).numpy()
    fm = ImageDiscriminator(input_nc=3, ndf=ndf, n_layers=n_layers)
    variables = image_discriminator_params_from_torch(tm.state_dict(), n_layers)
    got = fm.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               atol=2e-4, rtol=1e-3)


def test_image_discriminator_shapes_and_patch_output():
    m = ImageDiscriminator(input_nc=3, ndf=4, n_layers=3)
    x = jnp.zeros((2, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert y.shape[0] == 2 and y.shape[-1] == 1
    assert y.shape[1] == y.shape[2] == 6  # 64 -> 32 -> 16 -> 8 -> 7 -> 6


def test_feature_discriminator():
    m = FeatureDiscriminator(num_labels=5)
    x = jnp.ones((3, 512))
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert y.shape == (3, 5)
    yt = m.apply(variables, x, rng=jax.random.PRNGKey(1), train=True)
    assert yt.shape == (3, 5)


def test_sync_batchnorm_axis_name_matches_full_batch():
    """The reference vendors SynchronizedBatchNorm2d for cross-GPU BN
    (architecture.py:62-63). The TPU-native equivalent is flax BatchNorm
    with ``axis_name`` — stats are psum'd over the mesh axis, so a sharded
    batch normalizes identically to the full batch on one device."""
    from flax import linen as fnn

    class Net(fnn.Module):
        sync: bool = False

        @fnn.compact
        def __call__(self, x):
            return fnn.BatchNorm(
                use_running_average=False, momentum=0.9, epsilon=1e-5,
                axis_name="dp" if self.sync else None, name="bn")(x)

    x = np.asarray(
        np.random.default_rng(3).normal(2.0, 3.0, (8, 4, 4, 6)), np.float32)
    ref_net = Net(sync=False)
    variables = ref_net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ref, _ = ref_net.apply(variables, jnp.asarray(x), mutable=["batch_stats"])

    sync_net = Net(sync=True)
    n_dev = min(jax.local_device_count(), 4)
    xs = jnp.asarray(x).reshape(n_dev, 8 // n_dev, 4, 4, 6)
    out = jax.pmap(
        lambda xi: sync_net.apply(variables, xi, mutable=["batch_stats"])[0],
        axis_name="dp")(xs)
    np.testing.assert_allclose(
        np.asarray(out).reshape(8, 4, 4, 6), np.asarray(ref),
        atol=1e-5, rtol=1e-5)


# --- GAN objectives -----------------------------------------------------------


def test_gan_losses_values():
    real = jnp.full((1, 4, 4, 1), 2.0)
    fake = jnp.full((1, 4, 4, 1), -3.0)
    # hinge: relu(1-2)=0, relu(1-3)=0 -> D loss 0; G loss = -mean(fake)=3
    assert float(gan_loss_d(real, fake, "hinge")) == 0.0
    assert float(gan_loss_g(fake, "hinge")) == 3.0
    # lsgan: (2-1)^2 + (-3)^2 = 10 ; G: (-3-1)^2 = 16
    np.testing.assert_allclose(float(gan_loss_d(real, fake, "lsgan")), 10.0)
    np.testing.assert_allclose(float(gan_loss_g(fake, "lsgan")), 16.0)


def test_feature_matching_and_multiscale_loss_shapes():
    key = jax.random.PRNGKey(0)
    m = MultiscaleDiscriminator(num_d=2, ndf=4, n_layers=3)
    x = jax.random.normal(key, (1, 32, 32, 3))
    variables = m.init(key, x)
    real_out = m.apply(variables, x)
    fake_out = m.apply(variables, x * 0.5)
    d = gan_loss_d(real_out, fake_out)
    g = gan_loss_g(fake_out)
    fmatch = feature_matching_loss(real_out, fake_out)
    for v in (d, g, fmatch):
        assert np.isfinite(float(v))
    assert float(feature_matching_loss(real_out, real_out)) == 0.0


@pytest.mark.slow
def test_discriminator_trains_to_separate():
    """One overfit sanity step: hinge D loss decreases under adam."""
    import optax

    key = jax.random.PRNGKey(0)
    m = NLayerDiscriminator(ndf=4, n_layers=3, get_features=False)
    real = jax.random.normal(key, (4, 32, 32, 3)) + 1.0
    fake = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3)) - 1.0
    variables = m.init(key, real)
    params, spectral = variables["params"], variables.get("spectral", {})
    opt = optax.adam(1e-3)
    state = opt.init(params)

    def loss_fn(p, spec):
        vs = {"params": p, "spectral": spec}
        r, upd = m.apply(vs, real, update_stats=True, mutable=["spectral"])
        f, upd = m.apply({"params": p, **upd}, fake, update_stats=True,
                         mutable=["spectral"])
        return gan_loss_d(r, f), upd["spectral"]

    (l0, spectral), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, spectral)
    for _ in range(20):
        (l, spectral), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, spectral)
        updates, state = opt.update(grads, state)
        params = optax.apply_updates(params, updates)
    assert float(l) < float(l0)
