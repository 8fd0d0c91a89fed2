"""PIRender components: shape/jit tests + torch-parity for the tricky ops."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as TF

from avi_talking_tpu.models.pirender import (
    FaceGenerator,
    MappingNet,
    PIRenderConfig,
    convert_flow_to_deformation,
    grid_sample_bilinear,
)


def test_grid_sample_matches_torch():
    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 8, 10, 3)).astype(np.float32)
    grid = rng.uniform(-1.2, 1.2, (2, 6, 7, 2)).astype(np.float32)
    ref = TF.grid_sample(
        torch.from_numpy(img.transpose(0, 3, 1, 2)), torch.from_numpy(grid),
        mode="bilinear", padding_mode="zeros", align_corners=False,
    ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(grid_sample_bilinear(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_flow_to_deformation_matches_torch():
    rng = np.random.default_rng(1)
    flow = rng.standard_normal((1, 5, 6, 2)).astype(np.float32) * 3
    # torch reference math (flow in NCHW, channel 0 = x)
    tf = torch.from_numpy(flow.transpose(0, 3, 1, 2))
    b, c, h, w = tf.shape
    flow_norm = 2 * torch.cat([tf[:, :1] / (w - 1), tf[:, 1:] / (h - 1)], 1)
    xs = 2 * (torch.arange(w) / (w - 1)) - 1
    ys = 2 * (torch.arange(h) / (h - 1)) - 1
    grid = torch.stack(
        [xs.view(1, -1).repeat(h, 1), ys.view(-1, 1).repeat(1, w)], dim=2
    )[None]
    ref = (grid + flow_norm.permute(0, 2, 3, 1)).numpy()
    got = np.asarray(convert_flow_to_deformation(jnp.asarray(flow)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_mapping_net_matches_torch_oracle():
    # reconstruct the reference MappingNet in torch (face_model.py:40-64)
    cfg = PIRenderConfig(coeff_nc=9, descriptor_nc=16, mapping_layers=2)
    torch.manual_seed(0)
    first = torch.nn.Conv1d(9, 16, 7, padding=0)
    enc0 = torch.nn.Conv1d(16, 16, 3, padding=0, dilation=3)
    enc1 = torch.nn.Conv1d(16, 16, 3, padding=0, dilation=3)

    x = torch.randn(2, 9, 27)
    with torch.no_grad():
        out = first(x)
        for enc in (enc0, enc1):
            out = enc(TF.leaky_relu(out, 0.1)) + out[:, :, 3:-3]
        ref = out.mean(dim=2).numpy()  # adaptive avg pool to 1

    model = MappingNet(cfg)
    params = {
        "params": {
            "first": {"kernel": first.weight.detach().numpy().transpose(2, 1, 0),
                      "bias": first.bias.detach().numpy()},
            "encoder0": {"kernel": enc0.weight.detach().numpy().transpose(2, 1, 0),
                         "bias": enc0.bias.detach().numpy()},
            "encoder1": {"kernel": enc1.weight.detach().numpy().transpose(2, 1, 0),
                         "bias": enc1.bias.detach().numpy()},
        }
    }
    got = np.asarray(model.apply(params, x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_face_generator_end_to_end_tiny():
    cfg = PIRenderConfig.tiny()
    gen = FaceGenerator(cfg)
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32))
    coeffs = jnp.asarray(rng.standard_normal((1, 27, cfg.coeff_nc)).astype(np.float32))
    params = gen.init(jax.random.PRNGKey(0), img, coeffs)
    out = jax.jit(lambda p, i, c: gen.apply(p, i, c))(params, img, coeffs)
    assert out["fake_image"].shape == (1, 16, 16, 3)
    assert out["warp_image"].shape == (1, 16, 16, 3)
    # flow is predicted at the hourglass output resolution (enc 3x / dec 2x
    # of 32 -> 16); the deformation is upsampled to image size for warping
    assert out["flow_field"].shape == (1, 8, 8, 2)
    assert out["deformation"].shape == (1, 16, 16, 2)
    assert np.abs(np.asarray(out["fake_image"])).max() <= 1.0
    # warp-only stage skips the editing net
    out_warp = gen.apply(params, img, coeffs, stage="warp")
    assert "fake_image" not in out_warp


def test_conv_transpose2d_mapping():
    """flax ConvTranspose(((1,2),(1,2)), transpose_kernel) == torch
    ConvTranspose2d(k3,s2,p1,op1)."""
    import flax.linen as fnn

    torch.manual_seed(1)
    tconv = torch.nn.ConvTranspose2d(4, 6, 3, stride=2, padding=1, output_padding=1)
    x = torch.randn(2, 4, 7, 9)
    with torch.no_grad():
        ref = tconv(x).numpy().transpose(0, 2, 3, 1)
    conv = fnn.ConvTranspose(6, (3, 3), strides=(2, 2),
                             padding=((1, 2), (1, 2)), transpose_kernel=True)
    params = {"params": {
        "kernel": tconv.weight.detach().numpy().transpose(2, 3, 1, 0),
        "bias": tconv.bias.detach().numpy(),
    }}
    got = np.asarray(conv.apply(params, x.numpy().transpose(0, 2, 3, 1)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_pirender_trainer_two_stages():
    import jax.numpy as jnp
    import optax

    from avi_talking_tpu.models.pirender import FaceGenerator, PIRenderConfig
    from avi_talking_tpu.train.perceptual import PerceptualLoss, Vgg19Features
    from avi_talking_tpu.train.pirender_trainer import (
        PIRenderTrainer,
        make_pirender_optimizer,
    )

    cfg = PIRenderConfig.tiny()
    gen = FaceGenerator(cfg)
    rng = np.random.default_rng(3)
    batch = {
        "input_image": jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32)),
        "coeff_window": jnp.asarray(rng.standard_normal((1, 27, cfg.coeff_nc)).astype(np.float32)),
        "target_image": jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32)),
    }
    params = gen.init(jax.random.PRNGKey(0), batch["input_image"], batch["coeff_window"])
    vgg = Vgg19Features(taps=("relu_1_1", "relu_2_1"))
    vgg_params = vgg.init(jax.random.PRNGKey(1), batch["input_image"])["params"]
    tx = make_pirender_optimizer(1e-4)
    trainer = PIRenderTrainer(
        generator=gen, tx=tx,
        perceptual_warp=PerceptualLoss(vgg, layers=("relu_1_1", "relu_2_1"),
                                       num_scales=1),
        perceptual_final=PerceptualLoss(vgg, layers=("relu_1_1", "relu_2_1"),
                                        num_scales=1, use_style_loss=True),
        vgg_params=vgg_params,
    )
    step = trainer.jitted_train_step()
    opt = tx.init(params)
    p, opt, m_warp = step(params, opt, batch, True)
    assert "perceptual_final" not in m_warp
    p, opt, m_full = step(p, opt, batch, False)
    assert {"perceptual_warp", "perceptual_final", "loss"} <= set(m_full)
    assert np.isfinite(float(m_full["loss"]))


@pytest.mark.slow
def test_pirender_render_loss_composition():
    """Full stage-1 render-loss path: coeff -> descriptor window -> PIRender
    -> upper-face-masked perceptual losses."""
    import jax.numpy as jnp

    from avi_talking_tpu.train.perceptual import PerceptualLoss, Vgg19Features
    from avi_talking_tpu.train.render_loss import (
        PIRenderRenderLoss,
        obtain_seq_index,
        upper_face_mask_like,
    )

    # window indices clamp at the edges like the reference
    idx = np.asarray(obtain_seq_index(jnp.asarray(0), 20))
    assert idx[0] == 0 and idx[-1] == 13 and len(idx) == 27
    idx2 = np.asarray(obtain_seq_index(jnp.asarray(19), 20))
    assert idx2[-1] == 19 and idx2[0] == 6

    m = np.asarray(upper_face_mask_like(jnp.zeros((4, 4, 3))))
    assert m[0].max() == 1 and m[3].max() == 0  # lower half zeroed

    cfg = PIRenderConfig.tiny()  # coeff_nc 9 == [exp6 | rot3... ] adapt below
    gen = FaceGenerator(cfg)
    rng = np.random.default_rng(6)
    B, T, H = 1, 8, 16
    img = jnp.asarray(rng.uniform(-1, 1, (B, H, H, 3)).astype(np.float32))
    win = jnp.asarray(rng.standard_normal((B, 27, cfg.coeff_nc)).astype(np.float32))
    gparams = gen.init(jax.random.PRNGKey(0), img, win)
    vgg = Vgg19Features(taps=("relu_1_1",))
    vparams = vgg.init(jax.random.PRNGKey(1), img)["params"]

    # pred coeff dim 9 -> descriptor = exp(6-3=3? no: d-3 exp + jaw3) + rot3
    # + cam3 = 9+... match coeff_nc by using pred dim 3: exp0 is empty; use
    # pred with d=3 (jaw only) -> descriptor dim 0+3+3+3 == 9 == coeff_nc
    pred = jnp.asarray(rng.standard_normal((B, T, 3)).astype(np.float32))
    batch = {
        "pose": jnp.asarray(rng.standard_normal((B, T, 6)).astype(np.float32)),
        "cam": jnp.asarray(rng.standard_normal((B, T, 3)).astype(np.float32)),
        "images": jnp.asarray(rng.uniform(-1, 1, (B, T, H, H, 3)).astype(np.float32)),
        "ref_images": jnp.asarray(rng.uniform(-1, 1, (B, T, H, H, 3)).astype(np.float32)),
    }
    loss_fn = PIRenderRenderLoss(
        generator=gen, generator_params=gparams,
        perceptual_warp=PerceptualLoss(vgg, layers=("relu_1_1",), num_scales=1),
        perceptual_final=PerceptualLoss(vgg, layers=("relu_1_1",), num_scales=1),
        vgg_params=vparams,
        coeff_mean=jnp.zeros(3), coeff_std=jnp.ones(3), n_samples=2,
    )
    loss = loss_fn(pred, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss)) and float(loss) > 0
    # differentiable w.r.t. predicted coefficients
    g = jax.grad(lambda p: loss_fn(p, batch, jax.random.PRNGKey(2)))(pred)
    assert np.abs(np.asarray(g)).sum() > 0


@pytest.mark.slow
def test_pirender_render_emo_loss():
    """--emo-loss path: EmoNet feature distance on the PIRender fake_image
    rides the same generator forward and the loss returns a term dict
    (faceformer.py:440-470)."""
    import jax.numpy as jnp

    from avi_talking_tpu.models.emoca import EmoNetLoss, EmotionRecognitionModule
    from avi_talking_tpu.train.perceptual import PerceptualLoss, Vgg19Features
    from avi_talking_tpu.train.render_loss import PIRenderRenderLoss

    cfg = PIRenderConfig.tiny()
    gen = FaceGenerator(cfg)
    rng = np.random.default_rng(7)
    B, T, H = 1, 6, 16
    img = jnp.asarray(rng.uniform(-1, 1, (B, H, H, 3)).astype(np.float32))
    win = jnp.asarray(
        rng.standard_normal((B, 27, cfg.coeff_nc)).astype(np.float32))
    gparams = gen.init(jax.random.PRNGKey(0), img, win)
    vgg = Vgg19Features(taps=("relu_1_1",))
    vparams = vgg.init(jax.random.PRNGKey(1), img)["params"]
    emo_mod = EmotionRecognitionModule(n_expression=8)
    emo_vars = emo_mod.init(jax.random.PRNGKey(2), jnp.zeros((1, H, H, 3)))

    pred = jnp.asarray(rng.standard_normal((B, T, 3)).astype(np.float32))
    batch = {
        "pose": jnp.asarray(rng.standard_normal((B, T, 6)).astype(np.float32)),
        "cam": jnp.asarray(rng.standard_normal((B, T, 3)).astype(np.float32)),
        "images": jnp.asarray(
            rng.uniform(-1, 1, (B, T, H, H, 3)).astype(np.float32)),
        "ref_images": jnp.asarray(
            rng.uniform(-1, 1, (B, T, H, H, 3)).astype(np.float32)),
    }
    loss_fn = PIRenderRenderLoss(
        generator=gen, generator_params=gparams,
        perceptual_warp=PerceptualLoss(vgg, layers=("relu_1_1",), num_scales=1),
        perceptual_final=PerceptualLoss(vgg, layers=("relu_1_1",), num_scales=1),
        vgg_params=vparams,
        coeff_mean=jnp.zeros(3), coeff_std=jnp.ones(3), n_samples=1,
        emonet=EmoNetLoss(emo_mod), emonet_vars=emo_vars,
    )
    out = loss_fn(pred, batch, jax.random.PRNGKey(3))
    assert set(out) == {"render", "emo"}
    assert np.isfinite(float(out["render"])) and np.isfinite(float(out["emo"]))
    assert float(out["emo"]) > 0
    # the emo term is differentiable w.r.t. the predicted coefficients
    g = jax.grad(
        lambda p: loss_fn(p, batch, jax.random.PRNGKey(3))["emo"])(pred)
    assert np.abs(np.asarray(g)).sum() > 0


def _build_torch_facegen(cfg):
    """Published PIRender FaceGenerator re-implemented in torch (use_spect
    off, LeakyReLU(0.1), LayerNorm2d norms) for importer parity."""
    act = torch.nn.LeakyReLU(0.1)

    class TLN2d(torch.nn.Module):
        def __init__(self, c):
            super().__init__()
            self.weight = torch.nn.Parameter(torch.rand(c, 1, 1) + 0.5)
            self.bias = torch.nn.Parameter(torch.randn(c, 1, 1) * 0.1)

        def forward(self, x):
            shape = x.size()[1:]
            return torch.nn.functional.layer_norm(
                x, shape, self.weight.expand(shape), self.bias.expand(shape))

    class TAdain(torch.nn.Module):
        def __init__(self, nc, feat):
            super().__init__()
            self.param_free_norm = torch.nn.InstanceNorm2d(nc, affine=False)
            self.mlp_shared = torch.nn.Sequential(
                torch.nn.Linear(feat, 128), torch.nn.ReLU())
            self.mlp_gamma = torch.nn.Linear(128, nc)
            self.mlp_beta = torch.nn.Linear(128, nc)

        def forward(self, x, z):
            n = self.param_free_norm(x)
            h = self.mlp_shared(z.view(z.size(0), -1))
            g = self.mlp_gamma(h).view(z.size(0), -1, 1, 1)
            b = self.mlp_beta(h).view(z.size(0), -1, 1, 1)
            return n * (1 + g) + b

    class TMapping(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.layer = cfg.mapping_layers
            self.first = torch.nn.Sequential(
                torch.nn.Conv1d(cfg.coeff_nc, cfg.descriptor_nc, 7, padding=0))
            for i in range(cfg.mapping_layers):
                setattr(self, f"encoder{i}", torch.nn.Sequential(
                    act, torch.nn.Conv1d(cfg.descriptor_nc, cfg.descriptor_nc,
                                         3, padding=0, dilation=3)))
            self.pooling = torch.nn.AdaptiveAvgPool1d(1)

        def forward(self, x):
            out = self.first(x)
            for i in range(self.layer):
                out = getattr(self, f"encoder{i}")(out) + out[:, :, 3:-3]
            return self.pooling(out)

    class TEncBlock(torch.nn.Module):
        def __init__(self, i_nc, o_nc):
            super().__init__()
            self.conv_0 = torch.nn.Conv2d(i_nc, o_nc, 4, 2, 1)
            self.conv_1 = torch.nn.Conv2d(o_nc, o_nc, 3, 1, 1)
            self.norm_0 = TAdain(i_nc, cfg.descriptor_nc)
            self.norm_1 = TAdain(o_nc, cfg.descriptor_nc)

        def forward(self, x, z):
            x = self.conv_0(act(self.norm_0(x, z)))
            return self.conv_1(act(self.norm_1(x, z)))

    class TDecBlock(torch.nn.Module):
        def __init__(self, i_nc, o_nc):
            super().__init__()
            self.conv_0 = torch.nn.Conv2d(i_nc, o_nc, 3, 1, 1)
            self.conv_1 = torch.nn.ConvTranspose2d(o_nc, o_nc, 3, 2, 1, 1)
            self.conv_s = torch.nn.ConvTranspose2d(i_nc, o_nc, 3, 2, 1, 1)
            self.norm_0 = TAdain(i_nc, cfg.descriptor_nc)
            self.norm_1 = TAdain(o_nc, cfg.descriptor_nc)
            self.norm_s = TAdain(i_nc, cfg.descriptor_nc)

        def forward(self, x, z):
            xs = self.conv_s(act(self.norm_s(x, z)))
            dx = self.conv_0(act(self.norm_0(x, z)))
            dx = self.conv_1(act(self.norm_1(dx, z)))
            return xs + dx

    ngf, img_f = cfg.base_nc_warp, cfg.max_nc

    class TEncoder(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.input_layer = torch.nn.Conv2d(cfg.image_nc, ngf, 7, 1, 3)
            for i in range(cfg.encoder_layers):
                setattr(self, f"encoder{i}", TEncBlock(
                    min(ngf * 2 ** i, img_f), min(ngf * 2 ** (i + 1), img_f)))

        def forward(self, x, z):
            out = self.input_layer(x)
            outs = [out]
            for i in range(cfg.encoder_layers):
                out = getattr(self, f"encoder{i}")(out, z)
                outs.append(out)
            return outs

    class TDecoder(torch.nn.Module):
        def __init__(self):
            super().__init__()
            for i in list(range(cfg.encoder_layers - cfg.decoder_layers,
                                cfg.encoder_layers))[::-1]:
                i_nc = min(ngf * 2 ** (i + 1), img_f)
                i_nc = i_nc * 2 if i != cfg.encoder_layers - 1 else i_nc
                setattr(self, f"decoder{i}",
                        TDecBlock(i_nc, min(ngf * 2 ** i, img_f)))

        def forward(self, xs, z):
            out = xs.pop()
            for i in list(range(cfg.encoder_layers - cfg.decoder_layers,
                                cfg.encoder_layers))[::-1]:
                out = getattr(self, f"decoder{i}")(out, z)
                out = torch.cat([out, xs.pop()], 1)
            return out

    class THourglass(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = TEncoder()
            self.decoder = TDecoder()

        def forward(self, x, z):
            return self.decoder(self.encoder(x, z), z)

    class TWarp(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.hourglass = THourglass()
            out_nc = min(ngf * 2 ** (cfg.encoder_layers - cfg.decoder_layers),
                         img_f) * 2
            self.flow_out = torch.nn.Sequential(
                TLN2d(out_nc), act, torch.nn.Conv2d(out_nc, 2, 7, 1, 3))

        def forward(self, image, z):
            h = self.hourglass(image, z)
            flow = self.flow_out(h)
            b, c, fh, fw = flow.shape
            norm = 2 * torch.cat([flow[:, :1] / (fw - 1),
                                  flow[:, 1:] / (fh - 1)], 1)
            xg = 2 * torch.arange(fw) / (fw - 1) - 1
            yg = 2 * torch.arange(fh) / (fh - 1) - 1
            grid = torch.stack([xg.view(1, -1).repeat(fh, 1),
                                yg.view(-1, 1).repeat(1, fw)], 2)
            deform = grid[None] + norm.permute(0, 2, 3, 1)
            if (fh, fw) != image.shape[2:]:
                deform = torch.nn.functional.interpolate(
                    deform.permute(0, 3, 1, 2), size=image.shape[2:],
                    mode="bilinear").permute(0, 2, 3, 1)
            warped = torch.nn.functional.grid_sample(
                image, deform, align_corners=False)
            return {"flow_field": flow, "warp_image": warped}

    egf = cfg.base_nc_edit

    class TFineRes(torch.nn.Module):
        def __init__(self, nc):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(nc, nc, 3, 1, 1)
            self.conv2 = torch.nn.Conv2d(nc, nc, 3, 1, 1)
            self.norm1 = TAdain(nc, cfg.descriptor_nc)
            self.norm2 = TAdain(nc, cfg.descriptor_nc)

        def forward(self, x, z):
            dx = act(self.norm1(self.conv1(x), z))
            dx = self.norm2(self.conv2(x), z)
            return dx + x

    def seq_conv_ln(i_nc, o_nc, k, p, pool=False):
        mods = [torch.nn.Conv2d(i_nc, o_nc, k, 1, p), TLN2d(o_nc), act]
        if pool:
            mods.append(torch.nn.AvgPool2d((2, 2)))
        return torch.nn.Sequential(*mods)

    class TEdit(torch.nn.Module):
        def __init__(self):
            super().__init__()
            L = cfg.editing_layers
            enc = torch.nn.Module()
            enc.first = torch.nn.Module()
            enc.first.model = seq_conv_ln(cfg.image_nc * 2, egf, 7, 3)
            for i in range(L):
                d = torch.nn.Module()
                d.model = seq_conv_ln(min(egf * 2 ** i, img_f),
                                      min(egf * 2 ** (i + 1), img_f), 3, 1,
                                      pool=True)
                setattr(enc, f"down{i}", d)
            self.encoder = enc
            dec = torch.nn.Module()
            for i in range(L):
                i_nc = min(egf * 2 ** (i + 1), img_f)
                o_nc = min(egf * 2 ** i, img_f)
                u = torch.nn.Module()
                u.model = seq_conv_ln(i_nc, o_nc, 3, 1)
                setattr(dec, f"up{i}", u)
                r = torch.nn.Module()
                for j in range(cfg.num_res_blocks):
                    setattr(r, f"res{j}", TFineRes(i_nc))
                setattr(dec, f"res{i}", r)
                jm = torch.nn.Module()
                jm.model = seq_conv_ln(o_nc, o_nc, 3, 1)
                setattr(dec, f"jump{i}", jm)
            fin = torch.nn.Module()
            fin.model = torch.nn.Sequential(
                torch.nn.Conv2d(egf, cfg.image_nc, 7, 1, 3), torch.nn.Tanh())
            dec.final = fin
            self.decoder = dec
            self.L = L

        def forward(self, inp, warp, z):
            x = torch.cat([inp, warp], 1)
            x = self.encoder.first.model(x)
            outs = [x]
            for i in range(self.L):
                x = getattr(self.encoder, f"down{i}").model(x)
                outs.append(x)
            out = outs.pop()
            for i in list(range(self.L))[::-1]:
                r = getattr(self.decoder, f"res{i}")
                for j in range(cfg.num_res_blocks):
                    out = getattr(r, f"res{j}")(out, z)
                out = getattr(self.decoder, f"up{i}").model(
                    torch.nn.functional.interpolate(out, scale_factor=2))
                out = getattr(self.decoder, f"jump{i}").model(outs.pop()) + out
            return self.decoder.final.model(out)

    class TFaceGen(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.mapping_net = TMapping()
            self.warpping_net = TWarp()
            self.editing_net = TEdit()

        def forward(self, image, coeff):
            z = self.mapping_net(coeff)
            out = self.warpping_net(image, z)
            out["fake_image"] = self.editing_net(
                image, out["warp_image"], z)
            return out

    return TFaceGen()


@pytest.mark.slow
def test_facegenerator_full_torch_import_parity():
    """pirender_params_from_torch maps a published-layout net_G state dict
    onto our FaceGenerator bit-compatibly (flow, warp and fake image)."""
    from avi_talking_tpu.models.pirender import (
        FaceGenerator,
        PIRenderConfig,
        pirender_params_from_torch,
    )

    torch.manual_seed(0)
    cfg = PIRenderConfig.tiny()
    tm = _build_torch_facegen(cfg).eval()
    B, H = 2, 64
    img = torch.randn(B, 3, H, H) * 0.3
    coeff = torch.randn(B, cfg.coeff_nc, 27)
    with torch.no_grad():
        ref = tm(img, coeff)

    fm = FaceGenerator(cfg)
    variables = pirender_params_from_torch(tm.state_dict(), cfg)
    out = fm.apply(variables, jnp.asarray(img.numpy().transpose(0, 2, 3, 1)),
                   jnp.asarray(coeff.numpy().transpose(0, 2, 1)))
    for key, tref in (("flow_field", ref["flow_field"]),
                      ("warp_image", ref["warp_image"]),
                      ("fake_image", ref["fake_image"])):
        np.testing.assert_allclose(
            np.asarray(out[key]), tref.numpy().transpose(0, 2, 3, 1),
            atol=5e-4, rtol=1e-3, err_msg=key)


@pytest.mark.slow
def test_pirender_trainer_adversarial_stage():
    """Optional GAN term (the reference BaseTrainer's net_D interface):
    G sees hinge + feature-matching, D trains on stop-grad fakes."""
    import jax.numpy as jnp
    import optax

    from avi_talking_tpu.models.discriminator import MultiscaleDiscriminator
    from avi_talking_tpu.models.pirender import FaceGenerator, PIRenderConfig
    from avi_talking_tpu.train.perceptual import PerceptualLoss, Vgg19Features
    from avi_talking_tpu.train.pirender_trainer import (
        PIRenderTrainer,
        make_pirender_optimizer,
    )

    cfg = PIRenderConfig.tiny()
    gen = FaceGenerator(cfg)
    rng = np.random.default_rng(4)
    batch = {
        "input_image": jnp.asarray(
            rng.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32)),
        "coeff_window": jnp.asarray(
            rng.standard_normal((1, 27, cfg.coeff_nc)).astype(np.float32)),
        "target_image": jnp.asarray(
            rng.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32)),
    }
    params = gen.init(jax.random.PRNGKey(0), batch["input_image"],
                      batch["coeff_window"])
    vgg = Vgg19Features(taps=("relu_1_1",))
    vgg_params = vgg.init(jax.random.PRNGKey(1), batch["input_image"])["params"]
    disc = MultiscaleDiscriminator(num_d=1, ndf=4, n_layers=2, norm="none")
    d_params = disc.init(jax.random.PRNGKey(2), batch["target_image"])
    tx, tx_d = make_pirender_optimizer(1e-4), optax.adam(1e-4)
    trainer = PIRenderTrainer(
        generator=gen, tx=tx,
        perceptual_warp=PerceptualLoss(vgg, layers=("relu_1_1",), num_scales=1),
        perceptual_final=PerceptualLoss(vgg, layers=("relu_1_1",),
                                        num_scales=1, use_style_loss=True),
        vgg_params=vgg_params,
        discriminator=disc, tx_d=tx_d,
    )
    step = trainer.jitted_train_step()
    d_step = trainer.jitted_d_train_step()
    opt, d_opt = tx.init(params), tx_d.init(d_params)
    p, opt, m = step(params, opt, batch, False, d_params)
    assert {"gan_g", "feature_matching"} <= set(m)
    assert np.isfinite(float(m["loss"]))
    d_params2, d_opt, d_loss0 = d_step(d_params, d_opt, p, batch)
    for _ in range(5):
        d_params2, d_opt, d_loss = d_step(d_params2, d_opt, p, batch)
    assert float(d_loss) < float(d_loss0)  # D learns on a fixed G
    # without d_params the step is the plain perceptual objective
    _, _, m_plain = step(params, tx.init(params), batch, False)
    assert "gan_g" not in m_plain
