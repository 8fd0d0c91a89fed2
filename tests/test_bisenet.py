"""BiSeNet face parsing: torch-oracle parity + FaceParser mask semantics.

Oracle re-implements the public face-parsing.PyTorch BiSeNet (the net the
reference wraps at inferno/models/external/BiSeNetFaceParsing.py) in torch
inside this file, per the repo convention."""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from avi_talking_tpu.models.bisenet import (
    DISCARDED_LABELS,
    BiSeNet,
    FaceParser,
    bisenet_params_from_torch,
    upsample_bilinear_ac,
)


class TConvBNReLU(tnn.Module):
    def __init__(self, cin, cout, ks=3, stride=1):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, ks, stride, ks // 2, bias=False)
        self.bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if cin != cout or stride != 1:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        h = F.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        res = x if self.downsample is None else self.downsample(x)
        return F.relu(h + res)


class TResnet18(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = tnn.Sequential(TBasicBlock(64, 64), TBasicBlock(64, 64))
        self.layer2 = tnn.Sequential(TBasicBlock(64, 128, 2),
                                     TBasicBlock(128, 128))
        self.layer3 = tnn.Sequential(TBasicBlock(128, 256, 2),
                                     TBasicBlock(256, 256))
        self.layer4 = tnn.Sequential(TBasicBlock(256, 512, 2),
                                     TBasicBlock(512, 512))

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        feat8 = self.layer2(x)
        feat16 = self.layer3(feat8)
        feat32 = self.layer4(feat16)
        return feat8, feat16, feat32


class TARM(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = TConvBNReLU(cin, cout, 3)
        self.conv_atten = tnn.Conv2d(cout, cout, 1, bias=False)
        self.bn_atten = tnn.BatchNorm2d(cout)

    def forward(self, x):
        feat = self.conv(x)
        atten = F.avg_pool2d(feat, feat.shape[2:])
        atten = torch.sigmoid(self.bn_atten(self.conv_atten(atten)))
        return feat * atten


class TFFM(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.convblk = TConvBNReLU(cin, cout, 1)
        self.conv1 = tnn.Conv2d(cout, cout // 4, 1, bias=False)
        self.conv2 = tnn.Conv2d(cout // 4, cout, 1, bias=False)

    def forward(self, fsp, fcp):
        feat = self.convblk(torch.cat([fsp, fcp], dim=1))
        atten = F.avg_pool2d(feat, feat.shape[2:])
        atten = torch.sigmoid(self.conv2(F.relu(self.conv1(atten))))
        return feat * atten + feat


class TOut(tnn.Module):
    def __init__(self, cin, mid, ncls):
        super().__init__()
        self.conv = TConvBNReLU(cin, mid, 3)
        self.conv_out = tnn.Conv2d(mid, ncls, 1, bias=False)

    def forward(self, x):
        return self.conv_out(self.conv(x))


class TContextPath(tnn.Module):
    def __init__(self):
        super().__init__()
        self.resnet = TResnet18()
        self.arm16 = TARM(256, 128)
        self.arm32 = TARM(512, 128)
        self.conv_head32 = TConvBNReLU(128, 128, 3)
        self.conv_head16 = TConvBNReLU(128, 128, 3)
        self.conv_avg = TConvBNReLU(512, 128, 1)

    def forward(self, x):
        feat8, feat16, feat32 = self.resnet(x)
        avg = F.avg_pool2d(feat32, feat32.shape[2:])
        avg = self.conv_avg(avg)
        avg_up = F.interpolate(avg, feat32.shape[2:], mode="nearest")
        f32 = self.arm32(feat32) + avg_up
        f32_up = self.conv_head32(
            F.interpolate(f32, feat16.shape[2:], mode="nearest"))
        f16 = self.arm16(feat16) + f32_up
        f16_up = self.conv_head16(
            F.interpolate(f16, feat8.shape[2:], mode="nearest"))
        return feat8, f16_up


class TBiSeNet(tnn.Module):
    def __init__(self, n_classes=19):
        super().__init__()
        self.cp = TContextPath()
        self.ffm = TFFM(256, 256)
        self.conv_out = TOut(256, 256, n_classes)

    def forward(self, x):
        H, W = x.shape[2:]
        feat_res8, feat_cp8 = self.cp(x)
        fuse = self.ffm(feat_res8, feat_cp8)
        out = self.conv_out(fuse)
        return F.interpolate(out, (H, W), mode="bilinear",
                             align_corners=True)


def _rand_init(m, gen):
    for p in m.parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.1)
    for mod in m.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            with torch.no_grad():
                mod.running_mean.copy_(
                    torch.randn(mod.running_mean.shape, generator=gen) * 0.1)
                mod.running_var.copy_(
                    torch.rand(mod.running_var.shape, generator=gen) + 0.5)
    return m


def test_bisenet_torch_parity():
    gen = torch.Generator().manual_seed(0)
    oracle = _rand_init(TBiSeNet(), gen).eval()
    variables = bisenet_params_from_torch(oracle.state_dict())
    x = torch.rand((1, 3, 64, 64), generator=gen)
    with torch.no_grad():
        ref = oracle(x).permute(0, 2, 3, 1).numpy()
    ours = np.asarray(BiSeNet().apply(
        variables, jnp.asarray(x.permute(0, 2, 3, 1).numpy())))
    assert ours.shape == ref.shape == (1, 64, 64, 19)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_upsample_bilinear_ac_matches_torch():
    gen = torch.Generator().manual_seed(1)
    x = torch.randn((2, 5, 4, 6), generator=gen)  # NCHW
    ref = F.interpolate(x, (13, 9), mode="bilinear",
                        align_corners=True).permute(0, 2, 3, 1).numpy()
    ours = np.asarray(upsample_bilinear_ac(
        jnp.asarray(x.permute(0, 2, 3, 1).numpy()), 13, 9))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_preprocess_masks_feed_train_emoca(tmp_path):
    """preprocess-mead --parse-faces writes masks/ per clip; train-emoca
    consumes them as photometric batch masks (useSeg path)."""
    from avi_talking_tpu.cli import main
    from avi_talking_tpu.viz.pngio import read_image_normalized, write_png

    rng = np.random.default_rng(3)
    src = tmp_path / "src" / "clipM"
    src.mkdir(parents=True)
    for t in range(3):
        write_png(str(src / f"{t:03d}.png"),
                  (rng.uniform(0, 1, (32, 32, 3)) * 255).astype(np.uint8))
    out = tmp_path / "out"
    rc = main(["preprocess-mead", "--src", str(tmp_path / "src"),
               "--out", str(out), "--tiny", "--size", "32", "--max-b", "4",
               "--fan-detect", "--parse-faces"])
    assert rc == 0
    clip = out / "clipM"
    m0 = read_image_normalized(str(clip / "masks" / "00000_000.png"))
    assert m0.shape == (32, 32, 3)
    assert set(np.unique((m0[..., 0] * 0.5 + 0.5).round(2))) <= {0.0, 1.0}
    rc2 = main(["train-emoca", "--tiny", "--size", "32", "--batch-size", "2",
                "--steps", "1", "--log-every", "0", "--root", str(clip)])
    assert rc2 == 0


def test_face_parser_mask_semantics():
    """Mask = complement of the discarded labels (IO.py:255-278), resized
    back to the input resolution; chunked == one-shot."""
    net = BiSeNet()
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    rng = np.random.default_rng(2)
    frames = rng.uniform(0, 1, (3, 40, 40, 3)).astype(np.float32)
    p2 = FaceParser(v, size=32, max_b=2)
    p3 = FaceParser(v, size=32, max_b=3)
    seg2, mask2 = p2(frames)
    seg3, mask3 = p3(frames)
    np.testing.assert_array_equal(seg2, seg3)
    assert seg2.shape == (3, 40, 40) and mask2.shape == (3, 40, 40)
    assert seg2.dtype == np.uint8 and seg2.max() < 19
    expected = np.logical_not(
        np.isin(seg2, np.asarray(DISCARDED_LABELS))).astype(np.float32)
    np.testing.assert_array_equal(mask2, expected)
