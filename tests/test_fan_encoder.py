"""FanEncoder parity vs a torch oracle of the published FAN/PD-FGC layout."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as TF

import jax.numpy as jnp

from avi_talking_tpu.models.fan_encoder import (
    FanEncoder,
    fan_encoder_params_from_torch,
    mask_lip,
)


# ---- torch oracle (public FAN architecture, written from its definition) ---


class TConvBlock(tnn.Module):
    def __init__(self, inp, outp):
        super().__init__()
        self.bn1 = tnn.BatchNorm2d(inp)
        self.conv1 = tnn.Conv2d(inp, outp // 2, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(outp // 2)
        self.conv2 = tnn.Conv2d(outp // 2, outp // 4, 3, 1, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(outp // 4)
        self.conv3 = tnn.Conv2d(outp // 4, outp // 4, 3, 1, 1, bias=False)
        self.downsample = (
            tnn.Sequential(
                tnn.BatchNorm2d(inp), tnn.ReLU(True),
                tnn.Conv2d(inp, outp, 1, 1, bias=False),
            )
            if inp != outp
            else None
        )

    def forward(self, x):
        o1 = self.conv1(TF.relu(self.bn1(x), True))
        o2 = self.conv2(TF.relu(self.bn2(o1), True))
        o3 = self.conv3(TF.relu(self.bn3(o2), True))
        out = torch.cat([o1, o2, o3], 1)
        res = self.downsample(x) if self.downsample is not None else x
        return out + res


class THourGlass(tnn.Module):
    def __init__(self, depth=4, f=256):
        super().__init__()
        self.depth = depth
        for lvl in range(1, depth + 1):
            self.add_module(f"b1_{lvl}", TConvBlock(f, f))
            self.add_module(f"b2_{lvl}", TConvBlock(f, f))
            self.add_module(f"b3_{lvl}", TConvBlock(f, f))
        self.add_module("b2_plus_1", TConvBlock(f, f))

    def _fwd(self, lvl, x):
        up1 = self._modules[f"b1_{lvl}"](x)
        low1 = TF.max_pool2d(x, 2, stride=2)
        low1 = self._modules[f"b2_{lvl}"](low1)
        low2 = self._fwd(lvl - 1, low1) if lvl > 1 else self._modules["b2_plus_1"](low1)
        low3 = self._modules[f"b3_{lvl}"](low2)
        up2 = TF.interpolate(low3, size=up1.shape[2:], mode="bilinear",
                             align_corners=False)
        return up1 + up2

    def forward(self, x):
        return self._fwd(self.depth, x)


class TFanUse(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3)
        self.bn1 = tnn.BatchNorm2d(64)
        self.conv2 = TConvBlock(64, 128)
        self.conv3 = TConvBlock(128, 128)
        self.conv4 = TConvBlock(128, 256)
        self.m0 = THourGlass()
        self.top_m_0 = TConvBlock(256, 256)
        self.conv_last0 = tnn.Conv2d(256, 256, 1)
        self.l0 = tnn.Conv2d(256, 68, 1)
        self.bn_end0 = tnn.BatchNorm2d(256)
        self.conv6 = tnn.Conv2d(68, 1, 3, 2, 1)
        self.fc = tnn.Linear(28 * 28, 512)
        self.bn5 = tnn.BatchNorm2d(68)

    def forward(self, x):
        x = TF.relu(self.bn1(self.conv1(x)), True)
        x = TF.max_pool2d(self.conv2(x), 2)
        x = self.conv3(x)
        x = self.conv4(x)
        hg = self.m0(x)
        ll = self.top_m_0(hg)
        ll = self.bn_end0(self.conv_last0(ll))
        tmp = self.l0(TF.relu(ll))
        net = TF.relu(self.bn5(tmp), True)
        net = self.conv6(net)
        net = TF.relu(net.reshape(net.shape[0], -1), True)
        return self.fc(net)


class TFanEncoder(tnn.Module):
    def __init__(self, pose_dim=6, eye_dim=6):
        super().__init__()
        self.model = TFanUse()

        def to_block():
            return tnn.Sequential(
                tnn.Linear(512, 512), tnn.ReLU(), tnn.BatchNorm1d(512),
                tnn.Linear(512, 512),
            )

        self.to_mouth = to_block()
        self.mouth_embed = tnn.Sequential(tnn.ReLU(), tnn.Linear(512, 512 - pose_dim - eye_dim))
        self.to_headpose = to_block()
        self.headpose_embed = tnn.Sequential(tnn.ReLU(), tnn.Linear(512, pose_dim))
        self.to_eye = to_block()
        self.eye_embed = tnn.Sequential(tnn.ReLU(), tnn.Linear(512, eye_dim))
        self.to_emo = to_block()
        self.emo_embed = tnn.Sequential(tnn.ReLU(), tnn.Linear(512, 30))

    def forward(self, x):
        f = self.model(x)
        mouth = self.to_mouth(f)
        headpose = self.headpose_embed(self.to_headpose(f))
        eye = self.eye_embed(self.to_eye(f))
        emo = self.emo_embed(self.to_emo(f))
        return headpose, eye, emo, mouth


@pytest.mark.slow
def test_fan_encoder_parity():
    torch.manual_seed(0)
    oracle = TFanEncoder().eval()
    x = torch.randn(2, 3, 224, 224)
    with torch.no_grad():
        ref = oracle(x)

    variables = fan_encoder_params_from_torch(oracle.state_dict())
    model = FanEncoder()
    got = model.apply(variables, x.numpy().transpose(0, 2, 3, 1))
    names = ["headpose", "eye", "emo", "mouth_feat"]
    for name, g, r in zip(names, got, ref):
        np.testing.assert_allclose(
            np.asarray(g), r.numpy(), rtol=1e-3, atol=2e-4, err_msg=name
        )


def test_mask_lip_boxes():
    img = jnp.ones((1, 224, 224, 3))
    m = np.asarray(mask_lip(img, "coeff"))
    assert m[0, 150, 100, 0] == 0.0  # inside lip box
    assert m[0, 50, 100, 0] == 1.0  # forehead untouched
    m2 = np.asarray(mask_lip(img, "disentangle"))
    assert m2[0, 150, 10, 0] == 0.0  # whole lower half
    assert m2[0, 99, 10, 0] == 1.0
