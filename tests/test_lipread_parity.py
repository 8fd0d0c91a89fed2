"""Torch-oracle parity for the lip-reading visual front-end importer.

The oracle re-implements the published VSR architecture ("Lipreading using
Temporal Convolutional Networks", Ma et al.; espnet conv3d_extractor +
ResNet-18 trunk with ``extract_resnet_feats=True`` semantics, the part
inferno's LipReadingLoss actually uses — LipReadingLoss.py:92-96) directly in
torch inside this test, exports its state dict with the genuine VSR key
names (``frontend3D.0.*``, ``trunk.layerX.Y.*``), and checks our flax net
reproduces its features after ``lipread_params_from_torch``.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from avi_talking_tpu.models.lipread import (  # noqa: E402
    LipReadingNet,
    lipread_params_from_torch,
    mouth_transform,
)


class _TorchBasic(tnn.Module):
    def __init__(self, inp, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inp, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.act = tnn.SiLU()
        if stride != 1 or inp != planes:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inp, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes),
            )
        else:
            self.downsample = None

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        h = self.act(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        return self.act(h + r)


class _TorchTrunk(tnn.Module):
    def __init__(self):
        super().__init__()
        widths = (64, 128, 256, 512)
        inp = 64
        for li, w in enumerate(widths):
            stride = 1 if li == 0 else 2
            layer = tnn.Sequential(
                _TorchBasic(inp, w, stride), _TorchBasic(w, w, 1)
            )
            setattr(self, f"layer{li + 1}", layer)
            inp = w

    def forward(self, x):
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.layer4(x)
        return x.mean(dim=(2, 3))


class _TorchConv3dResNet(tnn.Module):
    """espnet conv3d_extractor: frontend3D + per-frame ResNet trunk."""

    def __init__(self):
        super().__init__()
        self.frontend3D = tnn.Sequential(
            tnn.Conv3d(1, 64, (5, 7, 7), (1, 2, 2), (2, 3, 3), bias=False),
            tnn.BatchNorm3d(64),
            tnn.SiLU(),
            tnn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1)),
        )
        self.trunk = _TorchTrunk()

    def forward(self, x):  # (B, 1, T, H, W)
        B = x.shape[0]
        x = self.frontend3D(x)
        T = x.shape[2]
        x = x.transpose(1, 2).reshape(B * T, 64, x.shape[3], x.shape[4])
        return self.trunk(x).reshape(B, T, 512)


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(0)
    m = _TorchConv3dResNet().eval()
    # randomize BN running stats so import must carry them
    for mod in m.modules():
        if isinstance(mod, (tnn.BatchNorm2d, tnn.BatchNorm3d)):
            mod.running_mean.uniform_(-0.3, 0.3)
            mod.running_var.uniform_(0.6, 1.5)
    return m


def test_lipread_import_parity(oracle):
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    variables = lipread_params_from_torch(sd)

    rng = np.random.default_rng(0)
    frames = rng.uniform(0, 1, (2, 6, 96, 96)).astype(np.float32)
    crops = mouth_transform(jnp.asarray(frames))  # (2, 6, 88, 88, 1)

    with torch.no_grad():
        tin = torch.from_numpy(np.asarray(crops)[..., 0]).unsqueeze(1)  # B,1,T,H,W
        want = oracle(tin).numpy()

    net = LipReadingNet(relu_type="swish")
    got = np.asarray(net.apply(variables, crops))
    assert got.shape == want.shape == (2, 6, 512)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_lipread_importer_covers_all_torch_params(oracle):
    """Every torch tensor must land somewhere in the flax tree (no silent
    drops that would pass shape checks but skip weights)."""
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    n_torch = sum(
        v.size for k, v in sd.items() if "num_batches_tracked" not in k
    )
    variables = lipread_params_from_torch(sd)
    n_flax = sum(x.size for x in jax.tree.leaves(variables))
    assert n_flax == n_torch
