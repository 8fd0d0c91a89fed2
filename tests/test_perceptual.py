"""VGG19 perceptual loss: tower parity vs torch oracle + loss properties."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from avi_talking_tpu.train.landmark_losses import (
    eyed_loss,
    lip_dis,
    lipd_loss,
    mouth_corner_loss,
    weighted_landmark_loss,
)
from avi_talking_tpu.train.perceptual import (
    PerceptualLoss,
    Vgg19Features,
    apply_imagenet_normalization,
    gram_matrix,
    vgg19_params_from_torch,
)


def _torch_vgg19_features():
    # torchvision vgg19().features layout (conv/relu/pool sequence)
    plan = ((64, 2), (128, 2), (256, 4), (512, 4), (512, 4))
    layers = []
    in_ch = 3
    for stage, (ch, n) in enumerate(plan, 1):
        for _ in range(n):
            layers += [tnn.Conv2d(in_ch, ch, 3, padding=1), tnn.ReLU(inplace=False)]
            in_ch = ch
        if stage < 5:
            layers += [tnn.MaxPool2d(2, 2)]
    return tnn.Sequential(*layers)


def test_vgg_tower_parity():
    torch.manual_seed(0)
    feats = _torch_vgg19_features().eval()
    sd = {f"features.{i}.{k}": v for i, m in enumerate(feats)
          for k, v in m.state_dict().items()}
    x = torch.randn(1, 3, 64, 64)

    # torch taps: relu_k_1 output indices
    taps_idx = {"relu_1_1": 1, "relu_2_1": 6, "relu_3_1": 11,
                "relu_4_1": 20, "relu_5_1": 29}
    ref = {}
    h = x
    with torch.no_grad():
        for i, m in enumerate(feats):
            h = m(h)
            for name, idx in taps_idx.items():
                if i == idx:
                    ref[name] = h.numpy().transpose(0, 2, 3, 1)

    model = Vgg19Features()
    params = vgg19_params_from_torch(sd)
    got = model.apply({"params": params}, x.numpy().transpose(0, 2, 3, 1))
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-3, atol=1e-4, err_msg=k)


def test_perceptual_loss_zero_for_identical():
    model = Vgg19Features(taps=("relu_1_1", "relu_2_1"))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), img)["params"]
    loss_fn = PerceptualLoss(model, layers=("relu_1_1", "relu_2_1"), num_scales=2,
                             use_style_loss=True)
    z = loss_fn(params, img, img)
    assert float(z) == 0.0
    other = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    assert float(loss_fn(params, img, other)) > 0.0


def test_imagenet_normalization_and_gram():
    x = jnp.zeros((1, 4, 4, 3))  # [-1,1] -> 0.5 in [0,1]
    n = np.asarray(apply_imagenet_normalization(x))
    np.testing.assert_allclose(
        n[0, 0, 0], (0.5 - np.asarray([0.485, 0.456, 0.406])) / np.asarray([0.229, 0.224, 0.225]),
        rtol=1e-5,
    )
    f = jnp.ones((2, 3, 3, 4))
    g = np.asarray(gram_matrix(f))
    np.testing.assert_allclose(g, np.ones((2, 4, 4)) * (9 / (9 * 4)), rtol=1e-6)


def test_landmark_losses_basic():
    rng = np.random.default_rng(1)
    lmk = jnp.asarray(rng.standard_normal((2, 68, 2)).astype(np.float32))
    assert float(lipd_loss(lmk, lmk)) == 0.0
    assert float(eyed_loss(lmk, lmk)) == 0.0
    assert float(mouth_corner_loss(lmk, lmk)) == 0.0
    other = lmk + 0.1
    assert float(weighted_landmark_loss(lmk, other)) > 0
    # lip_dis picks inner-lip pairs
    d = lip_dis(lmk)
    assert d.shape == (2, 3)
