"""ResNet50 parity vs torch oracle; EMOCA encoder/pseudo-GT; EmoNet loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as TF

from avi_talking_tpu.models.emoca import (
    DecaEncoder,
    EmoNetLoss,
    EmocaEncoder,
    EmotionRecognitionModule,
    deca_encoder_params_from_torch,
    emoca_pseudo_gt,
    split_deca_code,
)
from avi_talking_tpu.models.resnet import ResNet50, resnet50_params_from_torch


# --- compact torch ResNet50 oracle (public torchvision layout) --------------


class TBottleneck(tnn.Module):
    def __init__(self, inp, planes, stride=1, down=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(inp, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = (
            tnn.Sequential(
                tnn.Conv2d(inp, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4),
            )
            if down
            else None
        )

    def forward(self, x):
        out = TF.relu(self.bn1(self.conv1(x)))
        out = TF.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        sc = self.downsample(x) if self.downsample is not None else x
        return TF.relu(out + sc)


class TResNet50(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        layers = []
        inp, planes = 64, 64
        for li, blocks in enumerate((3, 4, 6, 3)):
            stage = []
            for bi in range(blocks):
                stride = 2 if (bi == 0 and li > 0) else 1
                stage.append(TBottleneck(inp, planes, stride, down=(bi == 0)))
                inp = planes * 4
            layers.append(tnn.Sequential(*stage))
            planes *= 2
        self.layer1, self.layer2, self.layer3, self.layer4 = layers

    def forward(self, x):
        x = TF.relu(self.bn1(self.conv1(x)))
        x = TF.max_pool2d(x, 3, 2, 1)
        for l in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = l(x)
        return x.mean(dim=(2, 3))


@pytest.mark.slow
def test_resnet50_parity():
    torch.manual_seed(0)
    oracle = TResNet50().eval()
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        ref = oracle(x).numpy()
    variables = resnet50_params_from_torch(oracle.state_dict())
    got = np.asarray(
        ResNet50().apply(variables, x.numpy().transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_deca_encoder_and_split():
    torch.manual_seed(1)
    oracle = TResNet50().eval()
    head0 = tnn.Linear(2048, 1024)
    head2 = tnn.Linear(1024, 236)
    sd = {f"encoder.{k}": v for k, v in oracle.state_dict().items()}
    sd.update({f"layers.0.{k}": v for k, v in head0.state_dict().items()})
    sd.update({f"layers.2.{k}": v for k, v in head2.state_dict().items()})
    variables = deca_encoder_params_from_torch(sd)
    x = np.random.default_rng(0).standard_normal((1, 64, 64, 3)).astype(np.float32)
    code = DecaEncoder().apply(variables, x)
    assert code.shape == (1, 236)
    with torch.no_grad():
        ref = head2(TF.relu(head0(oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)))))).numpy()
    np.testing.assert_allclose(np.asarray(code), ref, rtol=1e-3, atol=1e-3)

    parts = split_deca_code(code)
    assert parts["shape"].shape == (1, 100)
    assert parts["exp"].shape == (1, 50)
    assert parts["pose"].shape == (1, 6)
    assert parts["light"].shape == (1, 27)


def test_emoca_encoder_shapes():
    enc = EmocaEncoder()
    x = jnp.zeros((2, 32, 32, 3))
    variables = enc.init(jax.random.PRNGKey(0), x)
    codes = enc.apply(variables, x)
    assert codes["exp"].shape == (2, 50)
    assert codes["shape"].shape == (2, 100)


def test_pseudo_gt_semantics():
    rng = np.random.default_rng(2)
    T = 5
    codes = {
        "shape": jnp.asarray(rng.standard_normal((T, 100)).astype(np.float32)),
        "exp": jnp.asarray(rng.standard_normal((T, 50)).astype(np.float32)),
        "pose": jnp.asarray(rng.standard_normal((T, 6)).astype(np.float32)),
        "tex": jnp.asarray(rng.standard_normal((T, 50)).astype(np.float32)),
    }
    validity = jnp.asarray([1.0, 1.0, 0.0, 1.0, 1.0])
    gt = emoca_pseudo_gt(codes, validity)
    assert gt["gt_shape"].shape == (100,)
    # frame 2 excluded from the shape average
    expected = np.asarray(codes["shape"])[np.asarray([0, 1, 3, 4])].mean(0)
    np.testing.assert_allclose(np.asarray(gt["gt_shape"]), expected, rtol=1e-5)
    assert gt["gt_jaw"].shape == (T, 3)
    np.testing.assert_allclose(
        np.asarray(gt["gt_jaw"]), np.asarray(codes["pose"])[:, 3:], rtol=1e-6
    )


def test_emonet_loss():
    mod = EmotionRecognitionModule()
    x = jnp.zeros((1, 32, 32, 3))
    variables = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(variables, x)
    assert out["expr_classification"].shape == (1, 8)
    assert out["emo_feat_2"].shape == (1, 2048)

    loss_fn = EmoNetLoss(mod)
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    loss, metrics = loss_fn(variables, a, a)
    assert float(loss) == 0.0
    b = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    loss2, _ = loss_fn(variables, a, b)
    assert float(loss2) > 0.0


def test_video_emotion_classifier_and_loss():
    from avi_talking_tpu.models.video_emotion import (
        VideoEmotionClassifier,
        VideoEmotionLoss,
    )

    clf = VideoEmotionClassifier(n_classes=8, feature_dim=32, num_layers=1,
                                 nhead=4, input_dim=64)
    rng = np.random.default_rng(5)
    feats = jnp.asarray(rng.standard_normal((2, 6, 64)).astype(np.float32))
    variables = clf.init(jax.random.PRNGKey(0), feats)
    logits = clf.apply(variables, feats)
    assert logits.shape == (2, 8)

    loss_fn = VideoEmotionLoss(clf, variables)
    l1 = loss_fn(feats, gt_label=jnp.asarray([3, 5]))
    l2 = loss_fn(feats, gt_logits=logits)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    # KL-style loss to its own logits is the self-entropy (finite, >=0)
    assert float(l2) >= 0.0


def test_lipread_net_and_loss():
    from avi_talking_tpu.models.lipread import (
        LipReadingLoss, LipReadingNet, mouth_transform,
    )

    net = LipReadingNet()
    rng = np.random.default_rng(6)
    frames = jnp.asarray(rng.uniform(0, 1, (1, 3, 96, 96)).astype(np.float32))
    crops = mouth_transform(frames)  # center 88x88, normalized
    assert crops.shape == (1, 3, 88, 88, 1)
    variables = net.init(jax.random.PRNGKey(0), crops)
    feats = net.apply(variables, crops)
    assert feats.shape == (1, 3, 512)

    loss_fn = LipReadingLoss(net, variables)
    assert float(loss_fn(crops, crops)) < 1e-5
    other = mouth_transform(
        jnp.asarray(rng.uniform(0, 1, (1, 3, 96, 96)).astype(np.float32))
    )
    assert float(loss_fn(crops, other)) > 0.0
    loss_l2 = LipReadingLoss(net, variables, metric="l2")
    assert float(loss_l2(crops, crops)) == 0.0
    # masking out the mismatched frames lowers the loss (temporal conv
    # receptive field keeps it nonzero)
    mask = jnp.asarray([[1.0, 0.0, 0.0]])
    half = jnp.concatenate([crops[:, :1], other[:, 1:]], axis=1)
    assert float(loss_fn(half, crops, mask=mask)) < float(loss_fn(half, crops))


@pytest.mark.slow
def test_preprocessors():
    from avi_talking_tpu.core import FlameModel, synthetic_assets
    from avi_talking_tpu.models.preprocessors import (
        EmotionRecognitionPreprocessor,
        FlamePreprocessor,
        SpeechEmotionRecognitionPreprocessor,
    )
    from avi_talking_tpu.audio import Wav2Vec2Config
    from avi_talking_tpu.audio.ser import Wav2Vec2SER

    assets = synthetic_assets(n_shape=8, n_exp=6)
    pp = FlamePreprocessor(FlameModel(assets, 8, 6))
    rng = np.random.default_rng(8)
    B, T = 2, 4
    batch = {
        "gt_shape": jnp.asarray(rng.standard_normal((B, 8)).astype(np.float32)),
        "gt_exp": jnp.asarray(rng.standard_normal((B, T, 6)).astype(np.float32)),
        "gt_jaw": jnp.asarray(rng.standard_normal((B, T, 3)).astype(np.float32) * 0.1),
    }
    out = pp(batch)
    assert out["gt_vertices"].shape == (B, T, 128, 3)
    assert out["template"].shape == (B, 128, 3)

    emo = EmotionRecognitionModule()
    frames = jnp.zeros((1, 2, 32, 32, 3))
    v = emo.init(jax.random.PRNGKey(0), frames.reshape(2, 32, 32, 3))
    ep = EmotionRecognitionPreprocessor(emo, v)
    res = ep(frames)
    assert res["gt_emo_feat_2"].shape == (1, 2, 2048)
    assert res["gt_expression_logits"].shape == (1, 2, 8)

    ser = Wav2Vec2SER(Wav2Vec2Config.tiny(), num_labels=8, classifier_proj_size=16)
    audio = jnp.zeros((1, 3200))
    sv = ser.init(jax.random.PRNGKey(0), audio, output_len=5)
    sp = SpeechEmotionRecognitionPreprocessor(ser, sv)
    assert sp(audio, output_len=5)["gt_audio_emotion_logits"].shape == (1, 8)


def test_emoca_encoder_full_importer_with_detail():
    """emoca_encoder_params_from_torch: E_flame/E_expression/E_detail
    ResnetEncoder towers -> EmocaEncoder variables, output parity."""
    from avi_talking_tpu.models.emoca import (
        EmocaEncoder,
        emoca_encoder_params_from_torch,
        split_deca_code,
    )

    torch.manual_seed(3)

    class TResnetEncoder(tnn.Module):
        def __init__(self, outsize):
            super().__init__()
            self.encoder = TResNet50()
            self.layers = tnn.Sequential(
                tnn.Linear(2048, 1024), tnn.ReLU(), tnn.Linear(1024, outsize))

        def forward(self, x):
            return self.layers(self.encoder(x))

    n_exp, n_detail = 50, 16
    towers = {"E_flame.": TResnetEncoder(236).eval(),
              "E_expression.": TResnetEncoder(n_exp).eval(),
              "E_detail.": TResnetEncoder(n_detail).eval()}
    sd = {}
    for pref, m in towers.items():
        for k, v in m.state_dict().items():
            sd[pref + k] = v
    x = torch.randn(1, 3, 64, 64) * 0.2 + 0.4
    with torch.no_grad():
        ref = split_deca_code(
            jnp.asarray(towers["E_flame."](x).numpy()))
        ref_exp = towers["E_expression."](x).numpy()
        ref_detail = towers["E_detail."](x).numpy()

    enc = EmocaEncoder(n_exp=n_exp, with_detail=True, n_detail=n_detail)
    variables = emoca_encoder_params_from_torch(sd, with_detail=True)
    codes = enc.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(codes["shape"]),
                               np.asarray(ref["shape"]), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(codes["exp"]), ref_exp,
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(codes["detail"]), ref_detail,
                               atol=2e-4, rtol=1e-3)
