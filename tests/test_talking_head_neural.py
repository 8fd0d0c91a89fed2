"""EMOTE trainer with the full neural loss suite + condition exchange.

Verdict item: "wire the neural losses into EMOTE training" — lip-reading on
differentiable-render mouth crops, per-frame EmoNet features, video-level
emotion, and the condition_exchange batch doubling, all inside ONE jitted
train step. Reference wiring: inferno FaceFormer.py:61-94 (frozen
neural_losses), :196-440 (loss terms incl. *_disentangled),
TalkingHeadBase.py:258-435 (condition_exchange doubling).

The test overfits a single tiny batch and asserts every enabled loss term is
(a) reported, (b) nonzero at init, (c) decreasing — i.e. gradients actually
flow back through render -> perception towers into the head.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from avi_talking_tpu.core import synthetic_assets
from avi_talking_tpu.models.conditioning import StyleCondition
from avi_talking_tpu.models.emote import EmoteConfig, EmoteTalkingHead
from avi_talking_tpu.train.talking_head import NeuralLosses, TalkingHeadTrainer


def _small_renderer(faces):
    from avi_talking_tpu.viz.visualizer import FixedViewRenderer

    return FixedViewRenderer(faces, image_size=24)


def _neural_suite(renderer, rng):
    from avi_talking_tpu.models.emoca import EmoNetLoss, EmotionRecognitionModule
    from avi_talking_tpu.models.lipread import LipReadingLoss, LipReadingNet
    from avi_talking_tpu.models.video_emotion import (
        VideoEmotionClassifier,
        VideoEmotionLoss,
    )

    lip_net = LipReadingNet()
    lip_vars = lip_net.init(rng, jnp.zeros((1, 2, 24, 24, 1)))
    emo_mod = EmotionRecognitionModule(n_expression=8)
    emo_vars = emo_mod.init(rng, jnp.zeros((1, 24, 24, 3)))
    vemo_cls = VideoEmotionClassifier(
        n_classes=8, feature_dim=16, num_layers=1, nhead=2, input_dim=2048
    )
    vemo_vars = vemo_cls.init(rng, jnp.zeros((1, 4, 2048)))
    return NeuralLosses(
        renderer=renderer,
        lipread=LipReadingLoss(lip_net, lip_vars),
        lipread_weight=1.0,
        emonet=EmoNetLoss(emo_mod),
        emonet_variables=emo_vars,
        emotion_weight=1.0,
        video_emotion=VideoEmotionLoss(vemo_cls, vemo_vars),
        video_emotion_weight=0.1,
    )


@pytest.fixture(scope="module")
def setup():
    cfg = EmoteConfig.tiny()
    assets = synthetic_assets(n_shape=cfg.n_shape, n_exp=cfg.flint.n_exp)
    head = EmoteTalkingHead(cfg, flame_assets=assets)
    renderer = _small_renderer(np.asarray(assets.faces))
    neural = _neural_suite(renderer, jax.random.PRNGKey(7))

    B, T = 2, 2 * cfg.flint.latent_frame_size
    rng = np.random.default_rng(0)
    batch = {
        "raw_audio": jnp.asarray(rng.standard_normal((B, T, 640)).astype(np.float32)),
        "expression": jnp.asarray(np.eye(8, dtype=np.float32)[[1, 5]]),
        "intensity": jnp.asarray(np.eye(3, dtype=np.float32)[[0, 2]]),
        "identity": jnp.asarray(np.eye(32, dtype=np.float32)[[3, 9]]),
        "shape": jnp.zeros((B, cfg.n_shape)),
        "gt_exp": jnp.asarray(
            rng.standard_normal((B, T, cfg.flint.n_exp)).astype(np.float32) * 0.1
        ),
        "gt_jaw": jnp.asarray(
            np.abs(rng.standard_normal((B, T, 3)).astype(np.float32)) * 0.05
        ),
    }
    cond = StyleCondition(
        expression=batch["expression"], intensity=batch["intensity"],
        identity=batch["identity"], shape=batch["shape"],
    )
    params = head.init(jax.random.PRNGKey(0), batch["raw_audio"], cond)
    # gt vertices from a plausible FLAME decode of the gt coeffs (so the
    # render losses have a reachable target)
    from avi_talking_tpu.core import FlameModel

    flame = FlameModel(assets, n_shape=cfg.n_shape, n_exp=cfg.flint.n_exp)

    def decode(exp_t, jaw_t):  # (T, n_exp), (T, 3) -> (T, V, 3)
        T = exp_t.shape[0]
        shape_t = jnp.broadcast_to(batch["shape"][0], (T, cfg.n_shape))
        pose = jnp.concatenate([jnp.zeros((T, 3)), jaw_t], axis=1)
        return flame.vertices_only(shape_t, exp_t, pose)

    batch["gt_vertices"] = jax.vmap(decode)(batch["gt_exp"], batch["gt_jaw"])
    return head, params, batch, neural


NEURAL_TERMS = (
    "loss_lipread", "loss_emotion", "loss_video_emotion",
    "loss_lipread_disentangled", "loss_emotion_disentangled",
    "loss_video_emotion_disentangled",
)


@pytest.mark.slow
def test_neural_losses_wired_and_decreasing(setup):
    head, params, batch, neural = setup
    tx = optax.adam(3e-3)
    trainer = TalkingHeadTrainer(
        head=head, tx=tx, neural=neural, disentangle="condition_exchange"
    )
    step = trainer.jitted_train_step()
    opt = tx.init(params)
    history = []
    for i in range(5):  # enough for every term to move; keeps 1-core CI fast
        params, opt, metrics = step(params, opt, batch, jax.random.PRNGKey(3))
        history.append({k: float(v) for k, v in metrics.items()})
    first, last = history[0], history[-1]
    for term in NEURAL_TERMS + ("loss_exp", "loss_jaw", "loss_vertex", "loss"):
        assert term in first, f"{term} not reported"
        assert np.isfinite(first[term]), term
        assert first[term] != 0.0, f"{term} zero at init"
    assert last["loss"] < first["loss"], (first["loss"], last["loss"])
    # the render-based terms must receive gradients (decrease on overfit)
    for term in ("loss_lipread", "loss_emotion"):
        assert last[term] < first[term], (term, first[term], last[term])
    # the exchange is a derangement, so the disentangled terms see genuinely
    # exchanged conditions (not a copy of the plain term)
    assert first["loss_lipread_disentangled"] != first["loss_lipread"]


@pytest.mark.slow
def test_neural_losses_off_by_default(setup):
    head, params, batch, _ = setup
    tx = optax.adam(1e-3)
    trainer = TalkingHeadTrainer(head=head, tx=tx)
    _, _, metrics = trainer.jitted_train_step()(
        params, tx.init(params), batch, jax.random.PRNGKey(0)
    )
    assert not any(t in metrics for t in NEURAL_TERMS)
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_condition_exchange_geometric_loss_on_original_half(setup):
    """Geometric losses must ignore the exchanged half: doubling the batch
    with exchanged styles must not change loss_exp vs the plain batch at the
    same params (reference computes them on [:B_eff]=B_orig,
    FaceFormer.py:131-143)."""
    head, params, batch, _ = setup
    tx = optax.adam(1e-3)
    plain = TalkingHeadTrainer(head=head, tx=tx)
    doubled = TalkingHeadTrainer(head=head, tx=tx, disentangle="condition_exchange")
    _, m_plain = plain.loss_fn(params, batch, jax.random.PRNGKey(0))
    _, m_doubled = doubled.loss_fn(params, batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        float(m_plain["loss_exp"]), float(m_doubled["loss_exp"]), rtol=1e-5
    )
