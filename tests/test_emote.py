"""EMOTE talking head: end-to-end shapes, style paths, FLAME integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avi_talking_tpu.core import synthetic_assets
from avi_talking_tpu.models import EmoteConfig, EmoteTalkingHead
from avi_talking_tpu.models.conditioning import StyleCondition


@pytest.fixture(scope="module")
def tiny_head():
    cfg = EmoteConfig.tiny()
    head = EmoteTalkingHead(cfg, flame_assets=synthetic_assets(n_shape=8, n_exp=6))
    B, T = 2, 8  # T multiple of latent frame size 4
    audio = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, T, 640)).astype(np.float32)
    )
    cond = StyleCondition.make(
        emotion_idx=5, intensity_idx=2, identity_idx=1, batch=B,
        n_identities=4, shape_dim=8,
    )
    params = head.init(jax.random.PRNGKey(0), audio, cond)
    return cfg, head, params, audio, cond


def test_forward_shapes(tiny_head):
    cfg, head, params, audio, cond = tiny_head
    out = head.apply(params, audio, cond)
    B, T = audio.shape[:2]
    assert out["exp"].shape == (B, T, 6)
    assert out["jaw"].shape == (B, T, 3)
    assert out["style_emb"].shape == (B, cfg.feature_dim)
    assert out["vertices"].shape == (B, T, 128, 3)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


def test_external_style_emb_overrides_condition(tiny_head):
    cfg, head, params, audio, cond = tiny_head
    B = audio.shape[0]
    style = jnp.asarray(
        np.random.default_rng(1).standard_normal((B, cfg.feature_dim)).astype(np.float32)
    )
    out = head.apply(params, audio, style_emb=style)
    np.testing.assert_allclose(np.asarray(out["style_emb"]), np.asarray(style))
    out_cond = head.apply(params, audio, cond)
    assert not np.allclose(np.asarray(out["exp"]), np.asarray(out_cond["exp"]))


def test_style_embedding_method_is_linear(tiny_head):
    cfg, head, params, audio, cond = tiny_head
    emb = head.apply(params, cond, method=EmoteTalkingHead.style_embedding)
    assert emb.shape == (audio.shape[0], cfg.feature_dim)
    # linearity: 2x condition -> (2x emb - bias) relationship holds for Dense
    cond2 = StyleCondition(
        expression=cond.expression * 2,
        intensity=cond.intensity * 2,
        identity=cond.identity * 2,
        shape=cond.shape * 2,
    )
    emb2 = head.apply(params, cond2, method=EmoteTalkingHead.style_embedding)
    bias = params["params"]["style_encoder"]["map"]["bias"]
    np.testing.assert_allclose(
        np.asarray(emb2 - bias), np.asarray(2 * (emb - bias)), rtol=1e-4, atol=1e-5
    )


def test_jit_forward(tiny_head):
    cfg, head, params, audio, cond = tiny_head
    fwd = jax.jit(lambda p, a, s: head.apply(p, a, style_emb=s))
    style = jnp.zeros((audio.shape[0], cfg.feature_dim))
    out = fwd(params, audio, style)
    assert out["exp"].shape[1] == audio.shape[1]


def test_frame_count_must_match_latent_multiple(tiny_head):
    cfg, head, params, audio, cond = tiny_head
    bad = audio[:, :7]  # not a multiple of 4
    with pytest.raises(AssertionError):
        head.apply(params, bad, cond)


def test_sequence_encoder_variants():
    import jax as _jax
    from avi_talking_tpu.models.sequence_encoders import sequence_encoder_from_name

    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((2, 12, 24)).astype(np.float32)
    )
    for name in ("linear", "transformer", "gru", "tcn"):
        enc = sequence_encoder_from_name(name, feature_dim=16)
        params = enc.init(_jax.random.PRNGKey(0), x)
        out = enc.apply(params, x)
        assert out.shape == (2, 12, 16), name
        assert np.isfinite(np.asarray(out)).all(), name


def test_feedforward_decoder_family():
    import jax as _jax
    from avi_talking_tpu.core import synthetic_assets
    from avi_talking_tpu.models.decoders import DecoderConfig, FeedForwardDecoder

    rng = np.random.default_rng(11)
    hidden = jnp.asarray(rng.standard_normal((2, 10, 16)).astype(np.float32))
    style = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))

    for kind in ("linear", "mlp", "bert"):
        cfg = DecoderConfig(kind=kind, feature_dim=16, vertices_dim=12, nhead=4)
        dec = FeedForwardDecoder(cfg)
        params = dec.init(_jax.random.PRNGKey(0), hidden, style)
        out = dec.apply(params, hidden, style)
        assert out["offsets"].shape == (2, 10, 12), kind
        # zero-init head => zero offsets at init (reference init)
        np.testing.assert_allclose(np.asarray(out["offsets"]), 0.0, atol=1e-6)

    # legacy bug switch changes the bert output path once weights are nonzero
    cfg = DecoderConfig(kind="bert", feature_dim=16, vertices_dim=12, nhead=4,
                        temporal_bias_type="faceformer")
    dec_fix = FeedForwardDecoder(cfg)
    params = dec_fix.init(_jax.random.PRNGKey(1), hidden, style)
    import jax as j2
    leaves, treedef = j2.tree_util.tree_flatten(params)
    params2 = j2.tree_util.tree_unflatten(
        treedef, [jnp.asarray(np.random.default_rng(3).standard_normal(l.shape),
                              jnp.float32) * 0.1 for l in leaves]
    )
    out_fix = dec_fix.apply(params2, hidden, style)
    cfg_bug = DecoderConfig(kind="bert", feature_dim=16, vertices_dim=12, nhead=4,
                            temporal_bias_type="faceformer", post_bug_fix=False)
    out_bug = FeedForwardDecoder(cfg_bug).apply(params2, hidden, style)
    assert not np.allclose(np.asarray(out_fix["offsets"]),
                           np.asarray(out_bug["offsets"]))

    # flame_bert produces exp/jaw (+verts with assets)
    assets = synthetic_assets(n_shape=8, n_exp=6)
    cfg = DecoderConfig(kind="flame_bert", feature_dim=16, nhead=4, n_exp=6)
    dec = FeedForwardDecoder(cfg, flame_assets=assets)
    params = dec.init(_jax.random.PRNGKey(2), hidden, style)
    out = dec.apply(params, hidden, style)
    assert out["exp"].shape == (2, 10, 6)
    assert out["jaw"].shape == (2, 10, 3)
    assert out["vertices"].shape == (2, 10, 128, 3)


def test_bert_dropout_active_in_training_mode(tiny_head):
    cfg, head, params, audio, cond = tiny_head
    import jax as _jax

    det = head.apply(params, audio, cond, deterministic=True)
    d1 = head.apply(params, audio, cond, deterministic=False,
                    rngs={"dropout": _jax.random.PRNGKey(0)})
    d2 = head.apply(params, audio, cond, deterministic=False,
                    rngs={"dropout": _jax.random.PRNGKey(1)})
    # dropout (cfg.dropout=0.25... tiny uses default 0.25) changes outputs
    assert not np.allclose(np.asarray(det["exp"]), np.asarray(d1["exp"]))
    assert not np.allclose(np.asarray(d1["exp"]), np.asarray(d2["exp"]))
