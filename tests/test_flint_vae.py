"""FLINT VAE roundtrip + SpecAugment masking tests."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from avi_talking_tpu.audio import Wav2Vec2Config, Wav2Vec2Model
from avi_talking_tpu.audio.specaugment import compute_mask_indices
from avi_talking_tpu.models.flint import FlintConfig
from avi_talking_tpu.models.flint_vae import FlintEncoder, FlintVAE


def _cfg():
    return FlintConfig(feature_dim=16, bottleneck_dim=16, quant_factor=2,
                       nhead=4, intermediate_size=32, out_dim=9, n_exp=6)


def test_encoder_downsamples_by_2q():
    cfg = _cfg()
    enc = FlintEncoder(cfg, in_dim=9)
    x = jnp.zeros((2, 16, 9))
    variables = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(variables, x)
    assert out.shape == (2, 4, 16)  # 16 / 2**2


def test_vae_roundtrip_shapes_and_loss():
    cfg = _cfg()
    vae = FlintVAE(cfg)
    rng = np.random.default_rng(0)
    motion = jnp.asarray(rng.standard_normal((2, 16, 9)).astype(np.float32))
    variables = vae.init(jax.random.PRNGKey(0), motion, jax.random.PRNGKey(1))
    out = vae.apply(variables, motion, jax.random.PRNGKey(2))
    assert out["reconstruction"].shape == motion.shape
    assert out["mu"].shape == (2, 4, 16)

    loss, metrics = vae.apply(
        variables, motion, jax.random.PRNGKey(3), method=FlintVAE.loss
    )
    assert np.isfinite(float(loss))
    assert set(metrics) == {"loss", "recon", "kl"}
    # deterministic (mean) decode differs from sampled decode
    out_det = vae.apply(variables, motion, sample=False)
    assert out_det["reconstruction"].shape == motion.shape


def test_vae_trains():
    import optax

    cfg = _cfg()
    vae = FlintVAE(cfg)
    rng = np.random.default_rng(1)
    motion = jnp.asarray(rng.standard_normal((4, 16, 9)).astype(np.float32) * 0.1)
    variables = vae.init(jax.random.PRNGKey(0), motion, jax.random.PRNGKey(1))
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        def lf(p):
            loss, m = vae.apply(
                {"params": p, "batch_stats": stats}, motion, key,
                method=FlintVAE.loss,
            )
            return loss, m

        (loss, m), g = jax.value_and_grad(lf, has_aux=True)(params)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt, m["recon"]

    recons = []
    for i in range(60):
        params, opt, r = step(params, opt, jax.random.PRNGKey(i))
        recons.append(float(r))
    assert np.mean(recons[-5:]) < np.mean(recons[:5])


def test_mask_indices_properties():
    rng = np.random.default_rng(0)
    mask = compute_mask_indices((4, 100), mask_prob=0.2, mask_length=10,
                                min_masks=2, rng=rng)
    assert mask.shape == (4, 100)
    counts = mask.sum(axis=1)
    assert (counts == counts[0]).all()  # equalised across batch
    assert counts[0] >= 10  # at least min_masks spans worth


def test_wav2vec2_time_masking_changes_output():
    cfg = Wav2Vec2Config.tiny()
    model = Wav2Vec2Model(cfg)
    rng = np.random.default_rng(2)
    audio = rng.standard_normal((1, 2000)).astype(np.float32)
    T = 7
    params = model.init(jax.random.PRNGKey(0), audio, output_len=T)
    assert "masked_spec_embed" not in params["params"]
    # init WITH masking so the mask embedding param exists
    mask = compute_mask_indices((1, T), 0.5, 2, rng=np.random.default_rng(3))
    params = model.init(
        jax.random.PRNGKey(0), audio, output_len=T,
        mask_time_indices=jnp.asarray(mask),
    )
    out_masked = model.apply(params, audio, output_len=T,
                             mask_time_indices=jnp.asarray(mask))
    out_plain = model.apply(params, audio, output_len=T)
    assert not np.allclose(np.asarray(out_masked), np.asarray(out_plain))


def test_vector_quantizer_matches_torch_oracle():
    """VQ bottleneck parity: distances/argmin/straight-through/terms match
    the published VQ-VAE quantizer math (in-test torch oracle)."""
    import torch

    from avi_talking_tpu.models.flint_vae import VectorQuantizer

    B, T, D, K = 2, 6, 8, 16
    rng = np.random.default_rng(0)
    z = rng.standard_normal((B, T, D)).astype(np.float32)
    emb = rng.uniform(-1 / K, 1 / K, (K, D)).astype(np.float32)

    q = VectorQuantizer(codebook_size=K, vector_dim=D)
    out = q.apply({"params": {"embedding": jnp.asarray(emb)}}, jnp.asarray(z))

    zt = torch.tensor(z).reshape(-1, D)
    et = torch.tensor(emb)
    d = (zt ** 2).sum(1, keepdim=True) + (et ** 2).sum(1) - 2 * zt @ et.t()
    idx = torch.argmin(d, dim=1)
    z_q = et[idx].view(B, T, D)
    zb = torch.tensor(z)
    align = ((z_q.detach() - zb) ** 2).mean()
    commit = ((z_q - zb.detach()) ** 2).mean()
    one_hot = torch.nn.functional.one_hot(idx, K).float().mean(0)
    perp = torch.exp(-(one_hot * torch.log(one_hot + 1e-10)).sum())

    np.testing.assert_array_equal(np.asarray(out["codes"]).ravel(), idx.numpy())
    np.testing.assert_allclose(np.asarray(out["quantized"]), z_q.numpy(),
                               atol=1e-6)
    np.testing.assert_allclose(float(out["alignment"]), float(align), rtol=1e-5)
    np.testing.assert_allclose(float(out["commitment"]), float(commit), rtol=1e-5)
    np.testing.assert_allclose(float(out["perplexity"]), float(perp), rtol=1e-5)

    # straight-through: d quantized / d z == identity (codes fixed)
    g = jax.grad(lambda zz: q.apply(
        {"params": {"embedding": jnp.asarray(emb)}}, zz)["quantized"].sum())(
            jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(g), np.ones_like(z), atol=1e-6)


@pytest.mark.slow
def test_flint_vqvae_trains_and_uses_codebook():
    import optax

    from avi_talking_tpu.models.flint_vae import FlintVQVAE

    cfg = _cfg()
    model = FlintVQVAE(cfg, codebook_size=32)
    B, T = 2, 4 * (2 ** cfg.quant_factor)
    motion = jnp.asarray(
        np.random.default_rng(1).standard_normal((B, T, cfg.out_dim))
        .astype(np.float32) * 0.3)
    variables = model.init(jax.random.PRNGKey(0), motion)
    params, stats = variables["params"], variables.get("batch_stats", {})
    out = model.apply(variables, motion)
    assert out["reconstruction"].shape == motion.shape
    assert out["codes"].shape == (B, T // 2 ** cfg.quant_factor)

    tx = optax.adam(1e-3)
    opt = tx.init(params)

    def step(params, stats, opt):
        def loss_fn(p):
            (l, m), upd = model.apply(
                {"params": p, "batch_stats": stats}, motion, train=True,
                method=FlintVQVAE.loss, mutable=["batch_stats"])
            return l, (m, upd["batch_stats"])
        (l, (m, stats)), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt = tx.update(g, opt)
        return optax.apply_updates(params, updates), stats, opt, m

    params, stats, opt, m0 = step(params, stats, opt)
    # codebook must receive gradients (commitment term)
    for _ in range(15):
        params, stats, opt, m = step(params, stats, opt)
    assert m["loss"] < m0["loss"]
    assert float(m["perplexity"]) > 1.0  # more than one code in use
    assert not np.allclose(np.asarray(params["quantizer"]["embedding"]),
                           np.asarray(variables["params"]["quantizer"]["embedding"]))


def test_gumbel_quantizer_semantics():
    """Gumbel quantizer: injected-noise formula, KL-to-uniform vs torch
    oracle, codebook combination, deterministic (rng=None) path."""
    import torch

    from avi_talking_tpu.models.flint_vae import GumbelVectorQuantizer

    B, T, K, D = 2, 5, 8, 8
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((B, T, K)).astype(np.float32)
    emb = rng.uniform(-1 / K, 1 / K, (K, D)).astype(np.float32)
    q = GumbelVectorQuantizer(codebook_size=K, vector_dim=D)
    variables = {"params": {"embedding": jnp.asarray(emb)}}

    # deterministic path (no gumbel noise): soft = softmax(logits / tau)
    out = q.apply(variables, jnp.asarray(logits), tau=0.7)
    soft_t = torch.softmax(torch.tensor(logits).view(-1, K) / 0.7, dim=-1)
    zq_t = (soft_t @ torch.tensor(emb)).view(B, T, D)
    np.testing.assert_allclose(np.asarray(out["quantized"]), zq_t.numpy(),
                               atol=1e-6)
    p = torch.full_like(soft_t, 1.0 / K)
    kl_t = (p * (torch.log(p + 1e-10) - torch.log(soft_t + 1e-10))).sum(1).mean()
    np.testing.assert_allclose(float(out["kl_divergence"]), float(kl_t),
                               rtol=1e-5)
    assert out["codes"].shape == (B, T)
    assert float(out["perplexity"]) >= 1.0

    # sampled path: different rngs -> different assignments; grads flow
    o1 = q.apply(variables, jnp.asarray(logits), rng=jax.random.PRNGKey(1))
    o2 = q.apply(variables, jnp.asarray(logits), rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(o1["soft_assignments"]),
                           np.asarray(o2["soft_assignments"]))
    g = jax.grad(lambda l: q.apply(
        variables, l, rng=jax.random.PRNGKey(1))["quantized"].sum())(
            jnp.asarray(logits))
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0

    np.testing.assert_allclose(
        np.asarray(GumbelVectorQuantizer.codebook_entry(
            jnp.asarray(emb), jnp.asarray([0, 3]))),
        emb[[0, 3]], atol=0)
