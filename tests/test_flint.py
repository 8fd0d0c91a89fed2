"""FLINT decoder: upsampling-stage parity vs torch ops + end-to-end shape."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from avi_talking_tpu.infra import torch_compat as tc
from avi_talking_tpu.models import FlintConfig, FlintDecoder


def test_conv_transpose_matches_torch():
    """flax ConvTranspose(padding=((3,2))) == torch ConvTranspose1d(k5,s2,p2,op1)."""
    torch.manual_seed(0)
    tconv = nn.ConvTranspose1d(8, 8, 5, stride=2, padding=2, output_padding=1)
    x = torch.randn(2, 8, 12)  # (B, C, L)
    with torch.no_grad():
        ref = tconv(x).numpy().transpose(0, 2, 1)  # (B, 2L, C)

    import flax.linen as fnn

    conv = fnn.ConvTranspose(features=8, kernel_size=(5,), strides=(2,),
                             padding=((2, 3),), transpose_kernel=True)
    params = {"params": tc.conv_transpose1d_params(tconv.state_dict(), "")}
    got = np.asarray(conv.apply(params, x.numpy().transpose(0, 2, 1)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_replicate_pad_conv_matches_torch():
    torch.manual_seed(1)
    tconv = nn.Conv1d(8, 8, 5, stride=1, padding=2, padding_mode="replicate")
    x = torch.randn(2, 8, 10)
    with torch.no_grad():
        ref = tconv(x).numpy().transpose(0, 2, 1)

    import flax.linen as fnn

    conv = fnn.Conv(features=8, kernel_size=(5,), padding="VALID")
    params = {"params": tc.conv1d_params(tconv.state_dict(), "")}
    xin = x.numpy().transpose(0, 2, 1)
    pad = np.concatenate([xin[:, :1]] * 2 + [xin] + [xin[:, -1:]] * 2, axis=1)
    got = np.asarray(conv.apply(params, pad))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_flint_decoder_shapes_and_upsampling():
    cfg = FlintConfig(feature_dim=16, bottleneck_dim=16, quant_factor=3,
                      nhead=4, intermediate_size=32, out_dim=9, n_exp=6)
    dec = FlintDecoder(cfg)
    latents = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 4, 16)).astype(np.float32)
    )
    variables = dec.init(jax.random.PRNGKey(0), latents)
    out = dec.apply(variables, latents)
    # 4 latent frames * 2**3 = 32 output frames
    assert out.shape == (2, 32, 9)
    exp, jaw = dec.split_exp_jaw(out)
    assert exp.shape == (2, 32, 6) and jaw.shape == (2, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_flint_jit():
    cfg = FlintConfig(feature_dim=16, bottleneck_dim=16, quant_factor=2,
                      nhead=4, intermediate_size=32)
    dec = FlintDecoder(cfg)
    latents = jnp.zeros((1, 8, 16))
    variables = dec.init(jax.random.PRNGKey(0), latents)
    out = jax.jit(lambda v, l: dec.apply(v, l))(variables, latents)
    assert out.shape == (1, 32, 53)
