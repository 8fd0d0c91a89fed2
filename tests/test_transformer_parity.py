"""Numeric parity of ops.transformer blocks vs torch.nn (CPU, float32).

The reference's decoders use torch TransformerEncoder/Decoder layers
(post-LN, packed QKV); these tests import torch-initialised weights into the
linen modules and require <1e-4 max abs deviation, which pins checkpoint
import (infra/torch_compat.py) and forward numerics simultaneously.
"""

import numpy as np
import torch
import torch.nn as nn

from avi_talking_tpu.infra import torch_compat as tc
from avi_talking_tpu.ops import (
    MultiHeadAttention,
    TransformerDecoder,
    TransformerEncoder,
    TransformerEncoderLayer,
)

torch.manual_seed(0)


def test_mha_self_attention_parity():
    d, h, B, T = 64, 4, 2, 9
    t_mha = nn.MultiheadAttention(d, h, batch_first=True)
    x = torch.randn(B, T, d)
    bias = torch.randn(h, T, T)
    with torch.no_grad():
        ref, _ = t_mha(x, x, x, attn_mask=bias.repeat(B, 1, 1), need_weights=False)

    params = {"params": tc.mha_params(t_mha.state_dict(), "")}
    got = MultiHeadAttention(d, h).apply(
        params, x.numpy(), x.numpy(), x.numpy(), bias.numpy()
    )
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_mha_cross_attention_parity():
    d, h, B, T, S = 32, 8, 3, 5, 11
    t_mha = nn.MultiheadAttention(d, h, batch_first=True)
    q = torch.randn(B, T, d)
    kv = torch.randn(B, S, d)
    with torch.no_grad():
        ref, _ = t_mha(q, kv, kv, need_weights=False)
    params = {"params": tc.mha_params(t_mha.state_dict(), "")}
    got = MultiHeadAttention(d, h).apply(params, q.numpy(), kv.numpy(), kv.numpy())
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_encoder_layer_parity_gelu():
    d, h, ff, B, T = 128, 8, 128, 2, 16
    t_layer = nn.TransformerEncoderLayer(
        d_model=d, nhead=h, dim_feedforward=ff, activation="gelu", dropout=0.0,
        batch_first=True,
    ).eval()
    x = torch.randn(B, T, d)
    with torch.no_grad():
        ref = t_layer(x)
    params = {"params": tc.encoder_layer_params(t_layer.state_dict(), "")}
    got = TransformerEncoderLayer(d, h, ff, activation="gelu").apply(params, x.numpy())
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_encoder_stack_parity_with_bias():
    d, h, ff, B, T, L = 64, 4, 128, 2, 10, 3
    layer = nn.TransformerEncoderLayer(
        d_model=d, nhead=h, dim_feedforward=ff, activation="relu", dropout=0.0,
        batch_first=True,
    )
    # .train() with dropout=0 sidesteps torch's eval-mode fused fast path,
    # which mishandles 3D float masks (produces NaN); math is identical.
    t_enc = nn.TransformerEncoder(layer, num_layers=L).train()
    x = torch.randn(B, T, d)
    bias = torch.randn(h, T, T)
    with torch.no_grad():
        ref = t_enc(x, mask=bias.repeat(B, 1, 1))
    params = {"params": tc.encoder_params(t_enc.state_dict(), "", L)}
    got = TransformerEncoder(L, d, h, ff, activation="relu").apply(
        params, x.numpy(), bias.numpy()
    )
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_decoder_stack_parity_with_masks():
    d, h, ff, B, T, S = 64, 4, 128, 2, 6, 6
    layer = nn.TransformerDecoderLayer(
        d_model=d, nhead=h, dim_feedforward=ff, dropout=0.0, batch_first=True
    )
    t_dec = nn.TransformerDecoder(layer, num_layers=1).eval()
    tgt = torch.randn(B, T, d)
    mem = torch.randn(B, S, d)
    tgt_mask = torch.randn(h, T, T)
    # boolean memory mask: True = masked (torch semantics); keep the diagonal
    mem_mask_bool = ~torch.eye(S, dtype=torch.bool)
    with torch.no_grad():
        ref = t_dec(
            tgt, mem, tgt_mask=tgt_mask.repeat(B, 1, 1), memory_mask=mem_mask_bool
        )
    params = {"params": tc.decoder_params(t_dec.state_dict(), "", 1)}
    mem_bias = np.where(mem_mask_bool.numpy(), -1e9, 0.0).astype(np.float32)
    got = TransformerDecoder(1, d, h, ff).apply(
        params, tgt.numpy(), mem.numpy(), tgt_mask.numpy(), mem_bias
    )
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-5)
