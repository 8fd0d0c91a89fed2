"""Parity of bias/PE construction with the reference's torch buffer math.

Each test re-implements the reference's table construction in torch/numpy
(from its published formulas: /root/reference/models/faceformer.py:51-102)
and compares against our on-the-fly jnp versions.
"""

import math

import numpy as np
import torch

from avi_talking_tpu.ops import (
    enc_dec_alignment_bias,
    faceformer_bias,
    periodic_positional_encoding,
    sinusoidal_positional_encoding,
)
from avi_talking_tpu.ops.positional import NEG_INF, alibi_slopes


def torch_init_biased_mask(n_head, max_seq_len, period):
    # Same math as the reference's init_biased_mask (faceformer.py:51-72).
    def get_slopes(n):
        def pow2(n):
            start = 2 ** (-(2 ** -(math.log2(n) - 3)))
            return [start * start**i for i in range(n)]

        if math.log2(n).is_integer():
            return pow2(n)
        closest = 2 ** math.floor(math.log2(n))
        return pow2(closest) + get_slopes(2 * closest)[0::2][: n - closest]

    slopes = torch.Tensor(get_slopes(n_head))
    bias = (
        torch.arange(start=0, end=max_seq_len, step=period)
        .unsqueeze(1)
        .repeat(1, period)
        .view(-1)
        // period
    )
    bias = -torch.flip(bias, dims=[0])
    alibi = torch.zeros(max_seq_len, max_seq_len)
    for i in range(max_seq_len):
        alibi[i, : i + 1] = bias[-(i + 1):]
    alibi = slopes.unsqueeze(1).unsqueeze(1) * alibi.unsqueeze(0)
    mask = (torch.triu(torch.ones(max_seq_len, max_seq_len)) == 1).transpose(0, 1)
    mask = mask.float().masked_fill(mask == 0, float("-inf")).masked_fill(mask == 1, 0.0)
    return mask.unsqueeze(0) + alibi


def test_faceformer_bias_matches_reference_table():
    for heads, period, T in [(4, 25, 40), (8, 30, 33), (6, 30, 12)]:
        ref = torch_init_biased_mask(heads, T, period).numpy()
        got = np.asarray(faceformer_bias(heads, T, period))
        finite = np.isfinite(ref)
        np.testing.assert_allclose(got[finite], ref[finite], rtol=1e-6, atol=1e-6)
        # -inf cells must be <= our finite NEG_INF stand-in
        assert (got[~finite] <= NEG_INF).all()


def test_alibi_slopes_non_pow2():
    s = alibi_slopes(6)
    assert s.shape == (6,)
    assert (s > 0).all() and (np.diff(s[:4]) < 0).all()


def test_enc_dec_alignment():
    b = np.asarray(enc_dec_alignment_bias(4, 8, frames_per_step=2))
    for i in range(4):
        for j in range(8):
            expected = 0.0 if (2 * i <= j < 2 * i + 2) else NEG_INF
            assert b[i, j] == expected
    b1 = np.asarray(enc_dec_alignment_bias(5, 5, frames_per_step=1))
    assert (np.diag(b1) == 0).all()
    assert (b1[~np.eye(5, dtype=bool)] == NEG_INF).all()


def torch_ppe_table(d_model, period, max_seq_len):
    # PeriodicPositionalEncoding buffer math (faceformer.py:87-99).
    pe = torch.zeros(period, d_model)
    position = torch.arange(0, period, dtype=torch.float).unsqueeze(1)
    div_term = torch.exp(
        torch.arange(0, d_model, 2).float() * (-math.log(10000.0) / d_model)
    )
    pe[:, 0::2] = torch.sin(position * div_term)
    pe[:, 1::2] = torch.cos(position * div_term)
    pe = pe.unsqueeze(0)
    repeat_num = (max_seq_len // period) + 1
    return pe.repeat(1, repeat_num, 1)[0]


def test_periodic_pe_matches_reference():
    for d, period, T in [(64, 25, 70), (128, 30, 30), (32, 30, 7)]:
        ref = torch_ppe_table(d, period, T)[:T].numpy()
        got = np.asarray(periodic_positional_encoding(T, d, period))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_sinusoidal_pe_shape():
    pe = sinusoidal_positional_encoding(10, 16)
    assert pe.shape == (10, 16)
    np.testing.assert_allclose(np.asarray(pe[0, 0::2]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(pe[0, 1::2]), 1.0, atol=1e-7)
