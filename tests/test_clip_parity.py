"""Parity of models.clip_text vs HF torch CLIPTextModel (tiny random config)."""

import numpy as np
import pytest
import torch

from avi_talking_tpu.models import (
    ClipTextConfig,
    ClipTextModel,
    clip_text_params_from_torch,
)

transformers = pytest.importorskip("transformers")


def test_clip_text_parity():
    cfg = ClipTextConfig.tiny()
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act="quick_gelu",
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.CLIPTextModel(hf_cfg).eval()

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (2, cfg.max_position_embeddings))
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids)).last_hidden_state.numpy()

    model = ClipTextModel(cfg)
    params = {"params": clip_text_params_from_torch(hf.state_dict(), cfg)}
    got = np.asarray(model.apply(params, ids.astype(np.int32)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
