"""import_prior_checkpoint mapping vs a synthetic reference-layout .pth.

Builds a torch checkpoint with EXACTLY the reference driver's layout
(model_state_dict = voxel2clip.* BrainNetwork + net.* dalle2 prior —
train_diffusion_prior.py:160-168, dalle2 module naming), imports it, and
checks (a) the trees load into our modules, (b) BrainNetwork numerics match
torch, (c) the prior net runs finitely with the imported weights.
"""

import numpy as np
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from avi_talking_tpu.infra.checkpoint import import_prior_checkpoint
from avi_talking_tpu.models import BrainNetwork
from avi_talking_tpu.models.prior_transformer import PriorTransformerNetwork


def _brain_sd(h=64, in_dim=24, out_dim=16):
    sd = {}
    torch.manual_seed(0)
    sd["lin0.0.weight"] = torch.randn(h, in_dim)
    sd["lin0.0.bias"] = torch.randn(h)
    sd["lin0.1.weight"] = torch.randn(h)
    sd["lin0.1.bias"] = torch.randn(h)
    for i in range(2):
        sd[f"mlp.{i}.0.weight"] = torch.randn(h, h)
        sd[f"mlp.{i}.0.bias"] = torch.randn(h)
        sd[f"mlp.{i}.1.weight"] = torch.randn(h)
        sd[f"mlp.{i}.1.bias"] = torch.randn(h)
    sd["lin1.weight"] = torch.randn(out_dim, h)
    sd["lin1.bias"] = torch.randn(out_dim)
    widths = [(out_dim, 2048), (2048, 2048), (2048, out_dim)]
    lin_idx = [2, 5, 8]
    norm_idx = [0, 3, 6]
    norm_widths = [out_dim, 2048, 2048]
    for idx, w in zip(norm_idx, norm_widths):
        sd[f"projector.{idx}.weight"] = torch.randn(w)
        sd[f"projector.{idx}.bias"] = torch.randn(w)
    for idx, (i_w, o_w) in zip(lin_idx, widths):
        sd[f"projector.{idx}.weight"] = torch.randn(o_w, i_w)
        sd[f"projector.{idx}.bias"] = torch.randn(o_w)
    return sd


def _prior_sd(dim=16, depth=2, heads=2, dim_head=8):
    torch.manual_seed(1)
    sd = {
        "null_brain_embeds": torch.randn(1, dim),
        "null_image_embed": torch.randn(1, dim),
        "learned_query": torch.randn(1, dim),
        "to_time_embeds.0.1.net.0.0.weight": torch.randn(2 * dim, dim),
        "to_time_embeds.0.1.net.0.0.bias": torch.randn(2 * dim),
        "to_time_embeds.0.1.net.1.0.weight": torch.randn(2 * dim, 2 * dim),
        "to_time_embeds.0.1.net.1.0.bias": torch.randn(2 * dim),
        "to_time_embeds.0.1.net.2.weight": torch.randn(dim, 2 * dim),
        "to_time_embeds.0.1.net.2.bias": torch.randn(dim),
        "causal_transformer.rel_pos_bias.relative_attention_bias.weight":
            torch.randn(32, heads),
        "causal_transformer.norm.g": torch.randn(dim),
        "causal_transformer.project_out.weight": torch.randn(dim, dim),
    }
    inner = heads * dim_head
    for i in range(depth):
        ap = f"causal_transformer.layers.{i}.0."
        sd[f"{ap}norm.g"] = torch.randn(dim)
        sd[f"{ap}null_kv"] = torch.randn(2, dim_head)
        sd[f"{ap}to_q.weight"] = torch.randn(inner, dim)
        sd[f"{ap}to_kv.weight"] = torch.randn(2 * dim_head, dim)
        sd[f"{ap}to_out.0.weight"] = torch.randn(dim, inner)
        sd[f"{ap}to_out.1.g"] = torch.randn(dim)
        fp = f"causal_transformer.layers.{i}.1."
        sd[f"{fp}0.g"] = torch.randn(dim)
        sd[f"{fp}1.weight"] = torch.randn(dim * 8, dim)
        sd[f"{fp}5.weight"] = torch.randn(dim, dim * 4)
    return sd


def test_import_prior_checkpoint(tmp_path):
    sd = {}
    for k, v in _brain_sd().items():
        sd[f"voxel2clip.{k}"] = v
    for k, v in _prior_sd().items():
        sd[f"net.{k}"] = v
    path = str(tmp_path / "last.pth")
    torch.save({"epoch": 3, "model_state_dict": sd}, path)

    loaded = import_prior_checkpoint(path)

    # BrainNetwork: imported params reproduce torch numerics
    bn = BrainNetwork(out_dim=16, in_dim=24, clip_size=16, hidden=64, n_blocks=2)
    x = np.random.default_rng(0).standard_normal((2, 24)).astype(np.float32)
    out, proj = bn.apply(loaded["brain"], x)
    assert out.shape == (2, 16) and proj.shape == (2, 1, 16)

    with torch.no_grad():
        t = torch.from_numpy(x)
        h = torch.nn.functional.linear(t, sd["voxel2clip.lin0.0.weight"],
                                       sd["voxel2clip.lin0.0.bias"])
        h = torch.nn.functional.layer_norm(
            h, (64,), sd["voxel2clip.lin0.1.weight"], sd["voxel2clip.lin0.1.bias"]
        )
        h = torch.nn.functional.gelu(h)
        res = h
        for i in range(2):
            g = torch.nn.functional.linear(h, sd[f"voxel2clip.mlp.{i}.0.weight"],
                                           sd[f"voxel2clip.mlp.{i}.0.bias"])
            g = torch.nn.functional.layer_norm(
                g, (64,), sd[f"voxel2clip.mlp.{i}.1.weight"],
                sd[f"voxel2clip.mlp.{i}.1.bias"])
            g = torch.nn.functional.gelu(g)
            h = g + res
            res = h
        ref = torch.nn.functional.linear(h, sd["voxel2clip.lin1.weight"],
                                         sd["voxel2clip.lin1.bias"]).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)

    # prior net: imported params drive a finite forward
    net = PriorTransformerNetwork(dim=16, num_tokens=1, depth=2, heads=2,
                                  dim_head=8)
    pred = net.apply(
        loaded["prior"],
        jnp.ones((2, 1, 16)),
        jnp.asarray([1, 5]),
        jnp.ones((2, 16)),
    )
    assert pred.shape == (2, 1, 16)
    assert np.isfinite(np.asarray(pred)).all()


def _write_reference_pth(tmp_path):
    sd = {}
    sd.update({f"voxel2clip.{k}": v for k, v in _brain_sd().items()})
    sd.update({f"net.{k}": v for k, v in _prior_sd().items()})
    path = str(tmp_path / "last.pth")
    torch.save({"epoch": 1, "model_state_dict": sd}, path)
    return path


def test_cli_import_prior(tmp_path, monkeypatch):
    """`cli import-prior` converts a reference-layout .pth into an orbax
    checkpoint that restores to the same variables. A tokenizer vocab is
    made discoverable (env var) so the real-weights-need-real-vocab guard
    stays quiet — the guard itself is covered below."""
    import pathlib

    import avi_talking_tpu.text as _text
    from avi_talking_tpu.cli import main
    from avi_talking_tpu.infra.checkpoint import (
        import_prior_checkpoint,
        restore_checkpoint,
    )

    vocab_dir = pathlib.Path(_text.__file__).parent / "default_vocab"
    monkeypatch.setenv("AVI_TALKING_CLIP_TOKENIZER", str(vocab_dir))
    path = _write_reference_pth(tmp_path)
    out = str(tmp_path / "orbax")
    assert main(["import-prior", "--pth", path, "--out", out]) == 0
    ref = import_prior_checkpoint(path)
    got = restore_checkpoint(out, target=ref)
    import jax

    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_cli_import_prior_requires_vocab(tmp_path, monkeypatch):
    """Without any discoverable CLIP vocab (env/assets/HF cache all severed)
    import-prior still WRITES the checkpoint but exits nonzero with the
    import-clip instruction — real prior weights + a non-CLIP tokenizer
    produce garbage ids (reference models/diffusion_prior.py:36-44)."""
    import pytest

    from avi_talking_tpu.cli import main
    from avi_talking_tpu.infra.checkpoint import (
        import_prior_checkpoint,
        restore_checkpoint,
    )

    monkeypatch.delenv("AVI_TALKING_CLIP_TOKENIZER", raising=False)
    monkeypatch.setattr(
        "avi_talking_tpu.cli.importers._discover_tokenizer",
        lambda: None)
    path = _write_reference_pth(tmp_path)
    out = str(tmp_path / "orbax")
    with pytest.raises(SystemExit, match="import-clip"):
        main(["import-prior", "--pth", path, "--out", out])
    # the orbax checkpoint was written before the guard fired
    ref = import_prior_checkpoint(path)
    got = restore_checkpoint(out, target=ref)
    assert len(jax.tree.leaves(got)) == len(jax.tree.leaves(ref))
