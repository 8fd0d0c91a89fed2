"""infra: config roundtrip, orbax checkpoint roundtrip, meters, importer."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from avi_talking_tpu.infra.config import (
    apply_overrides,
    from_dict,
    load_config,
    save_config,
    to_dict,
)
from avi_talking_tpu.infra import checkpoint as ckpt
from avi_talking_tpu.infra.meters import Meter, set_summary_writer, write_metrics
from avi_talking_tpu.models.emote import EmoteConfig
from avi_talking_tpu.pipeline import PipelineConfig


def test_config_roundtrip(tmp_path):
    cfg = PipelineConfig.tiny()
    p = str(tmp_path / "cfg.json")
    save_config(cfg, p)
    loaded = load_config(PipelineConfig, p)
    assert to_dict(loaded) == to_dict(cfg)


def test_config_overrides():
    cfg = EmoteConfig.tiny()
    cfg2 = apply_overrides(cfg, ["feature_dim=64", "flint.quant_factor=3"])
    assert cfg2.feature_dim == 64
    assert cfg2.flint.quant_factor == 3
    try:
        apply_overrides(cfg, ["nonexistent=1"])
        assert False
    except KeyError:
        pass


def test_orbax_roundtrip(tmp_path):
    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)},
        "step": jnp.asarray(7),
    }
    path = str(tmp_path / "ckpt")
    ckpt.save_checkpoint(path, state)
    restored = ckpt.restore_checkpoint(path, target=jax.tree.map(np.zeros_like, state))
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]),
                               np.arange(6.0).reshape(2, 3))
    assert int(restored["step"]) == 7


def test_meters(tmp_path):
    set_summary_writer(str(tmp_path))
    m = Meter("train/loss")
    m.write(1.0)
    m.write(jnp.asarray(3.0))
    m.write(float("nan"))  # NaN guard: skipped
    m.flush(step=5)
    write_metrics({"a": jnp.asarray(2.0)}, step=6)
    log = (tmp_path / "scalars.jsonl").read_text().strip().splitlines()
    assert any('"train/loss": 2.0' in l for l in log)
    assert any('"a": 2.0' in l for l in log)


def test_brain_importer_matches_torch_layout():
    import torch.nn as tnn
    from functools import partial
    import torch

    # reconstruct the reference BrainNetwork layout in torch and import it
    torch.manual_seed(0)
    h, in_dim, out_dim = 64, 24, 16
    lin0 = tnn.Sequential(tnn.Linear(in_dim, h), tnn.LayerNorm(h), tnn.GELU(), tnn.Dropout(0.5))
    mlp = tnn.ModuleList([
        tnn.Sequential(tnn.Linear(h, h), tnn.LayerNorm(h), tnn.GELU(), tnn.Dropout(0.15))
        for _ in range(2)
    ])
    lin1 = tnn.Linear(h, out_dim)
    projector = tnn.Sequential(
        tnn.LayerNorm(out_dim), tnn.GELU(), tnn.Linear(out_dim, 2048),
        tnn.LayerNorm(2048), tnn.GELU(), tnn.Linear(2048, 2048),
        tnn.LayerNorm(2048), tnn.GELU(), tnn.Linear(2048, out_dim),
    )
    model = tnn.ModuleDict({"lin0": lin0, "lin1": lin1, "projector": projector})
    model["mlp"] = mlp
    sd = model.state_dict()

    params = ckpt._brain_from_torch(sd)
    from avi_talking_tpu.models import BrainNetwork

    bn = BrainNetwork(out_dim=out_dim, in_dim=in_dim, clip_size=out_dim,
                      hidden=h, n_blocks=2)
    x = np.random.default_rng(0).standard_normal((3, in_dim)).astype(np.float32)
    got, proj = bn.apply({"params": params}, x)

    model.eval()
    with torch.no_grad():
        t = torch.from_numpy(x)
        tx = lin0(t)
        res = tx
        for blk in mlp:
            tx = blk(tx) + res
            res = tx
        ref = lin1(tx)
        ref_proj = projector(ref.reshape(len(ref), -1, out_dim))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(proj), ref_proj.numpy(), rtol=1e-4, atol=1e-5)
