"""infra: config roundtrip, orbax checkpoint roundtrip, meters, importer."""

import pytest
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


def test_run_dir_and_config_snapshot(tmp_path):
    """Run-dir management (train_talking_head.py:432-453, :503-509): timestamped
    dir, cfg snapshot, .bak backup on re-snapshot."""
    import dataclasses

    from avi_talking_tpu.infra.run_dir import (
        create_run_dir,
        load_config_snapshot,
        snapshot_config,
    )

    @dataclasses.dataclass
    class Cfg:
        lr: float = 1e-4
        name: str = "exp"

    rd = create_run_dir(tmp_path, "myexp", Cfg())
    assert rd.name.endswith("_myexp") and (rd / "checkpoints").is_dir()
    snap = load_config_snapshot(rd)
    assert snap == {"lr": 1e-4, "name": "exp"}
    snapshot_config(rd, Cfg(lr=5e-5))
    assert (rd / "cfg.json.bak").exists()
    assert load_config_snapshot(rd)["lr"] == 5e-5


def test_early_stopping():
    from avi_talking_tpu.infra.run_dir import EarlyStopping

    es = EarlyStopping(patience=2)
    assert not es.update(1.0)
    assert not es.update(0.9)   # improved
    assert not es.update(0.95)  # bad 1
    assert es.update(0.95)      # bad 2 -> stop
    assert es.stopped


@pytest.mark.slow
def test_train_prior_early_stop_and_run_dir(tmp_path):
    """Early stopping halts before total_steps on a stagnant val metric, and
    run_dir wires logs/ + checkpoints/ + cfg snapshot."""
    import numpy as np

    from avi_talking_tpu.train.driver import PriorTrainingConfig, train_prior

    def constant_val():
        # deterministic constant stream -> val loss can't improve after the
        # first eval (well, it can slightly; patience=1 stops fast anyway)
        def gen():
            rng = np.random.default_rng(0)
            for _ in range(2):
                yield {"voxel": np.zeros((4, 24), np.float32),
                       "style_target": rng.standard_normal((4, 16)).astype(np.float32)}
        return gen()

    cfg = PriorTrainingConfig(
        clip_size=16, in_dim=24, depth=1, heads=2, dim_head=8, timesteps=5,
        brain_hidden=32, total_steps=200, batch_size=4, log_every=1000,
        val_every=5, val_steps=2, early_stop_patience=1,
    )
    rd = tmp_path / "run"
    res = train_prior(cfg, run_dir=str(rd), val_batches=constant_val)
    assert int(res["state"].step) < 200  # stopped early
    assert (rd / "cfg.json").exists()
    assert (rd / "checkpoints" / "last").is_dir()
