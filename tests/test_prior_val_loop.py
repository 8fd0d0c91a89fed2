"""Prior training val loop: retrieval metrics, best/last tagging, resume.

Reference: train_diffusion_prior.py:517-624 — per-epoch validation with
fwd/bwd retrieval accuracy, annealed NCE temp, 'best' saved only when mean
val loss improves, 'last' saved every validation, resume from 'last'.

One shared training run backs the metric/tagging assertions (jit compile of
the tiny step dominates wall time; ~30s/run on CPU).
"""

import json

import numpy as np
import pytest

from avi_talking_tpu.train.driver import (
    PriorTrainingConfig,
    synthetic_batches,
    train_prior,
)


def tiny_cfg(**kw):
    base = dict(
        clip_size=16, in_dim=24, depth=1, heads=2, dim_head=8, timesteps=5,
        brain_hidden=32, total_steps=40, batch_size=8, log_every=100,
        val_every=10, val_steps=2,
    )
    base.update(kw)
    return PriorTrainingConfig(**base)


@pytest.fixture(scope="module")
def run(tmp_path_factory):
    root = tmp_path_factory.mktemp("prior_val")
    res = train_prior(
        tiny_cfg(), logdir=str(root / "log"), ckpt_dir=str(root / "ck")
    )
    return root, res


def test_val_loop_metrics_and_tags(run):
    root, res = run
    ckpt = root / "ck"
    assert [v["step"] for v in res["val_history"]] == [10, 20, 30, 40]
    for v in res["val_history"]:
        for k in ("loss", "loss_nce", "loss_prior", "top1_fwd", "top1_bwd",
                  "cosine_sim"):
            assert k in v and np.isfinite(v[k]), (k, v)
    assert (ckpt / "best").is_dir() and (ckpt / "last").is_dir()
    assert res["best_ckpt"].endswith("best")
    losses = [v["loss"] for v in res["val_history"]]
    assert res["best_val_loss"] == pytest.approx(min(losses), rel=1e-6)
    # val metrics JSONL written
    lines = [json.loads(l) for p in (root / "log").rglob("*.jsonl")
             for l in open(p)]
    assert any(any(k.startswith("prior_val/") for k in l) for l in lines)


def test_best_ckpt_is_the_best_validation(run):
    """'best' must hold the step whose val loss was minimal, in the
    graft-compatible {"params", "step"} layout."""
    root, res = run
    from avi_talking_tpu.infra.checkpoint import restore_checkpoint

    best = restore_checkpoint(str(root / "ck" / "best"))
    assert set(best.keys()) == {"params", "step"}
    losses = [v["loss"] for v in res["val_history"]]
    best_idx = losses.index(min(losses))
    assert int(np.asarray(best["step"])) == res["val_history"][best_idx]["step"]


def test_resume_from_last(run):
    root, res1 = run
    cfg2 = tiny_cfg(resume=True)
    more = synthetic_batches(cfg2.batch_size, 10, cfg2.in_dim, cfg2.clip_size,
                             seed=7)
    res2 = train_prior(cfg2, batches=more, ckpt_dir=str(root / "ck"))
    assert int(res2["state"].step) == 50  # continued, not restarted
    assert res2["val_history"][0]["step"] == 50
    assert res2["best_val_loss"] <= res1["best_val_loss"] + 1e-9


def test_no_val_keeps_legacy_ckpt_layout(tmp_path):
    cfg = tiny_cfg(val_every=0, total_steps=3)
    ckpt = tmp_path / "legacy"
    res = train_prior(cfg, ckpt_dir=str(ckpt))
    assert res["val_history"] == []
    from avi_talking_tpu.infra.checkpoint import restore_checkpoint

    st = restore_checkpoint(str(ckpt))
    assert set(st.keys()) == {"params", "step"}
