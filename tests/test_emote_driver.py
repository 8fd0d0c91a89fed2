"""Staged EMOTE training driver: stage transitions, val tagging, early stop.

Reference: inferno's TalkingHead training app (train_talking_head.py run-dir
+ snapshot, training_pass.py checkpoints/EarlyStopping) with staged loss
configuration. Tiny configs; stage 2 flips on the condition-exchange
disentangling and (optionally) neural losses.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avi_talking_tpu.models.conditioning import StyleCondition
from avi_talking_tpu.models.emote import EmoteConfig, EmoteTalkingHead
from avi_talking_tpu.train.emote_driver import EmoteStage, train_emote


@pytest.fixture(scope="module")
def setup():
    cfg = EmoteConfig.tiny()
    head = EmoteTalkingHead(cfg)
    B, T = 2, 2 * cfg.flint.latent_frame_size
    rng = np.random.default_rng(0)
    batch = {
        "raw_audio": jnp.asarray(rng.standard_normal((B, T, 640)).astype(np.float32)),
        "expression": jnp.asarray(np.eye(8, dtype=np.float32)[[1, 5]]),
        "intensity": jnp.asarray(np.eye(3, dtype=np.float32)[[0, 2]]),
        "identity": jnp.asarray(np.eye(32, dtype=np.float32)[[3, 9]]),
        "shape": jnp.zeros((B, cfg.n_shape)),
        "gt_exp": jnp.asarray(
            rng.standard_normal((B, T, cfg.flint.n_exp)).astype(np.float32) * 0.1),
        "gt_jaw": jnp.asarray(
            rng.standard_normal((B, T, 3)).astype(np.float32) * 0.05),
    }
    cond = StyleCondition(batch["expression"], batch["intensity"],
                          batch["identity"], batch["shape"])
    params = head.init(jax.random.PRNGKey(0), batch["raw_audio"], cond)
    return head, params, batch


@pytest.mark.slow
def test_staged_training_runs_and_improves(setup, tmp_path):
    head, params, batch = setup

    def batches():
        while True:
            yield batch

    stages = [
        EmoteStage(name="geometric", steps=6, lr=3e-3),
        EmoteStage(name="disentangled", steps=6, lr=1e-3,
                   disentangle="condition_exchange"),
    ]
    res = train_emote(
        head, params, batches, stages=stages,
        val_batches=lambda: iter([batch]), val_every=3,
        run_dir=str(tmp_path / "run"), log_every=100,
    )
    assert res["total_steps"] == 12
    # val ran in both stages; best/last tagged; cfg snapshot written
    assert len(res["histories"]["geometric"]) == 2
    assert len(res["histories"]["disentangled"]) == 2
    assert (tmp_path / "run" / "cfg.json").exists()
    assert (tmp_path / "run" / "checkpoints" / "best").is_dir()
    assert (tmp_path / "run" / "checkpoints" / "last").is_dir()
    g = res["histories"]["geometric"]
    assert g[-1]["loss"] < g[0]["loss"]  # overfit batch improves
    assert np.isfinite(res["best_val"])


def test_early_stop_inside_stage(setup, tmp_path):
    head, params, batch = setup

    def batches():
        while True:
            yield batch

    # lr=0 -> val can never improve after the first eval -> patience hits
    stages = [EmoteStage(name="frozen", steps=50, lr=0.0)]
    res = train_emote(
        head, params, batches, stages=stages,
        val_batches=lambda: iter([batch]), val_every=2,
        early_stop_patience=2, log_every=1000,
    )
    assert res["total_steps"] < 50
