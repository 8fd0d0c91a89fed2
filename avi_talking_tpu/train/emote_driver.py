"""Runnable EMOTE training driver: stages, val, early stop, run dirs.

The reference trains EMOTE through inferno's Lightning app
(inferno_apps/TalkingHead/training/train_talking_head.py: run-dir +
cfg snapshot :503-509; training_pass.py: checkpoint callbacks :281-307,
EarlyStopping :309-315) in configuration stages — geometric supervision
first, then the neural perceptual losses switch on (the
bertprior_wild*.yaml family toggles lip/emotion/video-emotion terms).

TPU-native equivalent: one jitted dp/tp train step per stage
(train.talking_head.TalkingHeadTrainer), stages expressed as data
(``EmoteStage``), orbax best/last tagging on the val loss, and
infra.run_dir for run management.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Iterator, List, Optional

import jax
import numpy as np
import optax

from ..infra import checkpoint as ckpt_lib
from ..infra.meters import set_summary_writer, write_metrics
from ..infra.run_dir import EarlyStopping, snapshot_config
from ..models.emote import EmoteTalkingHead
from .talking_head import NeuralLosses, TalkingHeadTrainer


@dataclasses.dataclass
class EmoteStage:
    """One training stage: step budget + loss configuration."""

    name: str
    steps: int
    lr: float = 1e-4
    exp_weight: float = 1.0
    jaw_weight: float = 1.0
    vertex_weight: float = 1.0
    velocity_weight: float = 10.0
    use_neural: bool = False  # lip-reading / EmoNet / video-emotion terms
    disentangle: Optional[str] = None  # "condition_exchange" in stage 2


DEFAULT_STAGES = (
    EmoteStage(name="geometric", steps=1000),
    EmoteStage(name="perceptual", steps=1000, lr=5e-5, use_neural=True,
               disentangle="condition_exchange"),
)


def train_emote(
    head: EmoteTalkingHead,
    params,
    batches: Callable[[], Iterator[Dict[str, Any]]],
    stages: List[EmoteStage] = list(DEFAULT_STAGES),
    neural: Optional[NeuralLosses] = None,
    val_batches: Optional[Callable[[], Iterator[Dict[str, Any]]]] = None,
    val_every: int = 0,
    early_stop_patience: int = 0,
    run_dir: Optional[str] = None,
    mesh=None,
    log_every: int = 50,
    seed: int = 0,
) -> Dict[str, Any]:
    """Run the staged loop; returns final params + per-stage histories."""
    import jax.numpy as jnp

    if run_dir is not None:
        import os

        os.makedirs(run_dir, exist_ok=True)
        snapshot_config(run_dir, {"stages": stages, "val_every": val_every})
        set_summary_writer(os.path.join(run_dir, "logs"))
    rng = jax.random.PRNGKey(seed)
    # the step donates (params, opt_state); copy at entry so donation only
    # ever consumes driver-owned buffers, never the caller's params
    params = jax.tree.map(jnp.copy, params)
    best_val = float("inf")
    histories: Dict[str, List[Dict[str, float]]] = {}
    step_total = 0

    for stage in stages:
        tx = optax.adamw(stage.lr)
        trainer = TalkingHeadTrainer(
            head=head, tx=tx,
            exp_weight=stage.exp_weight, jaw_weight=stage.jaw_weight,
            vertex_weight=stage.vertex_weight,
            velocity_weight=stage.velocity_weight,
            neural=neural if stage.use_neural else None,
            disentangle=stage.disentangle,
        )
        step_fn = trainer.jitted_train_step(mesh=mesh, donate=True)
        eval_fn = jax.jit(lambda p, b, r: trainer.loss_fn(p, b, r)[1])
        opt_state = tx.init(params)
        stopper = (EarlyStopping(patience=early_stop_patience)
                   if early_stop_patience else None)
        hist: List[Dict[str, float]] = []
        it = batches()
        t0 = time.time()
        for i in range(stage.steps):
            try:
                batch = next(it)
            except StopIteration:
                it = batches()
                batch = next(it)
            params, opt_state, metrics = step_fn(
                params, opt_state, batch, jax.random.fold_in(rng, step_total)
            )
            step_total += 1
            if (i + 1) % log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                write_metrics(metrics, step=step_total,
                              prefix=f"emote/{stage.name}/")
                if jax.process_index() == 0:
                    rate = (i + 1) / (time.time() - t0)
                    print(f"[{stage.name}] step {i + 1}/{stage.steps}: "
                          f"loss={m['loss']:.4f} ({rate:.1f} it/s)")
            if val_every and val_batches is not None and (i + 1) % val_every == 0:
                sums: Dict[str, float] = {}
                n = 0
                for vb in val_batches():
                    vm = eval_fn(params, vb, jax.random.fold_in(rng, 10**6 + n))
                    for k, v in vm.items():
                        sums[k] = sums.get(k, 0.0) + float(v)
                    n += 1
                val = {k: v / max(n, 1) for k, v in sums.items()}
                write_metrics(val, step=step_total,
                              prefix=f"emote_val/{stage.name}/")
                hist.append({"step": step_total, **val})
                if run_dir and jax.process_index() == 0:
                    if val["loss"] < best_val:
                        best_val = val["loss"]
                        ckpt_lib.save_checkpoint(
                            f"{run_dir}/checkpoints/best",
                            {"params": params,
                             "step": jnp.asarray(step_total)},
                        )
                    ckpt_lib.save_checkpoint(
                        f"{run_dir}/checkpoints/last",
                        {"params": params, "step": jnp.asarray(step_total)},
                    )
                if stopper is not None and stopper.update(val["loss"]):
                    if jax.process_index() == 0:
                        print(f"[{stage.name}] early stop at step {i + 1}")
                    break
        histories[stage.name] = hist
    return {"params": params, "histories": histories, "best_val": best_val,
            "total_steps": step_total}
