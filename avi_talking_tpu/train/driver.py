"""Runnable training drivers (the train_diffusion_prior.py `trainer()`
equivalent): prior training and FLINT-VAE training loops with metering,
checkpointing and DP sharding.

Data contract for prior training (mirrors prepare_train_data,
train_diffusion_prior.py:172-197): each batch needs
  voxel        (B, 768)  CLIP text embedding means
  style_target (B, 128)  frozen-EMOTE style embeddings (clip_target)
Batches come from any iterator; `synthetic_batches` provides a structured
random stream so the loop runs end to end without the external corpora.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..infra import checkpoint as ckpt_lib
from ..infra.meters import set_summary_writer, write_metrics
from ..models.brain import BrainNetwork
from ..models.diffusion import DiffusionPrior, NoiseScheduler
from ..models.prior_transformer import PriorTransformerNetwork
from .losses import cosine_anneal
from .prior import PriorTrainState, PriorTrainer, make_prior_optimizer


def synthetic_batches(
    batch_size: int, steps: int, in_dim: int = 768, style_dim: int = 128,
    n_styles: int = 64, seed: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """Structured random (voxel, style) pairs: a fixed codebook of styles,
    voxels = noisy projections — enough signal for retrieval metrics to
    move, no external data needed."""
    rng = np.random.default_rng(seed)
    styles = rng.standard_normal((n_styles, style_dim)).astype(np.float32)
    proj = rng.standard_normal((style_dim, in_dim)).astype(np.float32) / np.sqrt(style_dim)
    for _ in range(steps):
        idx = rng.integers(0, n_styles, batch_size)
        s = styles[idx]
        v = s @ proj + rng.standard_normal((batch_size, in_dim)).astype(np.float32) * 0.1
        yield {"voxel": v, "style_target": s}


@dataclasses.dataclass
class PriorTrainingConfig:
    clip_size: int = 128
    in_dim: int = 768
    depth: int = 6
    heads: int = 8
    dim_head: int = 64
    timesteps: int = 100
    brain_hidden: int = 4096
    max_lr: float = 1e-4
    total_steps: int = 1000
    batch_size: int = 256
    log_every: int = 50
    nce_temp_start: float = 0.004
    nce_temp_end: float = 0.0075
    # validation loop (reference runs val each epoch and tags best/last,
    # train_diffusion_prior.py:517-624); 0 disables
    val_every: int = 0
    val_steps: int = 4  # batches per validation pass
    resume: bool = False  # restore <ckpt_dir>/last before training
    # stop after N consecutive validations without val-loss improvement
    # (0 = off; training_pass.py:309-315 EarlyStopping semantics)
    early_stop_patience: int = 0


def train_prior(
    cfg: PriorTrainingConfig,
    batches: Optional[Iterator[Dict[str, np.ndarray]]] = None,
    logdir: Optional[str] = None,
    ckpt_dir: Optional[str] = None,
    mesh=None,
    seed: int = 0,
    val_batches=None,  # Callable[[], Iterator[batch]] -- re-iterable val split
    run_dir: Optional[str] = None,  # create/use a managed run dir (cfg
    # snapshot + logs/ + checkpoints/; infra.run_dir)
) -> Dict[str, Any]:
    """Run the prior training loop; returns final state + last metrics.

    With ``cfg.val_every`` > 0 the loop validates every N steps on
    ``val_batches()`` (retrieval metrics + losses at the current annealed
    NCE temp, no grads), writes them under ``prior_val/``, saves
    ``<ckpt_dir>/last`` each validation and tags ``<ckpt_dir>/best`` when
    the mean val loss improves — the reference's per-epoch val + best/last
    checkpointing (train_diffusion_prior.py:517-624). ``cfg.resume``
    restores params/opt/step/best from ``last``.
    """
    if run_dir is not None:
        from ..infra.run_dir import snapshot_config

        os.makedirs(run_dir, exist_ok=True)
        snapshot_config(run_dir, cfg)
        logdir = logdir or os.path.join(run_dir, "logs")
        ckpt_dir = ckpt_dir or os.path.join(run_dir, "checkpoints")
    if logdir:
        set_summary_writer(logdir)
    if batches is None:
        batches = synthetic_batches(cfg.batch_size, cfg.total_steps,
                                    cfg.in_dim, cfg.clip_size, seed=seed)
    if val_batches is None and cfg.val_every:
        val_batches = lambda: synthetic_batches(  # noqa: E731
            cfg.batch_size, cfg.val_steps, cfg.in_dim, cfg.clip_size,
            seed=seed + 99_991,  # disjoint stream from training
        )

    rng = jax.random.PRNGKey(seed)
    brain = BrainNetwork(out_dim=cfg.clip_size, in_dim=cfg.in_dim,
                         clip_size=cfg.clip_size, hidden=cfg.brain_hidden)
    net = PriorTransformerNetwork(dim=cfg.clip_size, depth=cfg.depth,
                                  heads=cfg.heads, dim_head=cfg.dim_head)
    params = {
        "brain": brain.init(rng, jnp.zeros((1, cfg.in_dim))),
        "prior": net.init(
            rng, jnp.zeros((1, 1, cfg.clip_size)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, cfg.clip_size)),
        ),
    }
    prior = DiffusionPrior(net=net, scheduler=NoiseScheduler.create(cfg.timesteps))
    tx, sched = make_prior_optimizer(params, cfg.max_lr, cfg.total_steps)
    trainer = PriorTrainer(brain=brain, prior=prior, tx=tx)
    state = PriorTrainState.create(params, tx)
    step_fn = trainer.jitted_train_step(donate=True)
    eval_fn = jax.jit(
        lambda p, v, s, r, t: trainer.loss_fn(p, v, s, r, nce_temp=t)[1]
    )

    best_val_loss = float("inf")
    start_step = 0
    last_dir = f"{ckpt_dir}/last" if ckpt_dir else None
    best_dir = f"{ckpt_dir}/best" if ckpt_dir else None
    if cfg.resume and last_dir and os.path.isdir(last_dir):
        restored = ckpt_lib.restore_checkpoint(
            last_dir,
            target={"state": state, "best_val_loss": jnp.zeros(())},
        )
        state = restored["state"]
        best_val_loss = float(restored["best_val_loss"])
        start_step = int(state.step)
        if jax.process_index() == 0:
            print(f"resumed from {last_dir} at step {start_step} "
                  f"(best val loss {best_val_loss:.4f})")

    temps = np.asarray(
        cosine_anneal(cfg.nce_temp_start, cfg.nce_temp_end, max(cfg.total_steps, 2))
    )
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        put = lambda x: jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("dp")))
    else:
        put = jnp.asarray

    def run_validation(step: int) -> Dict[str, float]:
        """Mean retrieval/loss metrics over the val split at the current
        annealed temp (no grads, eval-mode dropout off via loss_fn's rng
        being unused for dropout... the brain eval uses deterministic rng)."""
        sums: Dict[str, float] = {}
        n = 0
        temp = jnp.asarray(temps[min(step, len(temps) - 1)])
        for j, vb in enumerate(val_batches()):
            m = eval_fn(state.params, put(vb["voxel"]), put(vb["style_target"]),
                        jax.random.fold_in(rng, 1_000_000 + j), temp)
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        return {k: v / max(n, 1) for k, v in sums.items()}

    def save_tagged(step: int, val: Dict[str, float]) -> Dict[str, float]:
        nonlocal best_val_loss
        improved = val["loss"] < best_val_loss
        if improved:
            best_val_loss = val["loss"]  # tracked even without a ckpt_dir
        if not ckpt_dir or jax.process_index() != 0:
            return val
        if improved:
            # layout matches the train->serve graft target
            # (pipeline.load_prior_checkpoint: {"params", "step"})
            ckpt_lib.save_checkpoint(
                best_dir, {"params": state.params, "step": state.step}
            )
        # "last" carries the updated best so resume keeps the tag honest
        ckpt_lib.save_checkpoint(
            last_dir, {"state": state, "best_val_loss": jnp.asarray(best_val_loss)}
        )
        return val

    from ..infra.run_dir import EarlyStopping

    stopper = (EarlyStopping(patience=cfg.early_stop_patience)
               if cfg.early_stop_patience else None)
    metrics: Dict[str, Any] = {}
    val_history = []
    t0 = time.time()
    i = start_step
    for batch in batches:
        state, metrics = step_fn(
            state,
            put(batch["voxel"]),
            put(batch["style_target"]),
            jax.random.fold_in(rng, i),
            jnp.asarray(temps[min(i, len(temps) - 1)]),
        )
        i += 1
        if i % cfg.log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            write_metrics(metrics, step=i, prefix="prior/")
            if jax.process_index() == 0:
                rate = (i - start_step) / (time.time() - t0)
                print(f"step {i}: loss={m['loss']:.4f} "
                      f"nce={m['loss_nce']:.4f} prior={m['loss_prior']:.4f} "
                      f"top1={m['top1_fwd']:.3f} ({rate:.1f} it/s)")
        if cfg.val_every and val_batches is not None and i % cfg.val_every == 0:
            val = run_validation(i)
            write_metrics(val, step=i, prefix="prior_val/")
            save_tagged(i, val)
            val_history.append({"step": i, **val})
            if jax.process_index() == 0:
                print(f"  val@{i}: loss={val['loss']:.4f} "
                      f"top1={val['top1_fwd']:.3f} (best {best_val_loss:.4f})")
            if stopper is not None and stopper.update(val["loss"]):
                if jax.process_index() == 0:
                    print(f"early stop at step {i} "
                          f"({stopper.bad_evals} validations without "
                          f"improvement over {stopper.best:.4f})")
                break
    if ckpt_dir and not cfg.val_every:
        ckpt_lib.save_checkpoint(ckpt_dir, {"params": state.params,
                                            "step": state.step})
    return {
        "state": state,
        "metrics": {k: float(v) for k, v in metrics.items()},
        "val_history": val_history,
        "best_val_loss": best_val_loss,
        "best_ckpt": best_dir if (ckpt_dir and cfg.val_every) else None,
        "last_ckpt": last_dir if (ckpt_dir and cfg.val_every) else ckpt_dir,
    }


def train_flint_vae(
    motion_batches: Iterator[np.ndarray],
    total_steps: int,
    flint_cfg=None,
    lr: float = 1e-4,
    kl_weight: float = 0.01,
    logdir: Optional[str] = None,
    ckpt_dir: Optional[str] = None,
    seed: int = 0,
    quantizer: Optional[str] = None,  # None (Gaussian VAE) | "vq"
    codebook_size: int = 256,
    beta: float = 0.25,
) -> Dict[str, Any]:
    """Motion-prior (FLINT) training loop — Gaussian VAE (default) or VQ
    mode (``quantizer="vq"``), matching the reference's L2lVqVae
    with/without a quantizer (L2lMotionPrior.py:54-73)."""
    import optax

    from ..models.flint import FlintConfig
    from ..models.flint_vae import FlintVAE, FlintVQVAE

    if logdir:
        set_summary_writer(logdir)
    cfg = flint_cfg or FlintConfig()
    if quantizer == "vq":
        vae = FlintVQVAE(cfg, codebook_size=codebook_size, beta=beta)
    elif quantizer is None:
        vae = FlintVAE(cfg)
    else:
        raise ValueError(f"unknown quantizer {quantizer!r}")
    rng = jax.random.PRNGKey(seed)
    first = next(iter(motion_batches))
    variables = (vae.init(rng, jnp.asarray(first)) if quantizer
                 else vae.init(rng, jnp.asarray(first), rng))
    params, stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.adamw(lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, stats, opt, motion, key):
        def lf(p):
            if quantizer == "vq":
                (loss, m), new_model_state = vae.apply(
                    {"params": p, "batch_stats": stats}, motion, True,
                    method=FlintVQVAE.loss, mutable=["batch_stats"],
                )
            else:
                (loss, m), new_model_state = vae.apply(
                    {"params": p, "batch_stats": stats}, motion, key,
                    kl_weight, True, method=FlintVAE.loss,
                    mutable=["batch_stats"],
                )
            return loss, (m, new_model_state)

        (loss, (m, new_state)), g = jax.value_and_grad(lf, has_aux=True)(params)
        upd, opt = tx.update(g, opt, params)
        return (optax.apply_updates(params, upd),
                new_state["batch_stats"], opt, m)

    metrics = {}
    for i, motion in enumerate([first] if total_steps == 1 else
                               _chain(first, motion_batches, total_steps)):
        params, stats, opt, metrics = step(
            params, stats, opt, jnp.asarray(motion), jax.random.fold_in(rng, i)
        )
        if logdir and (i + 1) % 50 == 0:
            write_metrics(metrics, step=i + 1, prefix="flint/")
    if ckpt_dir:
        ckpt_lib.save_checkpoint(
            ckpt_dir, {"params": params, "batch_stats": stats}
        )
    return {"params": params, "batch_stats": stats,
            "metrics": {k: float(v) for k, v in metrics.items()}}


def _chain(first, rest, limit):
    yield first
    for i, x in enumerate(rest):
        if i + 1 >= limit:
            return
        yield x
