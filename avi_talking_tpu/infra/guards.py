"""Failure detection: NaN guards for losses, pytrees and pipeline stages.

Equivalents of the reference's manual guards (SURVEY.md §5.3):
``check_loss`` (train_diffusion_prior.py:135-137), per-stage ``check_nan``
(TalkingHeadBase.py:517-552) and the weights-NaN assert
(Preprocessors.py:415-419) — expressed the JAX way: ``checkify``-style
functional checks that run under jit, plus host-side assertions for
eager/debug use.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def check_loss(loss) -> None:
    """Host-side NaN guard (post-step): raises like the reference."""
    if not np.isfinite(np.asarray(loss)).all():
        raise ValueError(f"NaN/inf loss: {loss}")


def check_tree_finite(tree: Any, name: str = "tree") -> None:
    """Host-side: assert every leaf of a pytree (params/grads) is finite."""
    bad = []

    def visit(path, leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not np.isfinite(np.asarray(leaf)).all():
                bad.append("/".join(str(getattr(k, "key", k)) for k in path))
        return leaf

    jax.tree_util.tree_map_with_path(visit, tree)
    if bad:
        raise ValueError(f"non-finite leaves in {name}: {bad[:10]}")


def finite_or_debug(x: jax.Array, stage: str) -> jax.Array:
    """In-graph guard: emits a debug print when a stage output goes
    non-finite (the check_nan-after-every-stage pattern) without breaking
    jit. Returns x unchanged."""
    ok = jnp.isfinite(x).all()
    jax.lax.cond(
        ok,
        lambda: None,
        lambda: jax.debug.print("[nan-guard] non-finite output at stage {s}",
                                s=stage),
    )
    return x


def checkify_step(fn):
    """Wrap a jitted step with jax.experimental.checkify NaN checks.

    Returns (err, out); call ``err.throw()`` on host to surface failures
    (elastic-recovery integration point)."""
    from jax.experimental import checkify

    return checkify.checkify(fn, errors=checkify.float_checks)


def guard_metrics(metrics: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Replace non-finite metric values with -1 so meters never log NaN
    (Meter.write's NaN skip, infra/meters.py)."""
    return {
        k: jnp.where(jnp.isfinite(v), v, -1.0) if hasattr(v, "dtype") else v
        for k, v in metrics.items()
    }
