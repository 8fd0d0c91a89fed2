"""Device mesh + sharding rules (the framework's parallelism layer).

The reference's only parallelism is NCCL data-parallel training
(/root/reference/third_party/pirender/util/distributed.py:6-13, Lightning
'ddp' in training_pass.py:259; the main driver is single-GPU — SURVEY.md
§2.10). The TPU-native equivalent is one `jax.sharding.Mesh`:

  * axis "dp": batch sharding == DDP; gradient psum == NCCL all-reduce
    (inserted automatically by XLA under jit with sharded inputs),
  * axis "tp": optional tensor parallelism of the wav2vec2 encoder (the
    only ~100M-param component) — attention/FFN kernels are Megatron-split
    column-then-row so each layer needs a single all-reduce on ICI,
  * multi-host: `jax.distributed.initialize()` (== init_process_group).

Rank-0-gated logging uses `jax.process_index() == 0` (== get_rank()==0,
util/distributed.py:15-33).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None, **kw) -> None:
    """Multi-host init (no-op on a single process)."""
    if jax.process_count() > 1 or coordinator:
        jax.distributed.initialize(coordinator_address=coordinator, **kw)


def make_mesh(
    dp: Optional[int] = None, tp: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    """Mesh with ("dp", "tp") axes over the available devices.

    dp defaults to n_devices // tp. Lay tp on the fastest (innermost) axis so
    its all-reduces ride neighbouring ICI links.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def batch_sharding(mesh: Mesh, ndim: int = None, leading_axis: str = "dp"):
    """NamedSharding for batch-leading arrays (shard axis 0 over dp)."""
    return NamedSharding(mesh, P(leading_axis))


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


# --- parameter sharding rules -------------------------------------------

_TP_COL = [  # (regex on param path) -> shard output features ("column")
    r"audio_encoder/layers_\d+/attn_q/kernel",
    r"audio_encoder/layers_\d+/attn_k/kernel",
    r"audio_encoder/layers_\d+/attn_v/kernel",
    r"audio_encoder/layers_\d+/intermediate_dense/kernel",
]
_TP_ROW = [  # shard input features ("row"); output needs psum (XLA inserts)
    r"audio_encoder/layers_\d+/attn_out/kernel",
    r"audio_encoder/layers_\d+/output_dense/kernel",
]
_TP_BIAS_COL = [
    r"audio_encoder/layers_\d+/attn_q/bias",
    r"audio_encoder/layers_\d+/attn_k/bias",
    r"audio_encoder/layers_\d+/attn_v/bias",
    r"audio_encoder/layers_\d+/intermediate_dense/bias",
]


def emote_param_sharding_rules(path: str) -> P:
    """Megatron-style TP sharding for the wav2vec2 encoder; everything else
    replicated. ``path`` is '/'-joined param path."""
    for pat in _TP_COL:
        if re.search(pat, path):
            return P(None, "tp")
    for pat in _TP_ROW:
        if re.search(pat, path):
            return P("tp", None)
    for pat in _TP_BIAS_COL:
        if re.search(pat, path):
            return P("tp")
    return P()


def shard_params(params: Dict[str, Any], mesh: Mesh, rules=emote_param_sharding_rules):
    """Apply sharding rules -> params placed as NamedSharding on the mesh."""

    def place(path, leaf):
        keys = "/".join(str(getattr(k, "key", k)) for k in path)
        spec = rules(keys)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def param_shardings(params: Dict[str, Any], mesh: Mesh, rules=emote_param_sharding_rules):
    """Pytree of NamedShardings matching ``params`` (for jit in_shardings)."""

    def spec(path, _leaf):
        keys = "/".join(str(getattr(k, "key", k)) for k in path)
        return NamedSharding(mesh, rules(keys))

    return jax.tree_util.tree_map_with_path(spec, params)
