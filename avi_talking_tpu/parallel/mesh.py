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


# --- FSDP (ZeRO-3-style) parameter + optimizer-state sharding -------------
#
# With GSPMD, "FSDP" is just a sharding decision: place each weight (and its
# Adam moments) sharded over the data axis and let XLA insert the
# all-gathers before use and reduce-scatters on the gradients. No wrapper
# module, no manual collectives — the idiomatic TPU equivalent of
# ZeRO/FairScale sharded training (which the reference, single-GPU, lacks).


def fsdp_extend_spec(
    spec: P, shape, mesh: Mesh, axis: str = "dp", min_size: int = 8192
) -> P:
    """Extend ``spec`` by sharding the largest still-unsharded dim of
    ``shape`` over ``axis`` (if divisible). Leaves smaller than
    ``min_size`` elements stay as-is (gather overhead beats the memory).

    Only 2-D leaves (matmul kernels / embedding tables — where the bytes
    are) are sharded: sharding conv kernels trips XLA's SPMD convolution
    partitioner (CHECK failure in convolution_handler.cc batch-group math),
    and biases/norms are too small to matter."""
    size = int(np.prod(shape)) if len(shape) else 0
    n_ax = mesh.shape[axis]
    if size < min_size or n_ax <= 1 or len(shape) != 2:
        return spec
    entries = list(spec) + [None] * (len(shape) - len(spec))
    used = {e for e in entries if e is not None}
    if axis in used:
        return spec
    for d in sorted(range(len(shape)), key=lambda i: -shape[i]):
        if entries[d] is None and shape[d] % n_ax == 0 and shape[d] >= n_ax:
            entries[d] = axis
            return P(*entries)
    return spec


def fsdp_param_shardings(
    params: Dict[str, Any], mesh: Mesh,
    rules=emote_param_sharding_rules, axis: str = "dp", min_size: int = 8192,
):
    """NamedSharding pytree: tp rules first, then FSDP over the dp axis."""

    def spec(path, leaf):
        keys = "/".join(str(getattr(k, "key", k)) for k in path)
        base = rules(keys)
        return NamedSharding(
            mesh, fsdp_extend_spec(base, leaf.shape, mesh, axis, min_size))

    return jax.tree_util.tree_map_with_path(spec, params)


def fsdp_shard_params(
    params: Dict[str, Any], mesh: Mesh,
    rules=emote_param_sharding_rules, axis: str = "dp", min_size: int = 8192,
):
    """Place ``params`` on the mesh with tp+FSDP shardings."""
    shardings = fsdp_param_shardings(params, mesh, rules, axis, min_size)
    return jax.tree.map(jax.device_put, params, shardings)


def state_shardings_like(
    state, params: Dict[str, Any], p_shardings, mesh: Mesh
):
    """Shardings for an optimizer state: subtrees that structurally mirror
    the params pytree (Adam mu/nu, sgd momentum trace, ...) inherit the
    param shardings leaf-for-leaf; everything else (step counters, scalars)
    is replicated. Matching is structural (treedef equality), NOT by shape,
    so two same-shaped params with different shardings (e.g. one tp-split,
    one FSDP-split) keep their own layouts in the optimizer moments."""
    rep = NamedSharding(mesh, P())
    p_struct = jax.tree.structure(params)
    mirrored = jax.tree.unflatten(p_struct, jax.tree.leaves(p_shardings))

    def is_params_like(node):
        try:
            return jax.tree.structure(node) == p_struct
        except Exception:
            return False

    def pick(node):
        return mirrored if is_params_like(node) \
            else jax.tree.map(lambda _: rep, node)

    return jax.tree.map(pick, state, is_leaf=is_params_like)
