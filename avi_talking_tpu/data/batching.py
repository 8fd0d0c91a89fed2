"""Host-side batching for TPU feeding: bucketed padding + device prefetch.

jit-stable variable length (SURVEY.md §5.7): sequences are padded up to the
next bucket boundary so each bucket compiles once; an optional double-buffer
prefetch overlaps host work with device steps.
"""

from __future__ import annotations

import itertools
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np


def chunked_apply(fn: Callable, frames: np.ndarray, max_b: int,
                  inflight: int = 2):
    """Run ``fn`` over ``frames`` in fixed-size chunks of ``max_b``.

    The tail chunk is padded by repeating the last frame so EVERY dispatch
    reuses one compiled executable (the pad-to-chunk pattern of
    Preprocessors.py:381-405 — ragged tails would re-trace and, through the
    axon tunnel, re-pay a 10 s - 3 min compile per distinct length).

    Chunks are shipped with an explicit async ``jax.device_put`` (so ``fn``
    receives a device array — a leading ``jnp.asarray`` inside ``fn`` is a
    no-op) and up to ``inflight`` chunk results stay un-fetched while later
    chunks are transferred/dispatched: the host-side fetch of chunk i
    overlaps the H2D + compute of chunks i+1..i+inflight instead of paying
    a full transfer->compute->fetch round trip per chunk (r4 measured the
    per-chunk synchronous pattern at 3.5x the wire time of the frames).
    ``inflight=0`` restores the fully synchronous behaviour.

    ``fn(chunk) -> array | tuple[array, ...] | dict``; outputs are sliced
    back to the true length and concatenated over the leading axis."""
    import jax

    T = frames.shape[0]
    if T == 0:
        raise ValueError("chunked_apply: empty frame batch")
    pending: List[Any] = []  # (n, device result) not yet fetched
    outs: List[Any] = []

    def fetch(item):
        n, res = item
        if isinstance(res, dict):
            return {k: np.asarray(v)[:n] for k, v in res.items()}
        if not isinstance(res, tuple):
            res = (res,)
        return tuple(np.asarray(r)[:n] for r in res)

    # device-resident inputs stay on device: pad ragged tails with jnp so a
    # jax-array input is never pulled through D2H just to repeat its last
    # frame (the fused detect path feeds device arrays here)
    import jax.numpy as jnp

    xp = np if isinstance(frames, np.ndarray) else jnp
    for i in range(0, T, max_b):
        chunk = frames[i : i + max_b]
        n = chunk.shape[0]
        if n < max_b:
            chunk = xp.concatenate(
                [chunk, xp.repeat(chunk[-1:], max_b - n, axis=0)])
        pending.append((n, fn(jax.device_put(chunk))))
        while len(pending) > max(0, inflight):
            outs.append(fetch(pending.pop(0)))
    outs.extend(fetch(p) for p in pending)
    if isinstance(outs[0], dict):
        return {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}
    cat = tuple(np.concatenate([o[k] for o in outs])
                for k in range(len(outs[0])))
    return cat if len(cat) > 1 else cat[0]


def pad_to_bucket(
    x: np.ndarray, buckets: Sequence[int], axis: int = 0
) -> np.ndarray:
    """Pad axis up to the smallest bucket >= current length."""
    n = x.shape[axis]
    for b in buckets:
        if n <= b:
            pad = [(0, 0)] * x.ndim
            pad[axis] = (0, b - n)
            return np.pad(x, pad)
    raise ValueError(f"length {n} exceeds the largest bucket {buckets[-1]}")


def batch_iterator(
    dataset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = True,
    collate: Optional[Callable[[List[Any]], Dict[str, np.ndarray]]] = None,
    epochs: Optional[int] = 1,
) -> Iterator[Dict[str, np.ndarray]]:
    """Minimal epoch iterator over an indexable dataset (numpy batches)."""
    n = len(dataset)
    rng = np.random.default_rng(seed)
    epoch_iter = itertools.count() if epochs is None else range(epochs)
    for _ in epoch_iter:
        order = rng.permutation(n) if shuffle else np.arange(n)
        for s in range(0, n - (batch_size - 1 if drop_last else 0), batch_size):
            idx = order[s : s + batch_size]
            items = [dataset[int(i)] for i in idx]
            yield collate(items) if collate else default_collate(items)


def prefetch_to_device(
    iterator: Iterator[Dict[str, Any]],
    size: int = 2,
    sharding: Optional[Any] = None,
) -> Iterator[Dict[str, Any]]:
    """Double-buffered host->device prefetch.

    A daemon thread pulls batches from ``iterator``, issues the (async)
    H2D ``jax.device_put`` — optionally onto a NamedSharding, e.g.
    ``batch_sharding(mesh)`` for dp training — and keeps up to ``size``
    batches in flight, so host-side decode/pad overlaps the device step
    (the reference relies on torch DataLoader workers for the same
    overlap; on TPU the transfer itself must also be ahead of the step).
    Array leaves move to device; other leaves (paths, strings) pass through.
    """
    import queue as _queue
    import threading as _threading

    import jax

    q: "_queue.Queue" = _queue.Queue(maxsize=max(1, size))
    _END = object()

    def put(x):
        if isinstance(x, np.ndarray) or hasattr(x, "ndim"):
            return jax.device_put(x, sharding) if sharding is not None \
                else jax.device_put(x)
        return x

    def producer():
        try:
            for batch in iterator:
                q.put(jax.tree.map(put, batch))
            q.put(_END)
        except BaseException as e:  # surface iterator errors to the consumer
            q.put(e)

    _threading.Thread(target=producer, daemon=True).start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def default_collate(items: List[Any]) -> Dict[str, np.ndarray]:
    """Stack dict items; non-array fields are gathered into lists."""
    if dataclasses_like := hasattr(items[0], "__dataclass_fields__"):
        items = [vars(i) for i in items]
    out: Dict[str, Any] = {}
    for k in items[0]:
        vals = [it[k] for it in items]
        if isinstance(vals[0], np.ndarray) and all(
            v.shape == vals[0].shape for v in vals
        ):
            out[k] = np.stack(vals)
        elif isinstance(vals[0], (np.integer, int, np.floating, float)) and not isinstance(vals[0], bool):
            out[k] = np.asarray(vals)
        else:
            out[k] = vals
    return out
