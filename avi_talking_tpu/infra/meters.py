"""Metrics / logging: Meter-compatible scalar writer + profiler hooks.

Replaces PIRender's global-SummaryWriter Meter
(/root/reference/third_party/pirender/util/meters.py:51-137, the logging
backend of the whole reference). Backends: tensorboard (via
torch.utils.tensorboard when available) and an always-on JSONL file; writes
are rank-0-gated for multi-host runs (== master_only).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict

import jax
import numpy as np

_writer = None
_jsonl = None


def set_summary_writer(logdir: str) -> None:
    """Install the global writers (Meter.set_summary_writer equivalent)."""
    global _writer, _jsonl
    if jax.process_index() != 0:
        return
    os.makedirs(logdir, exist_ok=True)
    _jsonl = open(os.path.join(logdir, "scalars.jsonl"), "a")
    try:
        from torch.utils.tensorboard import SummaryWriter

        _writer = SummaryWriter(logdir)
    except Exception:
        _writer = None


class Meter:
    """Running-average scalar meter with .write/.flush like the reference."""

    def __init__(self, name: str):
        self.name = name
        self.values = []

    def write(self, value) -> None:
        v = float(np.asarray(value))
        if np.isfinite(v):
            self.values.append(v)

    def flush(self, step: int) -> None:
        if not self.values:
            return
        avg = float(np.mean(self.values))
        self.values.clear()
        if jax.process_index() != 0:
            return
        if _writer is not None:
            _writer.add_scalar(self.name, avg, step)
        if _jsonl is not None:
            _jsonl.write(
                json.dumps({"t": time.time(), "step": step, self.name: avg}) + "\n"
            )
            _jsonl.flush()


def write_metrics(metrics: Dict[str, jax.Array], step: int, prefix: str = "") -> None:
    for k, v in metrics.items():
        m = Meter(prefix + k)
        m.write(v)
        m.flush(step)


class profile_region:
    """Context manager: jax.profiler trace annotation + wall timer."""

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        self._t = jax.profiler.TraceAnnotation(self.name)
        self._t.__enter__()
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        self._t.__exit__(*exc)
        return False


def start_profiler_server(port: int = 9999) -> None:
    jax.profiler.start_server(port)


def trace(logdir: str):
    """``with trace(dir):`` captures a TensorBoard-viewable device trace."""
    return jax.profiler.trace(logdir)
