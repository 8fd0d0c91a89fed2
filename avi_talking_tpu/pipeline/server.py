"""Micro-batching inference server for the wav+instruction -> face pipeline.

The reference serves requests with a per-sample python loop
(/root/reference/train_diffusion_prior.py:655-774: one CLIP forward, one
100-step prior loop and one EMOTE forward per (caption, wav) pair). A
TPU deployment wants the opposite: requests queued on the host, coalesced
into fixed-shape micro-batches (jit recompiles per shape — both sequence
length AND batch size must be bucketed), one device dispatch per batch.

Design:
- ``submit()`` is non-blocking and returns a Future; a single collector
  thread drains the queue, groups by (length bucket), pads the batch dim
  up to the next batch bucket (extra rows are masked copies of row 0 and
  dropped on return), and calls the pipeline's fused batch path.
- ``warmup()`` pre-compiles every (batch bucket x length bucket) shape so
  the first real request never pays a compile.
- All shapes come from ``ServingConfig``; steady-state serving therefore
  runs entirely from the jit cache.

Stats (`server.stats`) track request latency and batch occupancy — the
same numbers bench.py reports as p50/p99.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from concurrent.futures import Future
from typing import Any, Dict, List, Optional, Sequence

import numpy as np


@dataclasses.dataclass(frozen=True)
class ServingConfig:
    max_batch: int = 16
    max_wait_ms: float = 5.0  # collector linger before dispatching a partial batch
    batch_buckets: Sequence[int] = (1, 2, 4, 8, 16)
    length_buckets: Sequence[int] = (64, 128, 256, 512)
    sample_rate: int = 16_000
    # concurrent in-flight micro-batches: host-side framing/tokenising of
    # batch N overlaps device compute + D2H of batch N-1 (host prep is a
    # large fraction of serving latency on 1-core frontends). 1 = serial.
    pipeline_depth: int = 2
    # fetch the (B, T, V, 3) vertex tensor per batch? Off by default: it is
    # ~100 MB of D2H per batch (THE latency bottleneck on remote TPUs);
    # coeffs are a few KB and FLAME-decode anywhere.
    return_vertices: bool = False


@dataclasses.dataclass
class _Request:
    wav: Any  # float waveform array or .wav path
    instruction: str
    seed: int
    future: Future
    t_submit: float


class InferenceServer:
    """Queue + collector thread over ``AviTalkingPipeline.generate_batch``."""

    def __init__(self, pipeline, cfg: Optional[ServingConfig] = None):
        self.pipeline = pipeline
        self.cfg = cfg or ServingConfig()
        assert self.cfg.max_batch <= max(self.cfg.batch_buckets)
        self._q: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._closed = False
        # per-request: latency_ms, queue_wait_ms; per-batch: batch_size,
        # padded_batch + the generate_batch stage breakdown (framing /
        # style dispatch / prep+H2D / device+fetch) — the observability the
        # p50 discrepancy hunt needs (VERDICT r4 item 3)
        self.stats: Dict[str, List[float]] = {
            "latency_ms": [], "queue_wait_ms": [], "batch_size": [],
            "padded_batch": [], "framing_ms": [], "style_dispatch_ms": [],
            "prep_ms": [], "device_fetch_ms": []}
        from concurrent.futures import ThreadPoolExecutor

        self._pool = ThreadPoolExecutor(
            max_workers=max(1, self.cfg.pipeline_depth))
        self._inflight: "queue.Queue" = queue.Queue(
            maxsize=max(1, self.cfg.pipeline_depth))
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    # -- client API --------------------------------------------------------

    def submit(self, wav, instruction: str, seed: int = 0) -> Future:
        """``wav``: float waveform array or a .wav path (like
        ``generate_batch``)."""
        if self._closed:
            raise RuntimeError("server closed")
        if not isinstance(wav, str):
            wav = np.asarray(wav, np.float32)
        fut: Future = Future()
        self._q.put(_Request(wav, instruction, seed, fut, time.perf_counter()))
        return fut

    def generate(self, wav, instruction: str, seed: int = 0, timeout=None):
        """Blocking convenience wrapper."""
        return self.submit(wav, instruction, seed).result(timeout=timeout)

    def close(self) -> None:
        if not self._closed:
            self._closed = True
            self._q.put(None)
            self._thread.join(timeout=30)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- shape management ---------------------------------------------------

    def _batch_bucket(self, n: int) -> int:
        for b in sorted(self.cfg.batch_buckets):
            if n <= b:
                return b
        return max(self.cfg.batch_buckets)

    def warmup(self, seconds_per_bucket: Optional[Sequence[float]] = None):
        """Compile every (batch bucket, length bucket) shape up front."""
        lfs = self.pipeline.cfg.emote.flint.latent_frame_size
        lengths = [b - b % lfs for b in self.cfg.length_buckets]
        secs = seconds_per_bucket or [t / 25.0 for t in lengths]
        for sec, _t in zip(secs, lengths):
            wav = np.zeros(int(sec * self.cfg.sample_rate), np.float32)
            for bb in sorted(set(self.cfg.batch_buckets)):
                if bb > self.cfg.max_batch:
                    break
                self.pipeline.generate_batch(
                    [wav] * bb, ["warmup"] * bb, seed=0,
                    length_buckets=tuple(self.cfg.length_buckets),
                    sample_rate=self.cfg.sample_rate,
                    return_vertices=self.cfg.return_vertices,
                )

    # -- collector ----------------------------------------------------------

    def _collect(self) -> List[_Request]:
        """Block for one request, then linger up to max_wait_ms for more."""
        first = self._q.get()
        if first is None:
            return []
        batch = [first]
        deadline = time.perf_counter() + self.cfg.max_wait_ms / 1e3
        while len(batch) < self.cfg.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                req = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if req is None:
                self._q.put(None)  # keep the poison pill for the main loop
                break
            batch.append(req)
        return batch

    def _run(self) -> None:
        while True:
            batch = self._collect()
            if not batch:
                self._pool.shutdown(wait=True)
                return
            # one PRNG key covers a whole generate_batch call, so requests
            # with different seeds must not share a micro-batch
            groups: Dict[int, List[_Request]] = {}
            for r in batch:
                groups.setdefault(r.seed, []).append(r)
            for grp in groups.values():
                # bounded in-flight window: pipeline_depth batches overlap
                # (framing of N with device compute of N-1)
                self._inflight.put(None)
                self._pool.submit(self._dispatch_safe, grp)

    def _dispatch_safe(self, grp: List[_Request]) -> None:
        try:
            self._dispatch(grp)
        except Exception as e:  # fail only this micro-batch
            for r in grp:
                if not r.future.done():
                    r.future.set_exception(e)
        finally:
            self._inflight.get()

    def _dispatch(self, batch: List[_Request]) -> None:
        n = len(batch)
        padded = self._batch_bucket(n)
        wavs = [r.wav for r in batch] + [batch[0].wav] * (padded - n)
        instrs = [r.instruction for r in batch] + (
            [batch[0].instruction] * (padded - n))
        t_start = time.perf_counter()
        stages: Dict[str, float] = {}
        outs = self.pipeline.generate_batch(
            wavs, instrs, seed=batch[0].seed,
            length_buckets=tuple(self.cfg.length_buckets),
            sample_rate=self.cfg.sample_rate,
            return_vertices=self.cfg.return_vertices,
            stage_times=stages,
        )
        now = time.perf_counter()
        self.stats["batch_size"].append(n)
        self.stats["padded_batch"].append(padded)
        for k, v in stages.items():
            self.stats[k].append(v)
        for r, out in zip(batch, outs):
            self.stats["latency_ms"].append((now - r.t_submit) * 1e3)
            self.stats["queue_wait_ms"].append((t_start - r.t_submit) * 1e3)
            r.future.set_result(out)

    # -- observability -------------------------------------------------------

    def latency_percentiles(self, qs=(50, 99)) -> Dict[str, float]:
        lat = self.stats["latency_ms"]
        if not lat:
            return {f"p{q}": float("nan") for q in qs}
        return {f"p{q}": float(np.percentile(lat, q)) for q in qs}

    def stage_breakdown(self) -> Dict[str, float]:
        """Median per-batch stage times (ms) + median per-request queue
        wait: where a request's latency actually goes. ``device_fetch_ms``
        is device compute + D2H wire together (one blocking sync per
        batch; splitting them would cost an extra tunnel round trip)."""
        keys = ("queue_wait_ms", "framing_ms", "style_dispatch_ms",
                "prep_ms", "device_fetch_ms")
        return {k: (float(np.median(self.stats[k])) if self.stats[k]
                    else float("nan")) for k in keys}

    def clear_stats(self) -> None:
        for v in self.stats.values():
            v.clear()
