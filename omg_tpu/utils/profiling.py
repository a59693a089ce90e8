"""Tracing / profiling / metrics.

The reference has no instrumentation beyond tqdm progress bars and debug
prints (SURVEY.md §5: lora_pipeline.py:484, p2p_attention.py:109). Here:
  * ``trace(name)`` — context manager emitting jax.profiler
    TraceAnnotations (visible in TensorBoard/XProf captures) plus
    wall-clock aggregation;
  * ``start_server(port)`` — on-demand profiler server for live capture;
  * ``Metrics`` — process-local counters/timers the serving layer
    reports (images generated, p50/p95 latency per stage).
"""

from __future__ import annotations

import collections
import contextlib
import statistics
import threading
import time
from typing import Dict, Optional

import jax


class Metrics:
    """Thread-safe counters + latency records.

    Timings are bounded (most-recent ``max_samples`` per metric): a
    serving process records per-stage latency on every request, and an
    unbounded list is a slow memory leak plus an ever-growing sort on
    each /metrics scrape."""

    def __init__(self, max_samples: int = 4096):
        self._lock = threading.Lock()
        self.counters: Dict[str, int] = collections.defaultdict(int)
        self.timings: Dict[str, collections.deque] = collections.defaultdict(
            lambda: collections.deque(maxlen=max_samples))

    def count(self, name: str, n: int = 1):
        with self._lock:
            self.counters[name] += n

    def record(self, name: str, seconds: float):
        with self._lock:
            self.timings[name].append(seconds)

    def summary(self) -> dict:
        with self._lock:
            out = {"counters": dict(self.counters), "latency": {}}
            for name, vals in self.timings.items():
                if not vals:
                    continue
                s = sorted(vals)
                out["latency"][name] = {
                    "n": len(s),
                    "p50": statistics.median(s),
                    "p95": s[min(len(s) - 1, int(len(s) * 0.95))],
                    "mean": sum(s) / len(s),
                }
            return out


METRICS = Metrics()


@contextlib.contextmanager
def trace(name: str, metrics: Optional[Metrics] = None):
    """Profiler annotation + monotonic-clock record around a block.

    Records in a finally so failing requests still contribute latency
    samples (dropping them biases p50/p95 toward successes)."""
    m = metrics or METRICS
    t0 = time.perf_counter()
    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    finally:
        m.record(name, time.perf_counter() - t0)


def start_server(port: int = 9999):
    """Start the jax profiler server for on-demand trace capture
    (connect with TensorBoard's profile plugin / xprof)."""
    jax.profiler.start_server(port)


def compiled_peak_bytes(compiled) -> int:
    """Peak HBM estimate from a compiled program's memory analysis.

    Fallback for backends whose runtime reports no memory stats (the
    axon-tunneled TPU): arguments + outputs + XLA temporaries is the
    program's device-memory high-water mark (weights count once even
    when aliased as both argument and donation target).
    """
    ma = compiled.memory_analysis()
    total = 0
    for field in ("argument_size_in_bytes", "output_size_in_bytes",
                  "temp_size_in_bytes", "generated_code_size_in_bytes"):
        v = getattr(ma, field, None)
        if v:
            total += int(v)
    alias = getattr(ma, "alias_size_in_bytes", None)
    if alias:
        total -= int(alias)
    if total <= 0:
        raise ValueError("memory_analysis reported no sizes")
    return total


def device_memory_stats() -> dict:
    """Per-device HBM usage where the backend reports it."""
    out = {}
    for d in jax.devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out
