"""Tracing / profiling / metrics (SURVEY.md §5.1, §5.5 — reference has none).

* `trace(name)` — `jax.profiler.TraceAnnotation` + wall-clock accumulation.
* `Metrics` — request-level counters: latency percentiles, audio-seconds
  generated, real-time factor (the north-star audio-s/s/chip metric is
  `audio_seconds / wall_seconds`).
* `profile_to(dir)` — capture a Perfetto/XPlane trace of a region.
"""

from __future__ import annotations

import contextlib
import json
import threading
import time
from collections import defaultdict

import jax


class Metrics:
    """Thread-safe rolling metrics registry."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._lat: dict[str, list[float]] = defaultdict(list)
        self._counters: dict[str, float] = defaultdict(float)

    def observe(self, name: str, seconds: float) -> None:
        with self._lock:
            self._lat[name].append(seconds)
            if len(self._lat[name]) > 10000:
                self._lat[name] = self._lat[name][-5000:]

    def add(self, name: str, value: float = 1.0) -> None:
        with self._lock:
            self._counters[name] += value

    def snapshot(self) -> dict:
        with self._lock:
            out: dict = {"counters": dict(self._counters)}
            lats = {}
            for name, vals in self._lat.items():
                if not vals:
                    continue
                s = sorted(vals)
                n = len(s)
                lats[name] = {
                    "count": n,
                    "mean_ms": 1e3 * sum(s) / n,
                    "p50_ms": 1e3 * s[n // 2],
                    "p95_ms": 1e3 * s[min(n - 1, int(n * 0.95))],
                    "p99_ms": 1e3 * s[min(n - 1, int(n * 0.99))],
                }
            out["latency"] = lats
            gen = self._counters.get("audio_seconds", 0.0)
            wall = self._counters.get("busy_seconds", 0.0)
            if wall > 0:
                out["audio_seconds_per_second"] = gen / wall
            return out

    def dump_json(self) -> str:
        return json.dumps(self.snapshot())


METRICS = Metrics()


@contextlib.contextmanager
def trace(name: str, metrics: Metrics | None = None):
    """Named scope: shows up in TPU profiles and feeds latency metrics."""
    m = metrics or METRICS
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    m.observe(name, time.perf_counter() - t0)


@contextlib.contextmanager
def profile_to(log_dir: str):
    """Capture an XPlane/Perfetto trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
