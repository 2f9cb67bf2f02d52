"""Dynamic request batcher for conversion serving (BASELINE config 5:
256-utterance concurrent stream).

The reference serves one utterance at a time through Gradio
(openvoice_app.py:37-141).  Here requests queue up, a scheduler groups them
by length bucket (identical compiled program), pads to (max_batch, bucket)
and dispatches one jitted graph per group.  Failures are isolated
per-request (SURVEY.md §5.3): one bad request errors its own future, never
the batch.
"""

from __future__ import annotations

import queue
import threading
import time
import traceback
from concurrent.futures import Future
from dataclasses import dataclass, field

import numpy as np

import jax
import jax.numpy as jnp

from openvoice_tpu.config import SynthesizerConfig
from openvoice_tpu.models import synthesizer as S
from openvoice_tpu.runtime.bucketing import round_up_to_bucket
from openvoice_tpu.runtime.profiler import METRICS, trace


@dataclass
class ConvertRequest:
    spec: np.ndarray  # [T, n_freq] true-length spectrogram
    n_frames: int
    g_src: np.ndarray  # [gin]
    g_tgt: np.ndarray  # [gin]
    tau: float = 0.3
    seed: int = 0
    future: Future = field(default_factory=Future)
    enqueued_at: float = field(default_factory=time.perf_counter)


class ConvertBatcher:
    """Background thread batching voice-conversion requests by bucket."""

    def __init__(
        self,
        params: dict,
        cfg: SynthesizerConfig,
        max_batch: int = 8,
        max_wait_ms: float = 5.0,
        fast: bool = False,
    ) -> None:
        self.params = params
        self.cfg = cfg
        self.fast = fast
        # pre-packed fused-decoder weights keep inline packing out of the
        # serving graph (models/synthesizer.py::make_dec_cache)
        self.dec_cache = S.make_dec_cache(params, cfg) if fast else None
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1e3
        self._q: queue.Queue[ConvertRequest | None] = queue.Queue()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._running = False

    def start(self) -> None:
        self._running = True
        self._thread.start()

    def stop(self) -> None:
        self._running = False
        self._q.put(None)
        self._thread.join(timeout=10)

    def submit(self, req: ConvertRequest) -> Future:
        self._q.put(req)
        return req.future

    # ------------------------------------------------------------------

    def _loop(self) -> None:
        pending: dict[int, list[ConvertRequest]] = {}
        deadline: dict[int, float] = {}
        while self._running:
            timeout = self.max_wait_s
            try:
                item = self._q.get(timeout=timeout)
            except queue.Empty:
                item = "tick"
            if item is None:
                break
            if isinstance(item, ConvertRequest):
                b = round_up_to_bucket(item.n_frames)
                pending.setdefault(b, []).append(item)
                deadline.setdefault(b, item.enqueued_at + self.max_wait_s)

            now = time.perf_counter()
            for b in list(pending):
                group = pending[b]
                if len(group) >= self.max_batch or now >= deadline[b]:
                    del pending[b], deadline[b]
                    self._dispatch(b, group[: self.max_batch])
                    rest = group[self.max_batch :]
                    if rest:
                        pending[b] = rest
                        deadline[b] = now  # dispatch next tick
        # drain
        for group in pending.values():
            for r in group:
                r.future.set_exception(RuntimeError("batcher stopped"))

    def _dispatch(self, bucket: int, group: list[ConvertRequest]) -> None:
        cfg = self.cfg
        try:
            n = len(group)
            spec = np.zeros((n, bucket, cfg.spec_channels), np.float32)
            lengths = np.zeros(n, np.int32)
            g_src = np.zeros((n, 1, cfg.gin_channels), np.float32)
            g_tgt = np.zeros((n, 1, cfg.gin_channels), np.float32)
            taus = np.zeros((n, 1, 1), np.float32)
            for i, r in enumerate(group):
                spec[i, : r.n_frames] = r.spec
                lengths[i] = r.n_frames
                g_src[i, 0] = r.g_src.reshape(-1)
                g_tgt[i, 0] = r.g_tgt.reshape(-1)
                taus[i, 0, 0] = r.tau
            noise = np.stack(
                [
                    np.asarray(
                        jax.random.normal(
                            jax.random.PRNGKey(r.seed), (bucket, cfg.inter_channels)
                        )
                    )
                    for r in group
                ]
            )
            t0 = time.perf_counter()
            with trace("convert_batch"):
                audio, _ = S.voice_conversion_jit(
                    self.params, cfg, jnp.asarray(spec), jnp.asarray(lengths),
                    jnp.asarray(g_src), jnp.asarray(g_tgt), jnp.asarray(taus),
                    jnp.asarray(noise), fast=self.fast, dec_cache=self.dec_cache,
                )
                audio = np.asarray(audio)
            dt = time.perf_counter() - t0
            METRICS.add("busy_seconds", dt)
            METRICS.add("batches")
            for i, r in enumerate(group):
                samples = r.n_frames * cfg.upsample_factor
                r.future.set_result(audio[i, :samples, 0])
                METRICS.add("audio_seconds", samples / cfg.sampling_rate)
                METRICS.observe("request_latency", time.perf_counter() - r.enqueued_at)
        except Exception as exc:  # noqa: BLE001 — isolate failures per request
            tb = traceback.format_exc()
            for r in group:
                if not r.future.done():
                    r.future.set_exception(RuntimeError(f"batch failed: {exc}\n{tb}"))
            METRICS.add("batch_failures")
