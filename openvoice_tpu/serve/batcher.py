"""Dynamic request batcher for conversion serving (BASELINE config 5:
256-utterance concurrent stream).

The reference serves one utterance at a time through Gradio
(openvoice_app.py:37-141).  Here requests queue up, and on each scheduling
tick the cost-optimal planner (runtime/bucketing.py::plan_groups) partitions
everything pending into (bucket, padded-batch) groups minimizing padded
frames + dispatch overhead; groups that are full or contain an
over-deadline request dispatch as one jitted graph each, the rest keep
waiting for peers.  Row padding to power-of-2 batch sizes bounds the number
of distinct compiled programs; padded rows carry length 0 so every kernel's
prefix mask makes them inert.  Failures are isolated per-request
(SURVEY.md §5.3): one bad request errors its own future, never the batch.
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
from openvoice_tpu.runtime.bucketing import allowed_batch_sizes, plan_groups
from openvoice_tpu.runtime.profiler import METRICS, trace


@dataclass
class ConvertRequest:
    spec: np.ndarray | None = None  # [T, n_freq] true-length spectrogram
    n_frames: int = 0
    g_src: np.ndarray | None = None  # [gin]
    g_tgt: np.ndarray | None = None  # [gin]
    tau: float = 0.3
    seed: int = 0
    # PCM fast path: raw mono waveform at cfg.sampling_rate instead of a
    # precomputed spectrogram.  The STFT then runs INSIDE the batched jit
    # graph and the host→device upload is int16 samples — ~16× fewer bytes
    # than the f32 spectrogram (which dominated the 256-stream wall time
    # through the ~16 MB/s dispatch tunnel).  n_frames is derived.
    #
    # Noise semantics per path (deliberate, pinned by
    # tests/test_serve.py::test_seed_semantics_per_path): at tau>0 the PCM
    # path draws its posterior noise ON DEVICE from
    # jax.random.PRNGKey(seed) (zero upload bytes), while the spec path —
    # like ToneColorConverter.convert — draws it on host from
    # np.random.default_rng(seed).  Both are deterministic per seed, but
    # the streams differ, so the same seed produces different (equally
    # valid) audio through the two paths.  Seed-exact compatibility with
    # ToneColorConverter.convert requires the spec path.
    audio: np.ndarray | None = None
    future: Future = field(default_factory=Future)
    enqueued_at: float = field(default_factory=time.perf_counter)


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("cfg", "fast"))
def _jit_convert_pcm16(params, cfg, pcm, spec_lengths, g_src, g_tgt, tau, seeds,
                       fast=False, dec_cache=None):
    """Whole serving path as ONE graph from int16 samples: PCM decode →
    STFT → per-request device-side noise (PRNGKey per seed) → convert →
    int16 wire encode.  Minimizes tunnel bytes in both directions."""
    from openvoice_tpu.api import _spec_inner

    audio_in = pcm.astype(jnp.float32) * (1.0 / 32767.0)
    spec = _spec_inner(audio_in, cfg)
    noise = jax.vmap(
        lambda s: jax.random.normal(
            jax.random.PRNGKey(s), (spec.shape[1], cfg.inter_channels)
        )
    )(seeds)
    audio, _ = S.voice_conversion(
        params, cfg, spec, spec_lengths, g_src, g_tgt, tau, noise,
        fast=fast, dec_cache=dec_cache,
    )
    return jnp.round(jnp.clip(audio[..., 0], -1.0, 1.0) * 32767.0).astype(jnp.int16)


class ConvertBatcher:
    """Background thread batching voice-conversion requests by bucket."""

    def __init__(
        self,
        params: dict,
        cfg: SynthesizerConfig,
        max_batch: int = 8,
        max_wait_ms: float = 5.0,
        fast: bool = False,
        mesh=None,
    ) -> None:
        """mesh: a jax.sharding.Mesh with a "data" axis → data-parallel
        serving: weights replicate across the mesh once at construction,
        every dispatched batch is sharded over the data axis, and GSPMD
        partitions the (unchanged) convert graph — one batcher drives all
        chips.  Padded batch sizes round up to a multiple of the data-axis
        size so every shard gets whole rows (padded rows carry length 0 and
        are inert, same trick as single-device row padding)."""
        self.mesh = mesh
        self._data_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            replicated = NamedSharding(mesh, P())
            self._data_sharding = NamedSharding(mesh, P("data"))
            params = jax.device_put(params, replicated)
        self.params = params
        self.cfg = cfg
        self.fast = fast
        # pre-packed fused-decoder weights keep inline packing out of the
        # serving graph (models/synthesizer.py::make_dec_cache)
        self.dec_cache = S.make_dec_cache(params, cfg) if fast else None
        if mesh is not None and self.dec_cache is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self.dec_cache = jax.device_put(
                self.dec_cache, NamedSharding(mesh, P())
            )
        self.max_batch = max_batch
        # largest batch size the planner can emit (same set plan_groups uses)
        self._full_batch = max(allowed_batch_sizes(max_batch))
        self.max_wait_s = max_wait_ms / 1e3
        self._q: queue.Queue[ConvertRequest | None] = queue.Queue()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        # readback pipeline: the dispatch thread only ENQUEUES device work
        # (async under the tunnel); this thread blocks on device→host audio
        # transfers, so batch i+1's compute overlaps batch i's readback
        self._readq: queue.Queue[tuple | None] = queue.Queue(maxsize=4)
        self._reader = threading.Thread(target=self._read_loop, daemon=True)
        self._running = False

    def start(self) -> None:
        self._running = True
        self._thread.start()
        self._reader.start()

    def stop(self) -> None:
        self._running = False
        self._q.put(None)
        self._thread.join(timeout=10)
        self._readq.put(None)
        self._reader.join(timeout=120)

    def submit(self, req: ConvertRequest) -> Future:
        if req.audio is not None and not req.n_frames:
            cfg = self.cfg
            pad = (cfg.filter_length - cfg.hop_length) // 2
            req.n_frames = (
                len(req.audio) + 2 * pad - cfg.filter_length
            ) // cfg.hop_length + 1
        self._q.put(req)
        return req.future

    # ------------------------------------------------------------------

    def _loop(self) -> None:
        pending: list[ConvertRequest] = []
        while self._running:
            timeout = self.max_wait_s
            try:
                item = self._q.get(timeout=timeout)
            except queue.Empty:
                item = "tick"
            if item is None:
                break
            if isinstance(item, ConvertRequest):
                pending.append(item)
            # drain whatever else already arrived before planning: replanning
            # once per burst instead of per request keeps backlog handling
            # O(B log B), not O(B^2) on the single scheduler thread
            stop = False
            while True:
                try:
                    extra = self._q.get_nowait()
                except queue.Empty:
                    break
                if extra is None:
                    stop = True
                    break
                pending.append(extra)

            if stop:
                break

            now = time.perf_counter()
            if not pending:
                continue
            oldest_due = min(r.enqueued_at for r in pending) + self.max_wait_s <= now
            if len(pending) < self.max_batch and not oldest_due:
                continue
            keep: list[ConvertRequest] = []
            # PCM-mode and spec-mode requests run different jit graphs, so
            # they are planned as separate pools
            for mode in ([r for r in pending if r.audio is not None],
                         [r for r in pending if r.audio is None]):
                if not mode:
                    continue
                plan = plan_groups(
                    [r.n_frames for r in mode], max_batch=self.max_batch
                )
                for idx, bucket, padded_batch in plan:
                    group = [mode[i] for i in idx]
                    full = len(group) >= self._full_batch
                    due = any(r.enqueued_at + self.max_wait_s <= now for r in group)
                    if full or due:
                        self._dispatch(bucket, group, padded_batch)
                    else:
                        keep.extend(group)
            pending = keep
        # drain
        for r in pending:
            r.future.set_exception(RuntimeError("batcher stopped"))

    def _dispatch(
        self, bucket: int, group: list[ConvertRequest], padded_batch: int | None = None
    ) -> None:
        cfg = self.cfg
        try:
            n = padded_batch or len(group)
            if self.mesh is not None:
                d = self.mesh.shape["data"]
                n = -(-n // d) * d  # whole rows per data shard
            put = (
                (lambda a: jax.device_put(a, self._data_sharding))
                if self._data_sharding is not None
                else jnp.asarray
            )
            lengths = np.zeros(n, np.int32)  # padded rows stay length 0 → fully masked
            g_src = np.zeros((n, 1, cfg.gin_channels), np.float32)
            g_tgt = np.zeros((n, 1, cfg.gin_channels), np.float32)
            taus = np.zeros((n, 1, 1), np.float32)
            for i, r in enumerate(group):
                lengths[i] = r.n_frames
                g_src[i, 0] = r.g_src.reshape(-1)
                g_tgt[i, 0] = r.g_tgt.reshape(-1)
                taus[i, 0, 0] = r.tau
            pcm_mode = group[0].audio is not None
            t0 = time.perf_counter()
            if pcm_mode:
                # PCM fast path: upload int16 samples (~16× fewer bytes than
                # the f32 spectrogram through the ~16 MB/s tunnel); the STFT
                # runs inside the batched graph, and the per-request noise is
                # drawn ON DEVICE from the request seeds — zero noise upload.
                pad = (cfg.filter_length - cfg.hop_length) // 2
                target = (bucket - 1) * cfg.hop_length + cfg.filter_length
                pcm = np.zeros((n, target), np.int16)
                seeds = np.zeros(n, np.uint32)
                for i, r in enumerate(group):
                    a = np.asarray(r.audio, np.float32)
                    padded = np.concatenate(
                        [a[1 : pad + 1][::-1], a, a[-pad - 1 : -1][::-1]]
                    )[:target]
                    pcm[i, : len(padded)] = np.round(
                        np.clip(padded, -1.0, 1.0) * 32767.0
                    ).astype(np.int16)
                    seeds[i] = np.uint32(r.seed)
                with trace("convert_batch"):
                    audio = _jit_convert_pcm16(
                        self.params, cfg, put(pcm), put(lengths),
                        put(g_src), put(g_tgt), put(taus),
                        put(seeds), fast=self.fast,
                        dec_cache=self.dec_cache,
                    )
                dt = time.perf_counter() - t0
                METRICS.add("busy_seconds", dt)
                METRICS.add("batches")
                self._readq.put((audio, group))
                return
            spec = np.zeros((n, bucket, cfg.spec_channels), np.float32)
            for i, r in enumerate(group):
                spec[i, : r.n_frames] = r.spec
            # host-side per-request noise: an eager jax.random.normal here
            # would be a BLOCKING device round-trip per request through the
            # dispatch tunnel (~60 ms each — measured 42 audio-s/s on the
            # 256-utterance stream before this fix, 25 s mean latency)
            noise = np.zeros((n, bucket, cfg.inter_channels), np.float32)
            for i, r in enumerate(group):
                noise[i] = (
                    np.random.default_rng(r.seed)
                    .standard_normal((bucket, cfg.inter_channels))
                    .astype(np.float32)
                )
            with trace("convert_batch"):
                audio, _ = S.voice_conversion_jit(
                    self.params, cfg, put(spec), put(lengths),
                    put(g_src), put(g_tgt), put(taus),
                    put(noise), fast=self.fast, dec_cache=self.dec_cache,
                )
                # device-slice the unit dim NOW (the tunnel reads minor-dim-1
                # arrays back element-wise) and wire-encode as int16 PCM —
                # half the device→host bytes at standard wav fidelity (the
                # serving tier writes 16-bit PCM anyway).  The blocking host
                # transfer happens on the reader thread so the next batch's
                # compute overlaps this one's readback.
                audio = jnp.round(
                    jnp.clip(audio[..., 0], -1.0, 1.0) * 32767.0
                ).astype(jnp.int16)
            dt = time.perf_counter() - t0
            METRICS.add("busy_seconds", dt)
            METRICS.add("batches")
            self._readq.put((audio, group))
        except Exception as exc:  # noqa: BLE001 — isolate failures per request
            tb = traceback.format_exc()
            for r in group:
                if not r.future.done():
                    r.future.set_exception(RuntimeError(f"batch failed: {exc}\n{tb}"))
            METRICS.add("batch_failures")

    def _read_loop(self) -> None:
        cfg = self.cfg
        while True:
            item = self._readq.get()
            if item is None:
                break
            audio_dev, group = item
            try:
                # blocking device→host; int16 wire → float back on host
                audio = np.asarray(audio_dev).astype(np.float32) / 32767.0
                for i, r in enumerate(group):
                    samples = r.n_frames * cfg.upsample_factor
                    r.future.set_result(audio[i, :samples])
                    METRICS.add("audio_seconds", samples / cfg.sampling_rate)
                    METRICS.observe("request_latency", time.perf_counter() - r.enqueued_at)
            except Exception as exc:  # noqa: BLE001 — isolate per batch
                for r in group:
                    if not r.future.done():
                        r.future.set_exception(RuntimeError(f"readback failed: {exc}"))
                METRICS.add("batch_failures")
