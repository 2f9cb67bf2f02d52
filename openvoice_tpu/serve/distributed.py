"""Lock-step SPMD serving over a multi-process ("data", "model") mesh.

The single-process `ConvertBatcher` shards dispatched batches over a local
mesh's data axis (serve/batcher.py).  Across processes that is not enough:
under `jax.distributed` every process must enter the SAME compiled program
with the SAME global shapes, while requests arrive independently per host.
This module closes that gap with a lock-step round protocol — the
TPU-native analogue of a coordinated inference service over DCN
(SURVEY.md §2.3 "Multi-host launcher"; no reference counterpart — the
reference is strictly single-process, /root/reference/openvoice/api.py:17):

1. every process calls `convert_round(local_requests)` collectively;
2. a tiny metadata all-gather agrees on one (bucket, rows-per-process)
   plan — the max over hosts, so every host's requests fit;
3. each host contributes its local rows (padded rows carry length 0 and
   are inert, the same trick as single-device row padding) to ONE global
   batch via `jax.make_array_from_process_local_data`;
4. all hosts dispatch the same jitted convert graph; GSPMD partitions it
   over the data axis, gradient-free collectives ride DCN;
5. each host reads back only ITS addressable rows — device→host traffic
   stays host-local.

Noise semantics match the spec path / `ToneColorConverter.convert`: host
`np.random.default_rng(seed)` per request (serve/batcher.py ConvertRequest).

Also works single-process (the all-gather degrades to identity), which is
how the default test suite exercises it; the real 2-process path runs in
tests/_multiproc_child.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from openvoice_tpu.config import SynthesizerConfig
from openvoice_tpu.models import synthesizer as S
from openvoice_tpu.runtime.bucketing import round_up_to_bucket


@dataclass
class DistRequest:
    spec: np.ndarray        # [n_frames, n_freq]
    n_frames: int
    g_src: np.ndarray       # [gin]
    g_tgt: np.ndarray       # [gin]
    tau: float = 0.3
    seed: int = 0


class DistributedConvertService:
    """Collective convert service: one instance per process, same mesh."""

    def __init__(self, params, cfg: SynthesizerConfig, mesh, fast: bool = False):
        self.cfg = cfg
        self.mesh = mesh
        self.fast = fast
        # weights replicate over the global mesh once at construction
        self.params = jax.device_put(params, NamedSharding(mesh, P()))
        self.dec_cache = None
        if fast:
            self.dec_cache = jax.device_put(
                S.make_dec_cache(params, cfg), NamedSharding(mesh, P())
            )
        # rows contributed per process must fill that process's addressable
        # data-axis shards with whole rows
        n_procs = max(
            (d.process_index for d in mesh.devices.flat), default=0
        ) + 1
        if mesh.shape["data"] % n_procs:
            raise ValueError(
                f"data axis {mesh.shape['data']} not divisible by "
                f"{n_procs} processes"
            )
        self._local_data_shards = mesh.shape["data"] // n_procs
        self._n_procs = n_procs

    # ------------------------------------------------------------------

    def _plan(self, local_requests: list[DistRequest]) -> tuple[int, int]:
        """All processes agree on (bucket, rows_per_process): the all-gather
        of (count, max_frames) metadata, maxed over hosts."""
        n = len(local_requests)
        maxf = max((r.n_frames for r in local_requests), default=0)
        meta = np.asarray([n, maxf], np.int32)
        if self._n_procs > 1:
            from jax.experimental import multihost_utils

            allmeta = np.asarray(multihost_utils.process_allgather(meta))
            n = int(allmeta[:, 0].max())
            maxf = int(allmeta[:, 1].max())
        if n == 0:
            return 0, 0
        shards = self._local_data_shards
        rows = -(-n // shards) * shards  # whole rows per local data shard
        return round_up_to_bucket(maxf), rows

    def convert_round(self, local_requests: list[DistRequest]) -> list[np.ndarray]:
        """COLLECTIVE: every process must call this in the same order.

        Returns this host's converted audio, one array per local request
        (true lengths, silence-free).  A host may pass [] — it still
        participates in the round's collectives with all-padding rows.
        """
        cfg = self.cfg
        bucket, rows = self._plan(local_requests)
        if rows == 0:
            return []

        spec = np.zeros((rows, bucket, cfg.spec_channels), np.float32)
        lengths = np.zeros(rows, np.int32)
        g_src = np.zeros((rows, 1, cfg.gin_channels), np.float32)
        g_tgt = np.zeros((rows, 1, cfg.gin_channels), np.float32)
        taus = np.zeros((rows, 1, 1), np.float32)
        noise = np.zeros((rows, bucket, cfg.inter_channels), np.float32)
        for i, r in enumerate(local_requests):
            spec[i, : r.n_frames] = r.spec
            lengths[i] = r.n_frames
            g_src[i, 0] = np.asarray(r.g_src).reshape(-1)
            g_tgt[i, 0] = np.asarray(r.g_tgt).reshape(-1)
            taus[i, 0, 0] = r.tau
            # draw only the LIVE rows: numpy's row-major fill makes this
            # prefix-equal to any bucket-sized draw from the same seed
            # (api.py convert notes the same invariant), so results do not
            # depend on which round/bucket a request lands in — required
            # for elastic re-runs to reproduce bit-equal audio.  Padded
            # rows are masked-inert in the graph.
            noise[i, : r.n_frames] = (
                np.random.default_rng(r.seed)
                .standard_normal((r.n_frames, cfg.inter_channels))
                .astype(np.float32)
            )

        def put(a):
            return jax.make_array_from_process_local_data(
                NamedSharding(self.mesh, P("data")), a
            )

        audio, _ = S.voice_conversion_jit(
            self.params, cfg, put(spec), put(lengths), put(g_src), put(g_tgt),
            put(taus), put(noise), fast=self.fast, dec_cache=self.dec_cache,
        )
        # device-slice the unit dim before readback (element-wise tunnel
        # readback on minor-dim-1 arrays — see serve/batcher.py)
        audio = jax.jit(
            lambda a: a[..., 0],
            out_shardings=NamedSharding(self.mesh, P("data")),
        )(audio)
        # this host's rows only: addressable shards in global row order,
        # DEDUPED by row range — with a model axis > 1 every data-shard row
        # range appears once per model-axis device (replicas), and naive
        # concatenation would hand later requests earlier rows' audio
        by_range: dict[int, np.ndarray] = {}
        for s in audio.addressable_shards:
            start = s.index[0].start or 0
            if start not in by_range:
                by_range[start] = np.asarray(s.data)
        local = np.concatenate(
            [by_range[k] for k in sorted(by_range)], axis=0
        )
        return [
            local[i, : r.n_frames * cfg.upsample_factor]
            for i, r in enumerate(local_requests)
        ]
