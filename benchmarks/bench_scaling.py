"""Scaling benchmark: data-parallel conversion throughput across a mesh
(BASELINE.md: ≥85% scaling efficiency at N≥2; measurement points 1 chip /
1 host / N hosts).

Usage:
  python benchmarks/bench_scaling.py [--frames 896] [--per-device 2] [--fast]
  # chipless dev check on 8 virtual CPU devices:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/bench_scaling.py --devices 1 2 4 8

Protocol: per device count N, a batch of N·per_device utterances is
sharded over the data axis and converted; iterations form a serial
dependency chain with one final readback (see bench.py — block_until_ready
alone under-reports through remote-dispatch tunnels).  Efficiency(N) =
throughput(N) / (N · throughput(1)).  Multi-host: run one process per host
with runtime.multihost.initialize(); devices then spans all hosts.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=896)
    ap.add_argument("--per-device", type=int, default=2)
    ap.add_argument("--devices", type=int, nargs="*", default=None)
    ap.add_argument("--fast", action="store_true")
    args = ap.parse_args()

    import os

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon TPU plugin ignores the env var; force via config
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from openvoice_tpu.config import V2_CONVERTER_CONFIG as cfg
    from openvoice_tpu.models import synthesizer as S
    from openvoice_tpu.runtime.mesh import make_mesh

    n_avail = jax.device_count()
    counts = args.devices or sorted({1, min(2, n_avail), min(4, n_avail), n_avail})
    counts = [c for c in dict.fromkeys(counts) if c <= n_avail]

    params = S.init_synthesizer(jax.random.PRNGKey(0), cfg)
    convert = jax.jit(S.voice_conversion, static_argnames=("cfg", "fast"))
    t_frames = args.frames
    rng = np.random.default_rng(0)

    results = {}
    for n in counts:
        mesh = make_mesh(n, data=n, model=1)
        bs = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
        b = n * args.per_device
        spec = jax.device_put(
            np.abs(rng.standard_normal((b, t_frames, cfg.spec_channels))).astype(np.float32), bs
        )
        lengths = jax.device_put(np.full((b,), t_frames, np.int32), bs)
        g = jax.device_put(
            rng.standard_normal((b, 1, cfg.gin_channels)).astype(np.float32), bs
        )
        noise0 = jax.device_put(
            rng.standard_normal((b, t_frames, cfg.inter_channels)).astype(np.float32), bs
        )
        p_sharded = jax.device_put(params, rep)

        def chain(k: int) -> float:
            nz = noise0
            t0 = time.perf_counter()
            for _ in range(k):
                audio, _ = convert(
                    p_sharded, cfg, spec, lengths, g, g, 0.3, nz, fast=args.fast
                )
                nz = noise0 + 1e-9 * jnp.mean(audio)
            float(jnp.sum(nz))
            return time.perf_counter() - t0

        chain(2)
        slopes = sorted((chain(8) - chain(3)) / 5 for _ in range(3))
        dt = max(slopes[len(slopes) // 2], 1e-9)
        audio_s = b * t_frames * cfg.hop_length / cfg.sampling_rate
        results[n] = audio_s / dt

    base = results[counts[0]] / counts[0]
    out = {
        "metric": "dp_scaling_audio_s_per_s",
        "frames": t_frames,
        "per_device_batch": args.per_device,
        "fast": args.fast,
        "throughput": {str(n): round(v, 2) for n, v in results.items()},
        "efficiency": {
            str(n): round(results[n] / (n * base), 3) for n in counts
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
