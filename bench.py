"""Benchmark: V2 tone-color conversion throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric: audio-seconds of converted speech generated per wall-clock second
per chip, full-size V2 converter (BASELINE config 1 shape), serving mode
(bf16 HiFi-GAN decoder; the parity mode is full-f32 and ~1.7× slower e2e).

Measurement protocol — honest under async/remote dispatch: iterations form
a serial dependency chain (each step's noise input mixes in the previous
audio output, so no pipelining/memoization can skip work), one device→host
readback at the end forces completion, and per-iteration time is the SLOPE
between a short and a long chain (subtracts dispatch/readback constants).
`jax.block_until_ready` alone under-reports through remote-dispatch
tunnels; a naive loop here measured 200× faster than physics allows.

The north star is ≥10× real-time (BASELINE.md) → vs_baseline = value / 10.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main() -> None:
    from openvoice_tpu.config import V2_CONVERTER_CONFIG as cfg
    from openvoice_tpu.models import synthesizer as S

    params = S.init_synthesizer(jax.random.PRNGKey(0), cfg)

    # ~10 s utterance at 22.05 kHz / hop 256 → 861 frames; bucket 896
    t_frames = 896
    batch = 1
    rng = np.random.default_rng(0)
    spec = jnp.asarray(
        np.abs(rng.standard_normal((batch, t_frames, cfg.spec_channels))).astype(np.float32)
    )
    lengths = jnp.asarray([t_frames] * batch, jnp.int32)
    g_src = jnp.asarray(rng.standard_normal((batch, 1, cfg.gin_channels)).astype(np.float32))
    g_tgt = jnp.asarray(rng.standard_normal((batch, 1, cfg.gin_channels)).astype(np.float32))
    noise = jnp.asarray(
        rng.standard_normal((batch, t_frames, cfg.inter_channels)).astype(np.float32)
    )

    convert = jax.jit(S.voice_conversion, static_argnames=("cfg", "fast"))
    dec_cache = S.make_dec_cache(params, cfg)  # one-time host-side weight packing

    def chain(k: int) -> float:
        """k serially-dependent converts, one final readback; returns seconds."""
        n = noise
        t0 = time.perf_counter()
        for _ in range(k):
            audio, _ = convert(params, cfg, spec, lengths, g_src, g_tgt, 0.3, n,
                               fast=True, dec_cache=dec_cache)
            n = noise + 1e-9 * jnp.mean(audio)
        float(jnp.sum(n))  # host readback: forces the whole chain to finish
        return time.perf_counter() - t0

    chain(2)  # warm up compiles (convert graph + chain glue)
    short, long_ = 8, 48
    # median-of-9 long-chain slopes: the remote-dispatch tunnel hiccups for
    # whole seconds in either direction (a slow `chain(short)` makes the
    # slope negative), so neither min nor mean is robust — the median is.
    # Weather is correlated across a run's window (whole runs measured
    # 1552-1834 audio-s/s across one day), so more reps + longer chains
    # narrow the within-run spread; the cross-run band is the tunnel's.
    slopes = sorted(
        (chain(long_) - chain(short)) / (long_ - short) for _ in range(9)
    )
    dt = max(slopes[len(slopes) // 2], 1e-9)

    audio_seconds = batch * t_frames * cfg.hop_length / cfg.sampling_rate
    value = audio_seconds / dt
    print(
        json.dumps(
            {
                "metric": "audio_seconds_per_second_per_chip_v2_convert",
                "value": round(value, 2),
                "unit": "audio-s/s/chip",
                "vs_baseline": round(value / 10.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
