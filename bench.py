"""Benchmark: V2 tone-color conversion throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric: audio-seconds of converted speech generated per wall-clock second per
chip, on the full-size V2 converter (BASELINE config 1 shape).  The baseline
north star is ≥10× real-time (BASELINE.md), so vs_baseline = value / 10.

Runs the complete convert graph (STFT → enc_q → flow fwd/rev → HiFi-GAN) as
one jitted program per bucket, random weights (checkpoints are not bundled —
kernel/runtime cost is weight-independent).
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
    spec = jnp.asarray(np.abs(rng.standard_normal((batch, t_frames, cfg.spec_channels))).astype(np.float32))
    lengths = jnp.asarray([t_frames] * batch, jnp.int32)
    g_src = jnp.asarray(rng.standard_normal((batch, 1, cfg.gin_channels)).astype(np.float32))
    g_tgt = jnp.asarray(rng.standard_normal((batch, 1, cfg.gin_channels)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((batch, t_frames, cfg.inter_channels)).astype(np.float32))

    convert = jax.jit(S.voice_conversion, static_argnames=("cfg",))

    # warmup / compile
    audio, _ = convert(params, cfg, spec, lengths, g_src, g_tgt, 0.3, noise)
    jax.block_until_ready(audio)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        audio, _ = convert(params, cfg, spec, lengths, g_src, g_tgt, 0.3, noise)
    jax.block_until_ready(audio)
    dt = (time.perf_counter() - t0) / iters

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
