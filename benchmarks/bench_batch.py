"""BASELINE config 4: V2 multilingual batch conversion with padded-length
bucketing.

The reference converts one utterance at a time in a Python loop
(/root/reference/openvoice/api.py:141-160, batch=1 everywhere); this
benchmark converts a mixed-length batch — utterance lengths drawn from the
spread a multilingual corpus produces (per-language speaking-rate spread,
demo_part2/3 languages) — through the planned batch path: the DP planner
(runtime/bucketing.py::plan_groups) partitions utterances into cost-optimal
(bucket, padded-batch) groups over fine lane-aligned buckets, one compiled
program per group shape, masks keep padding exact.

Usage:
  python benchmarks/bench_batch.py [--n 64] [--batch 8] [--parity]

Prints one JSON line: aggregate audio-seconds of converted speech per
wall-clock second per chip, plus padding overhead (padded / real frames).

Protocol: serial dependency chain + final readback per bucket group
(see bench.py — block_until_ready alone under-reports through
remote-dispatch tunnels).
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
    ap.add_argument("--n", type=int, default=64, help="total utterances")
    ap.add_argument("--batch", type=int, default=8, help="utterances per device batch")
    ap.add_argument("--parity", action="store_true", help="full-f32 instead of bf16 serving mode")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from openvoice_tpu.config import V2_CONVERTER_CONFIG as cfg
    from openvoice_tpu.models import synthesizer as S
    from openvoice_tpu.runtime.bucketing import plan_groups

    params = S.init_synthesizer(jax.random.PRNGKey(0), cfg)
    fast = not args.parity

    # Mixed utterance lengths: 6 "languages" with different mean durations
    # (2.5–9 s — the spread the demo_part2 multilingual set produces), in
    # frames at hop 256 / 22.05 kHz.
    rng = np.random.default_rng(0)
    lang_means_s = [2.5, 4.0, 5.0, 6.5, 8.0, 9.0]
    fps = cfg.sampling_rate / cfg.hop_length
    lengths = [
        int(np.clip(rng.normal(lang_means_s[i % 6], 0.8), 1.0, 12.0) * fps)
        for i in range(args.n)
    ]

    # Group into (bucket, padded-batch) programs with the cost-optimal DP
    # planner (fine lane-aligned buckets, pow2 row padding): 1.34× padded/real
    # under the previous sorted-chunks-of-8 scheme → ~1.12× here.
    groups = [
        (bucket, [lengths[j] for j in idx], padded_batch)
        for idx, bucket, padded_batch in plan_groups(lengths, max_batch=args.batch)
    ]

    convert = jax.jit(S.voice_conversion, static_argnames=("cfg", "fast"))
    dec_cache = S.make_dec_cache(params, cfg) if fast else None

    def make_inputs(bucket: int, lens: list[int], padded_batch: int):
        b = padded_batch  # pow2 row padding; pad rows carry length 0 (masked)
        spec = jnp.asarray(
            np.abs(rng.standard_normal((b, bucket, cfg.spec_channels))).astype(np.float32)
        )
        ls = jnp.asarray(lens + [0] * (b - len(lens)), jnp.int32)
        g = jnp.asarray(rng.standard_normal((b, 1, cfg.gin_channels)).astype(np.float32))
        noise = jnp.asarray(
            rng.standard_normal((b, bucket, cfg.inter_channels)).astype(np.float32)
        )
        return spec, ls, g, noise

    # device-resident inputs, built once outside the timed region (the serving
    # tier likewise keeps specs on-device; host RNG is not part of the model)
    group_inputs = [make_inputs(bucket, lens, pb) for bucket, lens, pb in groups]
    for spec, ls, g, noise in group_inputs:  # warm up each program
        audio, _ = convert(params, cfg, spec, ls, g, g, 0.3, noise, fast=fast,
                           dec_cache=dec_cache)
        jax.block_until_ready(audio)

    def run_all(k: int) -> float:
        """k serially-chained passes over every group; one final readback.
        The carry mixes each output into the next noise input, so no pass
        can be skipped or overlapped by the runtime."""
        t0 = time.perf_counter()
        carry = jnp.zeros((), jnp.float32)
        for _ in range(k):
            for spec, ls, g, noise in group_inputs:
                audio, _ = convert(
                    params, cfg, spec, ls, g, g, 0.3, noise + 1e-9 * carry,
                    fast=fast, dec_cache=dec_cache,
                )
                carry = jnp.mean(audio).astype(jnp.float32)
        float(carry)
        return time.perf_counter() - t0

    run_all(1)
    slopes = sorted((run_all(3) - run_all(1)) / 2 for _ in range(5))
    dt = max(slopes[len(slopes) // 2], 1e-9)

    real_frames = sum(lengths)
    padded_frames = sum(bk * pb for bk, _, pb in groups)
    audio_seconds = real_frames * cfg.hop_length / cfg.sampling_rate
    value = audio_seconds / dt
    print(
        json.dumps(
            {
                "metric": "audio_seconds_per_second_per_chip_v2_batch_bucketed",
                "value": round(value, 2),
                "unit": "audio-s/s/chip",
                "vs_baseline": round(value / 10.0, 3),
                "n_utterances": args.n,
                "batch": args.batch,
                "padding_overhead": round(padded_frames / real_frames, 3),
                "mode": "parity-f32" if args.parity else "serving-bf16",
            }
        )
    )


if __name__ == "__main__":
    main()
