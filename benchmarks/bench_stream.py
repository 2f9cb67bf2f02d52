"""BASELINE config 5: N-utterance concurrent tone-conversion stream through
the serving batcher with cached speaker embeddings.

Usage: python benchmarks/bench_stream.py [--n 256] [--seconds 10] [--batch 8]
Prints a JSON summary: aggregate audio-seconds/s, latency percentiles.
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
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--parity", action="store_true", help="full-f32 instead of the bf16 serving mode")
    ap.add_argument("--spec", action="store_true",
                    help="legacy spec-upload mode (default: PCM fast path)")
    ap.add_argument("--reps", type=int, default=1,
                    help="repeat the stream and report the median")
    args = ap.parse_args()

    import jax

    from openvoice_tpu.config import V2_CONVERTER_CONFIG as cfg
    from openvoice_tpu.models import synthesizer as S
    from openvoice_tpu.runtime.profiler import METRICS
    from openvoice_tpu.serve.batcher import ConvertBatcher, ConvertRequest

    params = S.init_synthesizer(jax.random.PRNGKey(0), cfg)
    batcher = ConvertBatcher(params, cfg, max_batch=args.batch, max_wait_ms=5.0, fast=not args.parity)
    batcher.start()

    n_frames = int(args.seconds * cfg.sampling_rate / cfg.hop_length)
    rng = np.random.default_rng(0)
    # cached speaker embeddings: a small table reused across the stream
    ses = rng.standard_normal((8, cfg.gin_channels)).astype(np.float32)

    def make_req(i: int) -> ConvertRequest:
        kw = dict(g_src=ses[i % 8], g_tgt=ses[(i + 3) % 8], tau=0.3, seed=i)
        if args.spec:
            return ConvertRequest(
                spec=specs[i % 16], n_frames=n_frames, **kw
            )
        return ConvertRequest(audio=waves[i % 16], **kw)

    if args.spec:
        specs = [
            np.abs(rng.standard_normal((n_frames, cfg.spec_channels))).astype(np.float32)
            for _ in range(16)
        ]
    else:
        n_samples = n_frames * cfg.hop_length
        waves = [
            (rng.standard_normal(n_samples) * 0.1).astype(np.float32)
            for _ in range(16)
        ]

    # warmup compile for the bucket, then at full batch occupancy
    batcher.submit(make_req(0)).result(timeout=1200)
    futs = [batcher.submit(make_req(i)) for i in range(args.batch)]
    for f in futs:
        f.result(timeout=1200)

    walls = []
    for _rep in range(args.reps):
        t0 = time.perf_counter()
        futs = [batcher.submit(make_req(i)) for i in range(args.n)]
        for f in futs:
            f.result(timeout=1200)
        walls.append(time.perf_counter() - t0)
    wall = float(np.median(walls))
    batcher.stop()

    audio_seconds = args.n * n_frames * cfg.hop_length / cfg.sampling_rate
    snap = METRICS.snapshot()
    print(
        json.dumps(
            {
                "metric": "stream_audio_seconds_per_second_per_chip",
                "value": round(audio_seconds / wall, 1),
                "unit": "audio-s/s/chip",
                "mode": "spec" if args.spec else "pcm",
                "n_utterances": args.n,
                "utterance_seconds": args.seconds,
                "wall_seconds": round(wall, 3),
                "wall_seconds_all_reps": [round(w, 3) for w in walls],
                "batch": args.batch,
                "request_latency_ms": snap["latency"].get("request_latency", {}),
                "vs_baseline": round(audio_seconds / wall / 10.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
