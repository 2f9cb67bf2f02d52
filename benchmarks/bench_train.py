"""Real-hardware training-step timing (VERDICT r2 weak #4: no training step
had ever run on the TPU).

Runs the full V2-converter-dimension `train_step` (posterior encode → flow →
sliced HiFi-GAN decode → mel + KL losses → grads → adam update) on the
default backend and reports median step wall time and steps/s.

Usage: python benchmarks/bench_train.py [--batch 4] [--frames 192] [--steps 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--frames", type=int, default=192)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--gan", action="store_true", help="time the full GAN step")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from openvoice_tpu.config import V2_CONVERTER_CONFIG as cfg
    from openvoice_tpu.training import train as T

    b, t = args.batch, args.frames
    rng = np.random.default_rng(0)
    spec = jnp.asarray(np.abs(rng.standard_normal((b, t, cfg.spec_channels))).astype(np.float32))
    audio = jnp.asarray((rng.standard_normal((b, t * cfg.hop_length)) * 0.1).astype(np.float32))
    lens = jnp.asarray(np.full((b,), t, np.int32))
    g = jnp.asarray(rng.standard_normal((b, 1, cfg.gin_channels)).astype(np.float32) * 0.1)
    key = jax.random.PRNGKey(1)

    if args.gan:
        state = T.init_gan_train_state(jax.random.PRNGKey(0), cfg)
        step = jax.jit(T.gan_train_step, static_argnames=("cfg", "segment_frames"))
        run = lambda s, k: step(s, cfg, spec, audio, lens, g, k, segment_frames=32)
    else:
        state = T.init_train_state(jax.random.PRNGKey(0), cfg)
        step = jax.jit(T.train_step, static_argnames=("cfg",))
        run = lambda s, k: step(s, cfg, spec, audio, lens, g, k)

    t0 = time.perf_counter()
    state, metrics = run(state, key)
    jax.block_until_ready(metrics["total" if not args.gan else "gen_total"])
    compile_s = time.perf_counter() - t0

    times = []
    for i in range(args.steps):
        key = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        state, metrics = run(state, key)
        jax.block_until_ready(metrics["total" if not args.gan else "gen_total"])
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    print(json.dumps({
        "metric": "gan_train_step_ms" if args.gan else "train_step_ms",
        "backend": jax.default_backend(),
        "batch": b, "frames": t, "steps": args.steps,
        "compile_s": round(compile_s, 1),
        "median_step_ms": round(med * 1e3, 1),
        "steps_per_s": round(1.0 / med, 2),
        "audio_seconds_per_step": round(b * t * cfg.hop_length / cfg.sampling_rate, 2),
        "final_total_loss": round(float(metrics["total" if not args.gan else "gen_total"]), 3),
    }))


if __name__ == "__main__":
    main()
