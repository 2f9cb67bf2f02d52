"""BASELINE config 2/3: V1 base TTS throughput (text → audio), optionally
followed by tone conversion.

Usage: python benchmarks/bench_tts.py [--tokens 256] [--batch 1] [--fast]
Prints one JSON line with audio-seconds-of-speech/s/chip for the TTS graph
(tts_encode is host-split two-stage jit; this measures the full decode at a
fixed duration bucket — the dominant cost).

Protocol: serial dependency chain + final readback (see bench.py).
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
    ap.add_argument("--tokens", type=int, default=256)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--fast", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from openvoice_tpu.config import v1_base_tts_config
    from openvoice_tpu.models import synthesizer as S
    from openvoice_tpu.text import default_symbols

    cfg = v1_base_tts_config(len(default_symbols))
    params = S.init_synthesizer(jax.random.PRNGKey(0), cfg)

    b, t_x = args.batch, args.tokens
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(1, cfg.n_vocab, (b, t_x)), jnp.int32)
    token_lengths = jnp.full((b,), t_x, jnp.int32)
    sid = jnp.zeros((b,), jnp.int32)

    encode = jax.jit(S.tts_encode, static_argnames=("cfg",))
    enc = encode(params, cfg, tokens, token_lengths, sid, jax.random.PRNGKey(1))
    y_lengths = np.asarray(jnp.sum(enc.w_ceil, axis=(1,)) ).astype(np.int64)
    # the SHIPPED frame-bucket policy (api.tts uses the same) — a hand-rolled
    # 256-multiple here previously overstated padding (374 frames → 512
    # instead of the 384 bucket) and understated serving throughput
    from openvoice_tpu.runtime.bucketing import round_up_to_bucket

    t_y = round_up_to_bucket(int(y_lengths.max()))

    decode = jax.jit(S.tts_decode, static_argnames=("cfg", "max_frames", "fast"))
    dec_cache = S.make_dec_cache(params, cfg) if args.fast else None
    noise = jnp.asarray(rng.standard_normal((b, t_y, cfg.inter_channels)).astype(np.float32))

    def chain(k: int) -> float:
        nz = noise
        t0 = time.perf_counter()
        for _ in range(k):
            audio, lengths = decode(params, cfg, enc, max_frames=t_y, noise=nz,
                                    fast=args.fast, dec_cache=dec_cache)
            nz = noise + 1e-9 * jnp.mean(audio)
        float(jnp.sum(nz))
        return time.perf_counter() - t0

    chain(2)
    slopes = sorted((chain(12) - chain(4)) / 8 for _ in range(5))
    dt = max(slopes[len(slopes) // 2], 1e-9)
    audio_seconds = float(y_lengths.sum()) * cfg.hop_length / cfg.sampling_rate
    value = audio_seconds / dt
    print(
        json.dumps(
            {
                "metric": "audio_seconds_per_second_per_chip_v1_tts_decode",
                "value": round(value, 2),
                "unit": "audio-s/s/chip",
                "tokens": t_x,
                "vs_baseline": round(value / 10.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
