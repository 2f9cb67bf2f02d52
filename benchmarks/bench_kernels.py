"""Per-kernel / per-stage roofline benchmark for the V2 convert path.

SURVEY.md §5.1/§5.5 call for per-kernel FLOPs/roofline counters and §7.2
step 3 for roofline benchmarks per kernel; the reference has none (it has no
benchmarks at all — /root/reference/README.md:10-40). For every hot stage
(Pallas STFT → posterior WaveNet → coupling flows → HiFi-GAN decoder) this
measures wall time with the chain-slope protocol (see bench.py for why), asks
the compiled executable's cost analysis for FLOPs/bytes, and reports achieved
FLOP/s, HBM GB/s, and the fraction of the chip's peak when the device kind is
known.

Usage: python benchmarks/bench_kernels.py [--frames 896] [--batch 1]
Prints one JSON line per stage.

Caveat: XLA's cost analysis does not see inside Pallas custom calls, so
gflops/utilization read 0 for the fully-fused bf16 stages (WN stack, MRF,
decoder tail) — the wall-time (ms) column is the meaningful number there;
the f32 stages still report real FLOPs for roofline context.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

# peak per chip: (bf16 FLOP/s, f32 FLOP/s, HBM bytes/s). f32 on the MXU runs
# at ~1/8 the bf16 rate on v4/v5 generations (passes per f32 product).
PEAKS = {
    "TPU v4": (275e12, 275e12 / 8, 1.2e12),
    "TPU v5 lite": (197e12, 197e12 / 8, 0.82e12),
    "TPU v5e": (197e12, 197e12 / 8, 0.82e12),
    "TPU v5": (459e12, 459e12 / 8, 2.8e12),
    "TPU v5p": (459e12, 459e12 / 8, 2.8e12),
    "TPU v6 lite": (918e12, 918e12 / 8, 1.6e12),
    "TPU v6e": (918e12, 918e12 / 8, 1.6e12),
}


def chain_slope(step, carry, readback, short: int = 8, long_: int = 40,
                reps: int = 5) -> float:
    """Seconds per iteration of `step` (carry → carry), measured as the slope
    between a short and a long serially-dependent chain so constant dispatch
    and readback costs cancel.  Median of `reps` slopes: the remote-dispatch
    tunnel occasionally hiccups for whole seconds in either direction (a slow
    short chain makes an individual slope negative), so neither min nor mean
    is robust.  (Verified: identical-value chains time the same as evolving
    ones, so there is no result memoization to guard against — any serial
    dependency through the carry is sufficient.)"""

    def run(k: int) -> float:
        c = carry
        t0 = time.perf_counter()
        for _ in range(k):
            c = step(c)
        readback(c)
        return time.perf_counter() - t0

    run(2)  # warm compiles
    slopes = sorted((run(long_) - run(short)) / (long_ - short) for _ in range(reps))
    return max(slopes[len(slopes) // 2], 1e-9)


def cost_of(jitted, *args) -> tuple[float, float]:
    """(flops, bytes accessed) from the compiled executable's cost analysis."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def report(name: str, dt: float, flops: float, nbytes: float, peak_flops: float | None,
           peak_bw: float | None, extra: dict | None = None) -> None:
    row = {
        "stage": name,
        "ms": round(1e3 * dt, 3),
        "gflops": round(flops / 1e9, 2),
        "tflops_per_s": round(flops / dt / 1e12, 3),
        "hbm_gb_per_s": round(nbytes / dt / 1e9, 1),
    }
    if peak_flops:
        row["mxu_util"] = round(flops / dt / peak_flops, 4)
    if peak_bw:
        row["hbm_util"] = round(nbytes / dt / peak_bw, 4)
    if extra:
        row.update(extra)
    print(json.dumps(row))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=896)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    from openvoice_tpu.config import V2_CONVERTER_CONFIG as cfg
    from openvoice_tpu.models import synthesizer as S
    from openvoice_tpu.nn.flows import apply_coupling_block
    from openvoice_tpu.nn.hifigan import apply_generator
    from openvoice_tpu.ops.stft_pallas import stft_magnitude_pallas

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "unknown")
    peak_bf16, peak_f32, peak_bw = None, None, None
    for k, (pb, pf, bw) in PEAKS.items():
        if k.lower() in str(kind).lower():
            peak_bf16, peak_f32, peak_bw = pb, pf, bw
            break
    print(json.dumps({"device": str(kind), "frames": args.frames, "batch": args.batch,
                      "peak_bf16_tflops": (peak_bf16 or 0) / 1e12}))

    b, t = args.batch, args.frames
    rng = np.random.default_rng(0)
    params = S.init_synthesizer(jax.random.PRNGKey(0), cfg)
    bf16 = lambda tree: jax.tree.map(lambda a: a.astype(jnp.bfloat16), tree)
    p16 = bf16(params)

    spec32 = jnp.asarray(np.abs(rng.standard_normal((b, t, cfg.spec_channels))).astype(np.float32))
    spec = spec32.astype(jnp.bfloat16)
    mask = jnp.ones((b, t, 1), jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((b, 1, cfg.gin_channels)).astype(np.float32))
    g16 = g.astype(jnp.bfloat16)
    z0 = jnp.asarray(rng.standard_normal((b, t, cfg.inter_channels)).astype(np.float32))
    z16 = z0.astype(jnp.bfloat16)
    n_samples = t * cfg.hop_length
    audio_in = jnp.asarray(rng.standard_normal((b, n_samples)).astype(np.float32) * 0.1)

    # --- Pallas STFT ------------------------------------------------------
    @jax.jit
    def stft_fn(y):
        return stft_magnitude_pallas(y, cfg.filter_length, cfg.hop_length, cfg.win_length)

    dt = chain_slope(
        lambda y: audio_in + 1e-12 * jnp.mean(stft_fn(y)),
        audio_in,
        lambda y: float(jnp.sum(y)),
    )
    fl, by = cost_of(stft_fn, audio_in)
    report("stft_pallas", dt, fl, by, peak_f32, peak_bw)

    # --- posterior WaveNet (enc_q, 16 layers, fused Pallas WN stack) -------
    @jax.jit
    def encq_fn(s):
        z, _, _ = S.posterior_encode(p16, cfg, s, mask, None, jnp.bfloat16(0.0),
                                     jnp.zeros_like(z16))
        return z

    dt = chain_slope(
        lambda s: spec + encq_fn(s)[..., :1] * jnp.bfloat16(0.01),
        spec,
        lambda s: float(jnp.sum(s.astype(jnp.float32))),
    )
    fl, by = cost_of(encq_fn, spec)
    report("posterior_wn_bf16", dt, fl, by, peak_bf16, peak_bw)

    # --- coupling flows fwd + rev (2×4 flows × 4 WN layers, bf16) ---------
    @jax.jit
    def flow_fn(z):
        zp = apply_coupling_block(p16["flow"], z, mask, g=g16, reverse=False)
        return apply_coupling_block(p16["flow"], zp, mask, g=g16, reverse=True)

    dt = chain_slope(
        lambda z: z16 + 1e-9 * jnp.mean(flow_fn(z)).astype(jnp.bfloat16),
        z16,
        lambda z: float(jnp.sum(z.astype(jnp.float32))),
    )
    fl, by = cost_of(flow_fn, z16)
    report("flows_fwd_rev_bf16", dt, fl, by, peak_bf16, peak_bw)

    # --- HiFi-GAN decoder (bf16 serving mode; Pallas MRF inside) ----------
    def dec(pdec, z, gg):
        return apply_generator(
            pdec, z,
            resblock_kind=cfg.resblock,
            resblock_dilation_sizes=cfg.resblock_dilation_sizes,
            upsample_rates=cfg.upsample_rates,
            upsample_kernel_sizes=cfg.upsample_kernel_sizes,
            g=gg, x_mask=None,
        )

    dec16 = jax.jit(lambda z: dec(p16["dec"], z, g16))
    dt = chain_slope(
        lambda z: z16 + 1e-9 * jnp.mean(dec16(z)).astype(jnp.bfloat16),
        z16,
        lambda z: float(jnp.sum(z.astype(jnp.float32))),
    )
    fl, by = cost_of(dec16, z16)
    audio_s = b * n_samples / cfg.sampling_rate
    report("hifigan_dec_bf16", dt, fl, by, peak_bf16, peak_bw,
           {"audio_s_per_s": round(audio_s / dt, 1)})

    # --- HiFi-GAN decoder, f32 (parity mode) ------------------------------
    dec32 = jax.jit(lambda z: dec(params["dec"], z, g))
    dt = chain_slope(
        lambda z: z0 + 1e-9 * jnp.mean(dec32(z)),
        z0,
        lambda z: float(jnp.sum(z)),
    )
    fl, by = cost_of(dec32, z0)
    report("hifigan_dec_f32", dt, fl, by, peak_f32, peak_bw,
           {"audio_s_per_s": round(audio_s / dt, 1)})

    # --- full convert graph, serving mode (pre-packed dec_cache) -----------
    convert = jax.jit(S.voice_conversion, static_argnames=("cfg", "fast"))
    dec_cache = S.make_dec_cache(params, cfg)
    lengths = jnp.asarray([t] * b, jnp.int32)

    def conv_step(n):
        audio, _ = convert(params, cfg, spec32, lengths, g, g, 0.3, n,
                           fast=True, dec_cache=dec_cache)
        return z0 + 1e-9 * jnp.mean(audio)

    dt = chain_slope(conv_step, z0, lambda n: float(jnp.sum(n)))
    fl, by = cost_of(
        jax.jit(lambda n: convert(params, cfg, spec32, lengths, g, g, 0.3, n,
                                  fast=True, dec_cache=dec_cache)), z0
    )
    report("convert_e2e_fast", dt, fl, by, peak_bf16, peak_bw,
           {"audio_s_per_s": round(audio_s / dt, 1)})


if __name__ == "__main__":
    main()
