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

    # --- per-stage decoder breakdown (serving mode) -------------------------
    # `useful_tflops_per_s` counts only the algorithm's FLOPs; `fold_overhead`
    # is the intrinsic multiplier of the time-folded formulation (dilated taps
    # go block-sparse under folding, and the MXU can't subdivide below a
    # 128×128 tile, so raw MXU work = useful × fold_overhead).  Measured on
    # v5e: raw occupancy is ~peak on every folded stage — the decoder is at
    # its algebraic optimum, the remaining gap to speed-of-light IS the fold
    # overhead on the two narrow stages (C=64: ~1.9×, C=32: ~4.4×).
    _stage_breakdown(params, cfg, t, b, chain_slope, peak_bf16)


def _fold_overhead(kernel_sizes, dilation_sizes, fold: int) -> float:
    """Raw-to-useful FLOP multiplier of the folded MRF stage: for each conv,
    a dense per-q tap matmul costs n_q·fold× the k useful tap matmuls."""
    from openvoice_tpu.ops.mrf_pallas import _folded_conv

    if fold <= 1:
        return 1.0
    raw = useful = 0
    for k, dils in zip(kernel_sizes, dilation_sizes):
        for d in dils:
            for kk, dd in ((k, d), (k, 1)):  # dilated conv + post conv
                qs, _ = _folded_conv(kk, dd, fold)
                raw += len(qs) * fold
                useful += kk
    return raw / useful


def _stage_breakdown(params, cfg, t, b, chain_slope, peak_bf16) -> None:
    import jax
    import jax.numpy as jnp

    from openvoice_tpu.nn.hifigan import _stage_plan, pack_generator_caches

    dec = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params["dec"])
    packed = pack_generator_caches(
        params["dec"],
        resblock_kind=cfg.resblock,
        resblock_dilation_sizes=cfg.resblock_dilation_sizes,
        upsample_rates=cfg.upsample_rates,
        upsample_kernel_sizes=cfg.upsample_kernel_sizes,
    )
    rng = np.random.default_rng(1)
    num_kernels = len(cfg.resblock_dilation_sizes)
    n_stages = len(cfg.upsample_rates)
    t_in, c_in = t, cfg.upsample_initial_channel
    for i, (u, k_up) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        up = dec["ups"][i]
        c_out = up["w"].shape[2]
        plan = _stage_plan(dec, i, u, k_up, n_stages)
        kernel_sizes = tuple(
            dec["resblocks"][i * num_kernels + j]["convs1"][0]["w"].shape[0]
            for j in range(num_kernels)
        )
        xin = jnp.asarray(
            rng.standard_normal((b, t_in, c_in)).astype(np.float32)
        ).astype(jnp.bfloat16)
        step = _make_stage_step(
            dec, cfg, packed, plan, i, u, k_up, kernel_sizes, xin, t_in, b,
            n_stages,
        )
        if step is None:
            print(json.dumps({"stage": f"dec_s{i}", "kind": "xla", "c": int(c_out)}))
        else:
            dt = chain_slope(step, xin, lambda x: float(jnp.sum(x.astype(jnp.float32))))
            t_out = t_in * u
            fl_up = 2 * c_in * c_out * k_up * t_out * b
            fl_mrf = (
                2 * c_out * c_out * t_out * b
                * 2 * sum(k * len(cfg.resblock_dilation_sizes[0]) for k in kernel_sizes)
            )
            fold = plan["fold"] if plan["kind"] != "mrf" or plan["fold"] > 1 else 1
            row = {
                "stage": f"dec_s{i}", "kind": plan["kind"], "c": int(c_out),
                "t_out": t_out, "ms": round(dt * 1e3, 3),
                "useful_tflops_per_s": round((fl_up + fl_mrf) / dt / 1e12, 1),
                "fold_overhead": round(
                    _fold_overhead(kernel_sizes, cfg.resblock_dilation_sizes, fold), 2
                ),
            }
            if peak_bf16:
                row["useful_mxu_util"] = round((fl_up + fl_mrf) / dt / peak_bf16, 3)
            print(json.dumps(row))
        t_in *= u
        c_in = c_out


def _make_stage_step(dec, cfg, packed, plan, i, u, k_up, kernel_sizes, xin,
                     t_in, b, n_stages):
    """One jitted callable running decoder stage i (fused path) whose output
    feeds back into its own input so chain_slope can time it."""
    import jax
    import jax.numpy as jnp

    from openvoice_tpu.nn.conv import conv_transpose1d
    from openvoice_tpu.ops.mrf_pallas import (
        fold_post_taps,
        fold_transpose_taps,
        fused_mrf_stage,
        fused_tail_stage,
        stage_meta,
    )

    if plan is None:
        return None
    dil = tuple(tuple(d) for d in cfg.resblock_dilation_sizes)
    is_last = i == n_stages - 1
    pad_up = (k_up - u) // 2
    key = plan["key"]
    w_all = packed[key]["w"].astype(jnp.bfloat16)
    b_all = packed[key]["b"].astype(jnp.bfloat16)
    if plan["kind"] in ("tail", "upmrf"):
        fold = plan["fold"]
        up_qs = tuple(fold_transpose_taps(k_up, u, pad_up, fold // u)[0])
        mrf_meta = stage_meta(kernel_sizes, cfg.resblock_dilation_sizes, fold)
        post_qs = (
            tuple(fold_post_taps(dec["conv_post"]["w"].shape[0], fold)[0])
            if is_last else None
        )

        @jax.jit
        def step(x):
            lengths = jnp.full((b,), t_in * u, jnp.int32)
            y = fused_tail_stage(
                x, lengths, w_all, b_all, kernel_sizes=kernel_sizes,
                dilation_sizes=dil, stride=u, fold=fold,
                up_qs=up_qs, mrf_meta=mrf_meta, post_qs=post_qs,
            )
            fb = y.reshape(b, -1)[:, :1] * 0.001
            return xin + fb[:, :, None].astype(jnp.bfloat16)

        return step

    up = dec["ups"][i]

    @jax.jit
    def step(x):
        h = jax.nn.leaky_relu(x, 0.1)
        h = conv_transpose1d(h, up["w"], up["b"], stride=u, padding=pad_up)
        lengths = jnp.full((b,), t_in * u, jnp.int32)
        y = fused_mrf_stage(
            h, lengths, w_all, b_all, kernel_sizes=kernel_sizes,
            dilation_sizes=dil, fold=plan["fold"],
        )
        fb = y.reshape(b, -1)[:, :1] * 0.001
        return xin + fb[:, :, None].astype(jnp.bfloat16)

    return step


if __name__ == "__main__":
    main()
