"""A/B: branch-interleaved vs sequential MRF conv issue order.

Times the three 128-lane decoder stages of the V2 converter (s1 plain MRF at
C=128, s2 up+MRF at C=64/fold 2, s3 full tail at C=32/fold 4) with the branch
chains issued sequentially vs round-robin (ops/mrf_pallas.py::_run_branches).
A/B reps are interleaved (A, B, A, B, …) because the measurement tunnel's
per-run spread is ±40% — medians of interleaved reps are comparable, single
runs are not.  interleave is a jit static arg, so the two variants are
distinct compiled executables (no cache pollution).

Usage: python benchmarks/bench_interleave.py [--frames 896] [--reps 7]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

from benchmarks.bench_kernels import chain_slope


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=896)
    ap.add_argument("--reps", type=int, default=7)
    args = ap.parse_args()

    from openvoice_tpu.config import V2_CONVERTER_CONFIG as cfg
    from openvoice_tpu.models import synthesizer as S
    from openvoice_tpu.nn.conv import conv_transpose1d
    from openvoice_tpu.nn.hifigan import _stage_plan, pack_generator_caches
    from openvoice_tpu.ops.mrf_pallas import (
        fold_post_taps,
        fold_transpose_taps,
        fused_mrf_stage,
        fused_tail_stage,
        stage_meta,
    )

    b = 1
    params = S.init_synthesizer(jax.random.PRNGKey(0), cfg)
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
    dil = tuple(tuple(d) for d in cfg.resblock_dilation_sizes)

    t_in, c_in = args.frames, cfg.upsample_initial_channel
    for i, (u, k_up) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        up = dec["ups"][i]
        c_out = up["w"].shape[2]
        plan = _stage_plan(dec, i, u, k_up, n_stages)
        t_this, c_this = t_in, c_in
        t_in *= u
        c_in = c_out
        if plan is None:
            continue  # (s0 streams weights; since r3 it interleaves too)
        kernel_sizes = tuple(
            dec["resblocks"][i * num_kernels + j]["convs1"][0]["w"].shape[0]
            for j in range(num_kernels)
        )
        xin = jnp.asarray(
            rng.standard_normal((b, t_this, c_this)).astype(np.float32)
        ).astype(jnp.bfloat16)
        w_all = packed[plan["key"]]["w"].astype(jnp.bfloat16)
        b_all = packed[plan["key"]]["b"].astype(jnp.bfloat16)
        pad_up = plan["pad_up"]
        is_last = i == n_stages - 1

        def make_step(ilv: bool):
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
                    lengths = jnp.full((b,), t_this * u, jnp.int32)
                    y = fused_tail_stage(
                        x, lengths, w_all, b_all, kernel_sizes=kernel_sizes,
                        dilation_sizes=dil, stride=u, fold=fold, up_qs=up_qs,
                        mrf_meta=mrf_meta, post_qs=post_qs, interleave=ilv,
                    )
                    fb = y.reshape(b, -1)[:, :1] * 0.001
                    return xin + fb[:, :, None].astype(jnp.bfloat16)

                return step

            @jax.jit
            def step(x):
                h = jax.nn.leaky_relu(x, 0.1)
                h = conv_transpose1d(h, up["w"], up["b"], stride=u, padding=pad_up)
                lengths = jnp.full((b,), t_this * u, jnp.int32)
                y = fused_mrf_stage(
                    h, lengths, w_all, b_all, kernel_sizes=kernel_sizes,
                    dilation_sizes=dil, fold=plan["fold"], interleave=ilv,
                )
                fb = y.reshape(b, -1)[:, :1] * 0.001
                return xin + fb[:, :, None].astype(jnp.bfloat16)

            return step

        steps = {False: make_step(False), True: make_step(True)}
        rb = lambda x: float(jnp.sum(x.astype(jnp.float32)))
        times: dict[bool, list[float]] = {False: [], True: []}
        for _ in range(args.reps):
            for ilv in (False, True):
                times[ilv].append(
                    chain_slope(steps[ilv], xin, rb, reps=1)
                )
        med = {k: float(np.median(v)) for k, v in times.items()}
        print(json.dumps({
            "stage": f"dec_s{i}", "kind": plan["kind"], "c": int(c_out),
            "sequential_ms": round(med[False] * 1e3, 3),
            "interleaved_ms": round(med[True] * 1e3, 3),
            "speedup": round(med[False] / med[True], 3),
            "reps": args.reps,
        }))


if __name__ == "__main__":
    main()
