"""Piecewise device-time breakdown of the serving convert graph.

Measures, with the same serial-chain slope protocol as bench.py (honest under
the remote-dispatch tunnel), the per-iteration device time of:

  * the full fast-mode convert graph
  * the HiFi-GAN decoder alone (packed fused kernels)
  * the posterior encoder alone (WN-16)
  * the coupling flows alone (4 fwd + 4 rev)

so optimization effort lands where the time is.  Run on the real chip:

    python benchmarks/profile_convert.py [--batch 1] [--frames 896]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def slope(fn, short=8, long_=56, reps=7):
    """Median-of-7 chain slopes with long chains: the sub-ms components
    (flows, enc_q) need far more averaging than the 5+ ms full graph —
    with reps=3/short chains their per-run spread through the dispatch
    tunnel exceeds the quantity being measured (observed flows_ms from
    −0.02 to 0.69 ms run-to-run)."""
    fn(2)  # warm
    ss = sorted((fn(long_) - fn(short)) / (long_ - short) for _ in range(reps))
    return ss[len(ss) // 2]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--frames", type=int, default=896)
    args = ap.parse_args()

    from openvoice_tpu.config import V2_CONVERTER_CONFIG as cfg
    from openvoice_tpu.models import synthesizer as S
    from openvoice_tpu.nn.flows import apply_coupling_block
    from openvoice_tpu.nn.hifigan import apply_generator

    params = S.init_synthesizer(jax.random.PRNGKey(0), cfg)
    dec_cache = S.make_dec_cache(params, cfg)

    b, t = args.batch, args.frames
    rng = np.random.default_rng(0)
    spec = jnp.asarray(np.abs(rng.standard_normal((b, t, cfg.spec_channels))).astype(np.float32))
    lengths = jnp.asarray([t] * b, jnp.int32)
    g_src = jnp.asarray(rng.standard_normal((b, 1, cfg.gin_channels)).astype(np.float32))
    g_tgt = jnp.asarray(rng.standard_normal((b, 1, cfg.gin_channels)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((b, t, cfg.inter_channels)).astype(np.float32))
    mask = jnp.ones((b, t, 1), jnp.bfloat16)
    z16 = jnp.asarray(
        rng.standard_normal((b, t, cfg.inter_channels)).astype(np.float32)
    ).astype(jnp.bfloat16)
    spec16 = spec.astype(jnp.bfloat16)
    g16 = g_src.astype(jnp.bfloat16)
    gz16 = jnp.zeros_like(g16) if cfg.zero_g else g16

    bf = lambda tree: jax.tree.map(lambda a: a.astype(jnp.bfloat16), tree)
    p16 = bf({"enc_q": params["enc_q"], "flow": params["flow"], "dec": params["dec"]})

    convert = jax.jit(S.voice_conversion, static_argnames=("cfg", "fast"))

    @jax.jit
    def dec_only(z, carry):
        z = z + 1e-9 * carry
        audio = apply_generator(
            p16["dec"], z,
            resblock_kind=cfg.resblock,
            resblock_dilation_sizes=cfg.resblock_dilation_sizes,
            upsample_rates=cfg.upsample_rates,
            upsample_kernel_sizes=cfg.upsample_kernel_sizes,
            g=gz16, x_mask=mask, packed=dec_cache,
        )
        return jnp.mean(audio).astype(jnp.bfloat16)

    @jax.jit
    def encq_only(sp, carry):
        sp = sp + 1e-9 * carry
        z, _, _ = S.posterior_encode(p16, cfg, sp, mask, gz16, jnp.bfloat16(0.3), z16)
        return jnp.mean(z).astype(jnp.bfloat16)

    # what full_convert (fast=True + dec_cache) actually runs: the fused
    # whole-direction coupling kernel — timing the unfused path here would
    # misattribute the fused-vs-unfused delta into glue_ms (can go negative)
    from openvoice_tpu.models.synthesizer import _use_fused_coupling
    from openvoice_tpu.ops.coupling_pallas import coupling_g_stack, fused_coupling_block

    use_fused = _use_fused_coupling(z16, t) and "coupling" in dec_cache

    @jax.jit
    def flows_only(z, carry):
        z = z + 1e-9 * carry
        if use_fused:
            g_fwd = coupling_g_stack(p16["flow"], g16, reverse=False, dtype=z.dtype)
            g_rev = coupling_g_stack(p16["flow"], g16, reverse=True, dtype=z.dtype)
            z_p = fused_coupling_block(
                z, lengths, dec_cache["coupling"]["fwd"], g_fwd,
                kernel_size=cfg.flow_kernel_size,
            )
            z_hat = fused_coupling_block(
                z_p, lengths, dec_cache["coupling"]["rev"], g_rev,
                kernel_size=cfg.flow_kernel_size,
            )
        else:
            z_p = apply_coupling_block(p16["flow"], z, mask, g=g16, reverse=False)
            z_hat = apply_coupling_block(p16["flow"], z_p, mask, g=g16, reverse=True)
        return jnp.mean(z_hat).astype(jnp.bfloat16)

    @jax.jit
    def flows_unfused(z, carry):
        z = z + 1e-9 * carry
        z_p = apply_coupling_block(p16["flow"], z, mask, g=g16, reverse=False)
        z_hat = apply_coupling_block(p16["flow"], z_p, mask, g=g16, reverse=True)
        return jnp.mean(z_hat).astype(jnp.bfloat16)

    def chain_full(k):
        n = noise
        t0 = time.perf_counter()
        for _ in range(k):
            audio, _ = convert(params, cfg, spec, lengths, g_src, g_tgt, 0.3, n,
                               fast=True, dec_cache=dec_cache)
            n = noise + 1e-9 * jnp.mean(audio)
        float(jnp.sum(n))
        return time.perf_counter() - t0

    def mk_chain(fn, x0):
        def chain(k):
            c = jnp.bfloat16(0.0)
            t0 = time.perf_counter()
            for _ in range(k):
                c = fn(x0, c)
            float(c)
            return time.perf_counter() - t0
        return chain

    audio_s = b * t * cfg.hop_length / cfg.sampling_rate
    out = {"batch": b, "frames": t, "audio_seconds": round(audio_s, 3)}
    for name, fn in [
        ("full_convert", chain_full),
        ("decoder", mk_chain(dec_only, z16)),
        ("enc_q", mk_chain(encq_only, spec16)),
        ("flows", mk_chain(flows_only, z16)),
        ("flows_unfused", mk_chain(flows_unfused, z16)),
    ]:
        dt = slope(fn)
        out[name + "_ms"] = round(dt * 1e3, 3)
    out["flows_fused"] = bool(use_fused)
    out["glue_ms"] = round(
        out["full_convert_ms"] - out["decoder_ms"] - out["enc_q_ms"] - out["flows_ms"], 3
    )
    out["audio_s_per_s"] = round(audio_s / (out["full_convert_ms"] / 1e3), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
