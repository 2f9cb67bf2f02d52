"""A/B honesty benchmark: torch reference vs this framework on IDENTICAL
hardware (CPU), same audio, same weights (VERDICT r1 weak #7).

The reference publishes no numbers and needs a GPU for its intended use, so
the headline `vs_baseline` in bench.py is measured against the 10×-real-time
north-star target, not against a measured torch run.  This bench grounds the
story: full-size V2 converter, random weights imported from the SAME torch
state_dict, one 10 s utterance, single-threaded CPU on both sides.

Usage:
  JAX_PLATFORMS=cpu python benchmarks/bench_ab_torch.py [--seconds 10] [--iters 3]

Prints one JSON line with both wall times and the ratio.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_cpu_multi_thread_eigen=false "
                      "intra_op_parallelism_threads=1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import numpy as np
    import torch

    torch.set_num_threads(1)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, "/root/reference")  # torch oracle (imported, never copied)
    from openvoice.models import SynthesizerTrn

    from openvoice_tpu.ckpt.torch_import import import_synthesizer
    from openvoice_tpu.config import V2_CONVERTER_CONFIG as cfg
    from openvoice_tpu.models import synthesizer as S

    torch.manual_seed(0)
    model = SynthesizerTrn(
        0, cfg.spec_channels,
        inter_channels=cfg.inter_channels, hidden_channels=cfg.hidden_channels,
        filter_channels=cfg.filter_channels, n_heads=cfg.n_heads,
        n_layers=cfg.n_layers, kernel_size=cfg.kernel_size, p_dropout=cfg.p_dropout,
        resblock=cfg.resblock,
        resblock_kernel_sizes=list(cfg.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in cfg.resblock_dilation_sizes],
        upsample_rates=list(cfg.upsample_rates),
        upsample_initial_channel=cfg.upsample_initial_channel,
        upsample_kernel_sizes=list(cfg.upsample_kernel_sizes),
        n_speakers=0, gin_channels=cfg.gin_channels, zero_g=cfg.zero_g,
    ).eval()
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    params, report = import_synthesizer(sd, cfg)
    assert not report["missing"], report["missing"]

    t_frames = int(args.seconds * cfg.sampling_rate / cfg.hop_length)
    rng = np.random.default_rng(0)
    spec = np.abs(rng.standard_normal((1, cfg.spec_channels, t_frames))).astype(np.float32)
    g_src = rng.standard_normal((1, cfg.gin_channels, 1)).astype(np.float32)
    g_tgt = rng.standard_normal((1, cfg.gin_channels, 1)).astype(np.float32)

    # --- torch reference timing (api.py:154 path, tau=0.3 default semantics)
    spec_t = torch.from_numpy(spec)
    len_t = torch.tensor([t_frames])
    gs_t, gt_t = torch.from_numpy(g_src), torch.from_numpy(g_tgt)
    with torch.no_grad():
        model.voice_conversion(spec_t, len_t, gs_t, gt_t, tau=0.3)  # warmup
        times_t = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            audio_t = model.voice_conversion(spec_t, len_t, gs_t, gt_t, tau=0.3)[0]
            times_t.append(time.perf_counter() - t0)
    torch_s = sorted(times_t)[len(times_t) // 2]

    # --- JAX timing (same graph: enc_q → flows fwd/rev → decoder)
    convert = jax.jit(S.voice_conversion, static_argnames=("cfg", "fast"))
    spec_j = jnp.asarray(np.swapaxes(spec, 1, 2))
    lens_j = jnp.asarray([t_frames])
    gs_j = jnp.asarray(np.swapaxes(g_src, 1, 2))
    gt_j = jnp.asarray(np.swapaxes(g_tgt, 1, 2))
    noise = jnp.asarray(rng.standard_normal((1, t_frames, cfg.inter_channels)).astype(np.float32))
    jax.block_until_ready(convert(params, cfg, spec_j, lens_j, gs_j, gt_j, 0.3, noise)[0])
    times_j = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        out = convert(params, cfg, spec_j, lens_j, gs_j, gt_j, 0.3, noise)[0]
        jax.block_until_ready(out)
        times_j.append(time.perf_counter() - t0)
    jax_s = sorted(times_j)[len(times_j) // 2]

    audio_seconds = t_frames * cfg.hop_length / cfg.sampling_rate
    print(json.dumps({
        "metric": "ab_cpu_voice_conversion_wall_s",
        "audio_seconds": audio_seconds,
        "torch_cpu_s": round(torch_s, 3),
        "jax_cpu_s": round(jax_s, 3),
        "jax_over_torch_speedup": round(torch_s / jax_s, 3),
        "threads": 1,
    }))


if __name__ == "__main__":
    main()
