"""TPU correctness check of the fused-decoder dispatch wiring.

The Pallas kernels themselves are covered by interpret-mode unit tests
(tests/test_mrf_pallas.py); what those can't cover is the TPU-only dispatch
logic in apply_generator (stage plans, length threading, mask elision).
This script runs the real fused bf16 path on a bucket-padded input against
the unfused f32 XLA path on the same input and checks:

  * valid samples agree to bf16 tolerance;
  * samples past the true length are exactly zero in both (mask semantics).

Run on the real chip:  python benchmarks/check_fused_decoder.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main() -> None:
    from openvoice_tpu.config import V2_CONVERTER_CONFIG as cfg
    from openvoice_tpu.models import synthesizer as S
    from openvoice_tpu.nn.hifigan import apply_generator

    params = S.init_synthesizer(jax.random.PRNGKey(0), cfg)
    dec_cache = S.make_dec_cache(params, cfg)

    b, t, true_t = 2, 896, 861
    up = int(np.prod(cfg.upsample_rates))
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((b, t, cfg.inter_channels)).astype(np.float32))
    lengths = jnp.asarray([true_t, 640], jnp.int32)
    mask = (jnp.arange(t)[None, :, None] < lengths[:, None, None]).astype(jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, 1, cfg.gin_channels)).astype(np.float32))

    kw = dict(
        resblock_kind=cfg.resblock,
        resblock_dilation_sizes=cfg.resblock_dilation_sizes,
        upsample_rates=cfg.upsample_rates,
        upsample_kernel_sizes=cfg.upsample_kernel_sizes,
    )
    run = jax.jit(
        lambda zz, mm, gg: apply_generator(params["dec"], zz * mm, g=gg, x_mask=mm, **kw)
    )
    bf = lambda a: jax.tree.map(lambda x: x.astype(jnp.bfloat16), a)
    dec16 = bf(params["dec"])
    run16 = jax.jit(
        lambda zz, mm, gg: apply_generator(
            dec16, (zz * mm).astype(jnp.bfloat16), g=gg.astype(jnp.bfloat16),
            x_mask=mm.astype(jnp.bfloat16), packed=dec_cache, **kw
        )
    )

    ref = np.asarray(run(z, mask, g), np.float32)
    got = np.asarray(run16(z, mask, g), np.float32)

    report = {}
    ok = True
    for i, L in enumerate([true_t, 640]):
        n = L * up
        diff = np.max(np.abs(ref[i, :n, 0] - got[i, :n, 0]))
        # past-the-end samples: both paths must produce ~0 beyond the
        # conv_post spill window (mask semantics); check well past it
        spill = 64
        tail16 = np.max(np.abs(got[i, n + spill:, 0])) if n + spill < got.shape[1] else 0.0
        report[f"utt{i}"] = {
            "valid_max_abs_diff": round(float(diff), 5),
            "tail_max_abs_bf16": round(float(tail16), 7),
        }
        ok &= diff < 5e-2 and tail16 == 0.0
    report["ok"] = bool(ok)
    print(json.dumps(report))
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
