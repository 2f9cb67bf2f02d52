"""Child process for the real 2-process jax.distributed test.

Launched by tests/test_multihost.py::test_two_process_distributed_run with
`python -m tests._multiproc_child <coordinator> <num_procs> <pid>`.
Each process: joins the cluster through runtime.multihost.initialize (the
REAL cross-process bootstrap, not the single-process no-op), builds the
global data mesh, assembles a global batch from host-local shards
(make_global_batch), runs one psum and one data-parallel small-model
voice_conversion step, and checks both against locally-computed truth.

Exit code 0 = every assertion passed in this process.
"""

from __future__ import annotations

import os
import sys

# 2 virtual CPU devices per process -> 4 global devices over 2 processes.
# The axon TPU plugin ignores JAX_PLATFORMS, so pin the platform via config
# (same workaround as tests/conftest.py).
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    coordinator, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from openvoice_tpu.runtime import multihost as MH

    topo = MH.initialize(
        coordinator_address=coordinator, num_processes=num_procs, process_id=pid
    )
    assert topo.num_processes == num_procs, topo
    assert topo.process_id == pid, topo
    assert topo.local_device_count == 2, topo
    assert topo.global_device_count == 2 * num_procs, topo

    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    jax.config.update("jax_default_matmul_precision", "highest")

    mesh = MH.global_mesh(model_parallel=1)
    assert dict(mesh.shape) == {"data": 2 * num_procs, "model": 1}

    # --- global batch from host-local shards + psum-equivalent reduction
    from openvoice_tpu.training.data import make_global_batch

    local = np.arange(4, dtype=np.float32) + 10.0 * pid  # 4 rows/process
    batch = make_global_batch(local.reshape(4, 1), mesh)
    assert batch.shape == (4 * num_procs, 1)
    total = jax.jit(lambda b: jnp.sum(b), out_shardings=None)(batch)
    expected = sum(float(np.sum(np.arange(4) + 10.0 * p)) for p in range(num_procs))
    assert abs(float(total) - expected) < 1e-6, (float(total), expected)

    # --- one DP convert step on a small model, vs local single-device truth
    from openvoice_tpu.config import SynthesizerConfig
    from openvoice_tpu.models import synthesizer as S

    cfg = SynthesizerConfig(
        spec_channels=33, inter_channels=16, hidden_channels=16,
        filter_channels=32, n_heads=2, n_layers=1, kernel_size=3,
        p_dropout=0.0, resblock="2", resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),), upsample_rates=(4,),
        upsample_initial_channel=16, upsample_kernel_sizes=(8,),
        n_speakers=0, gin_channels=8, zero_g=True,
    )
    params = S.init_synthesizer(jax.random.PRNGKey(0), cfg)

    b_global, t = 4 * num_procs, 24
    rng = np.random.default_rng(7)  # same on every process
    spec_all = np.abs(rng.standard_normal((b_global, t, cfg.spec_channels))).astype(np.float32)
    g_all = rng.standard_normal((b_global, 1, cfg.gin_channels)).astype(np.float32)
    noise_all = rng.standard_normal((b_global, t, cfg.inter_channels)).astype(np.float32)
    lengths_all = np.full((b_global,), t, np.int32)

    rows = slice(4 * pid, 4 * (pid + 1))
    gspec = make_global_batch(spec_all[rows], mesh, spec=P("data"))
    glen = make_global_batch(lengths_all[rows], mesh, spec=P("data"))
    gg = make_global_batch(g_all[rows], mesh, spec=P("data"))
    gnoise = make_global_batch(noise_all[rows], mesh, spec=P("data"))
    greps = jax.device_put(
        params, NamedSharding(mesh, P())  # replicated weights
    )

    convert = jax.jit(S.voice_conversion, static_argnames=("cfg", "fast"))
    audio, _ = convert(greps, cfg, gspec, glen, gg, gg, 0.0, gnoise)
    # my local rows, fetched from the global result (tiled=True: the array
    # is already globally shaped, gather returns it whole on every process)
    from jax.experimental import multihost_utils

    mine = np.asarray(multihost_utils.process_allgather(audio, tiled=True))[rows]

    # truth: the same graph over fully-REPLICATED inputs (every device
    # computes the whole batch) — a single-device jit is impossible once the
    # process backend is multi-host, but a replicated run is equivalent
    rep = lambda a: make_global_batch(np.asarray(a), mesh, spec=P())
    ref_all, _ = convert(
        greps, cfg, rep(spec_all), rep(lengths_all), rep(g_all), rep(g_all),
        0.0, rep(noise_all),
    )
    ref = np.asarray(multihost_utils.process_allgather(ref_all, tiled=True))[rows]
    np.testing.assert_allclose(mine, ref, atol=1e-5, rtol=1e-5)

    # --- barrier so both processes finish the collective phase together
    multihost_utils.sync_global_devices("child-done")
    print(f"child {pid}: ok", flush=True)


if __name__ == "__main__":
    main()
