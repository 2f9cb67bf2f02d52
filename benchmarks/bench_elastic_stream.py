"""BASELINE config 5 throughput: 256-utterance stream through the LIVE
multi-process lock-step serving tier (serve/elastic_live.py).

Two REAL processes (jax.distributed over 127.0.0.1) serve a 256-request
stream appended live to the LiveWorkLog; wall-clock from first append to
last result.  NOTE the honest caveat: this box has ONE TPU chip behind a
tunnel, so a multi-PROCESS world can only run on the CPU backend with the
tiny protocol-test config — this measures the ROUND-PROTOCOL + worklog
overhead (collective pacing, metadata all-gathers, filesystem results),
not TPU model throughput (bench_stream.py covers the single-process TPU
serving number: ~285 audio-s/s end-to-end).

Usage: python benchmarks/bench_elastic_stream.py [--requests 256]
       [--world 2] [--max-batch 32] [--frames 96]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=256)
    ap.add_argument("--world", type=int, default=2)
    ap.add_argument("--max-batch", type=int, default=32)
    ap.add_argument("--frames", type=int, default=96)
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    from openvoice_tpu.models import synthesizer as S
    from openvoice_tpu.runtime.elastic import _free_port
    from openvoice_tpu.serve.elastic_live import ElasticConvertClient, LiveWorkLog
    from tests._elastic_child import TINY

    state = tempfile.mkdtemp(prefix="ovt_elastic_bench_")
    log = LiveWorkLog(state)
    params = jax.tree.map(np.asarray, S.init_synthesizer(jax.random.PRNGKey(0), TINY))
    log.write_params(params)

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    repo = env["PYTHONPATH"]
    coordinator = f"127.0.0.1:{_free_port()}" if args.world > 1 else "none"

    # inline worker: the test child pins max_batch=2; the bench wants a
    # serving-sized batch, so launch live_worker_main directly
    worker_src = (
        "import os,sys;"
        "os.environ['XLA_FLAGS']=(os.environ.get('XLA_FLAGS','')+' --xla_force_host_platform_device_count=2').strip();"
        f"sys.path.insert(0,{repo!r});"
        "import jax; jax.config.update('jax_platforms','cpu');"
        "from tests._elastic_child import TINY;"
        "from openvoice_tpu.serve.elastic_live import live_worker_main;"
        f"live_worker_main({state!r}, TINY, coordinator={None if args.world == 1 else coordinator!r},"
        f" num_processes={args.world}, process_id=int(sys.argv[1]),"
        f" max_batch={args.max_batch}, cadence_s=0.01, heartbeat_timeout_s=30.0)"
    )
    procs = [
        subprocess.Popen([sys.executable, "-c", worker_src, str(pid)], env=env)
        for pid in range(args.world)
    ]

    client = ElasticConvertClient(state, TINY, poll_s=0.01)
    rng = np.random.default_rng(0)
    nf = args.frames
    specs = np.abs(rng.standard_normal(
        (args.requests, nf, TINY.spec_channels))).astype(np.float32)
    ses = rng.standard_normal((args.requests, 2, TINY.gin_channels)).astype(np.float32)

    t0 = time.perf_counter()
    ids = [
        client.submit(specs[i], ses[i, 0], ses[i, 1], seed=i)
        for i in range(args.requests)
    ]
    done = [client.result(i, timeout=600) for i in ids]
    dt = time.perf_counter() - t0
    log.signal_stop()
    for p in procs:
        p.wait(timeout=120)

    audio_s = args.requests * nf * TINY.hop_length / TINY.sampling_rate
    assert all(len(d) == nf * TINY.upsample_factor for d in done)
    print(json.dumps({
        "metric": "elastic_live_stream_requests_per_second",
        "value": round(args.requests / dt, 2),
        "unit": "req/s through the live collective round protocol "
                "(CPU, tiny config — see docstring caveat)",
        "requests": args.requests,
        "world": args.world,
        "wall_s": round(dt, 2),
        "rounds_batch": args.max_batch,
        "audio_seconds_per_second_tiny": round(audio_s / dt, 2),
    }))


if __name__ == "__main__":
    main()
