"""Multi-host runtime: process initialization, global meshes, failure
detection (SURVEY.md §2.3 "Multi-host launcher" / §5.3 — new capability; the
reference is strictly single-process, api.py:17).

Topology model: one JAX process per host, chips within a host joined by ICI,
hosts joined by DCN.  The ("data", "model") mesh is laid out so the `model`
axis (tensor/sequence parallel — high-bandwidth collectives) stays inside a
host's ICI domain and `data` (batch parallel — gradient/metric all-reduce
only) spans hosts over DCN, the layout the scaling targets assume
(BASELINE.md ≥85% efficiency at N≥2 hosts).

Single-host (or test) processes degrade gracefully: `initialize()` is a
no-op when no coordinator is configured, and `global_mesh()` then equals
`make_mesh()` over local devices.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import numpy as np

import jax
from jax.sharding import Mesh

from openvoice_tpu.runtime.mesh import make_mesh


@dataclass(frozen=True)
class HostTopology:
    process_id: int
    num_processes: int
    local_device_count: int
    global_device_count: int


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> HostTopology:
    """Join (or skip) the multi-host cluster.

    Arguments default to the standard env vars (COORDINATOR_ADDRESS,
    NUM_PROCESSES, PROCESS_ID) so one launcher script works under any
    process runner; with none set this is single-process and a no-op.
    """
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    # IMPORTANT: nothing may touch the jax backend (process_count, devices,
    # any computation) before jax.distributed.initialize — probe the client
    # state directly instead
    already_initialized = jax._src.distributed.global_state.client is not None
    if coordinator_address and not already_initialized:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes or int(os.environ.get("NUM_PROCESSES", "1")),
            process_id=process_id if process_id is not None else int(os.environ.get("PROCESS_ID", "0")),
        )
    return HostTopology(
        process_id=jax.process_index(),
        num_processes=jax.process_count(),
        local_device_count=jax.local_device_count(),
        global_device_count=jax.device_count(),
    )


def global_mesh(model_parallel: int | None = None) -> Mesh:
    """("data", "model") mesh over ALL processes' devices with `model` kept
    inside each host's ICI domain.

    jax.devices() orders devices by process, so reshaping [data, model] with
    model ≤ local_device_count keeps every model-axis group on one host —
    TP/SP collectives ride ICI, only the data axis crosses DCN.
    """
    local = jax.local_device_count()
    model = model_parallel or 1
    if model > local:
        raise ValueError(
            f"model_parallel={model} exceeds local device count {local}; "
            "the model axis must stay inside one host's ICI domain"
        )
    if local % model:
        # e.g. 8 local devices, model=3: reshape would put a model group
        # across the host boundary and its collectives onto DCN
        raise ValueError(
            f"model_parallel={model} must divide the local device count "
            f"{local} so every model group stays inside one host's ICI domain"
        )
    total = jax.device_count()
    if total % model:
        raise ValueError(f"{total} devices not divisible by model_parallel={model}")
    if jax.process_count() == 1:
        return make_mesh(total, data=total // model, model=model)
    devices = np.asarray(jax.devices()).reshape(total // model, model)
    return Mesh(devices, ("data", "model"))


# ---------------------------------------------------------------------------
# Failure detection (SURVEY.md §5.3)
# ---------------------------------------------------------------------------

class HeartbeatMonitor:
    """Detects dead hosts via a timed all-reduce heartbeat.

    The collective either completes (everyone alive) or times out (a host is
    gone); the caller decides whether to re-init with survivors or abort the
    batch.  Fault injection for tests: `inject_failure()` makes this host
    stop participating.
    """

    def __init__(self, timeout_s: float = 60.0):
        self.timeout_s = timeout_s
        self._injected = False
        self._beats = 0

    def inject_failure(self) -> None:
        self._injected = True

    def beat(self) -> bool:
        """True if all hosts responded within the timeout.

        The barrier runs in a worker thread because sync_global_devices has
        no timeout of its own — a dead peer would otherwise hang the
        monitor on exactly the failure it exists to detect.  A timed-out
        barrier thread is left behind (daemonized); the caller is expected
        to tear down or re-initialize the distributed runtime on False.
        """
        if self._injected:
            return False
        beats = self._beats
        result: list[bool] = []

        def barrier() -> None:
            try:
                if jax.process_count() > 1:
                    from jax.experimental import multihost_utils

                    multihost_utils.sync_global_devices(f"heartbeat-{beats}")
                else:
                    jax.block_until_ready(jax.numpy.ones(()))
                result.append(True)
            except Exception:  # noqa: BLE001 — any collective failure = dead host
                result.append(False)

        import threading

        t = threading.Thread(target=barrier, daemon=True)
        t.start()
        t.join(self.timeout_s)
        if t.is_alive() or not result or not result[0]:
            return False
        self._beats += 1
        return True
