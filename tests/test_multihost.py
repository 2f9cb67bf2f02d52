"""Multi-host runtime tests (single-process degradation + fault injection)."""

import jax
import pytest

from openvoice_tpu.runtime import multihost as MH


def test_initialize_single_process_noop():
    topo = MH.initialize()
    assert topo.num_processes == 1
    assert topo.process_id == 0
    assert topo.global_device_count >= 1


def test_global_mesh_layout():
    mesh = MH.global_mesh(model_parallel=2)
    assert mesh.axis_names == ("data", "model")
    assert mesh.shape["model"] == 2
    assert mesh.shape["data"] * 2 == jax.device_count()


def test_global_mesh_rejects_oversized_model_axis():
    with pytest.raises(ValueError, match="ICI"):
        MH.global_mesh(model_parallel=jax.local_device_count() * 2)


def test_heartbeat_and_fault_injection():
    mon = MH.HeartbeatMonitor(timeout_s=30.0)
    assert mon.beat()
    mon.inject_failure()
    assert not mon.beat()
