"""Live elastic-serving worker child, launched by serve.elastic_live
.LiveSupervisor in tests/test_elastic_live.py with
``python -m tests._elastic_live_child <state_dir> <coordinator|none> <world>
<pid> [die_spec|none]``.

die_spec = "<pid>:<count>:<marker_path>" — that process hard-exits(9) after
COMPLETING that many requests, on the first attempt only (marker-gated):
a mid-stream host death while requests keep arriving.
"""

from __future__ import annotations

import os
import sys

# only mutate the environment when running AS the child (see
# tests/_elastic_child.py for why an unconditional write breaks conftest)
if __name__ == "__main__":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")

from tests._elastic_child import TINY  # noqa: E402  (shared tiny config)


def main() -> None:
    state_dir = sys.argv[1]
    coordinator = None if sys.argv[2] == "none" else sys.argv[2]
    world, pid = int(sys.argv[3]), int(sys.argv[4])
    die_after = None
    if len(sys.argv) > 5 and sys.argv[5] != "none":
        die_pid, count, marker = sys.argv[5].split(":", 2)
        if pid == int(die_pid) and not os.path.exists(marker):
            open(marker, "w").close()
            die_after = int(count)

    from openvoice_tpu.serve.elastic_live import live_worker_main

    live_worker_main(
        state_dir, TINY,
        coordinator=coordinator, num_processes=world, process_id=pid,
        max_batch=2, cadence_s=0.05, heartbeat_timeout_s=6.0,
        die_after_done=die_after,
    )


if __name__ == "__main__":
    main()
