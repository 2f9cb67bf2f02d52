"""Elastic-training worker child, launched by runtime.elastic.TrainSupervisor
in tests/test_elastic.py with
``python -m tests._elastic_train_child <data_root> <ckpt_dir>
<coordinator|none> <world> <pid> <steps> <die_spec|none>``.

die_spec = "<pid>:<step>:<marker_path>" — that process hard-exits(9) right
after that step, on the FIRST attempt only (marker file gates it).  The
relaunched (possibly shrunk) world resumes from the latest checkpoint.
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
    data_root, ckpt_dir = sys.argv[1], sys.argv[2]
    coordinator = None if sys.argv[3] == "none" else sys.argv[3]
    world, pid, steps = int(sys.argv[4]), int(sys.argv[5]), int(sys.argv[6])
    die_after = None
    if len(sys.argv) > 7 and sys.argv[7] != "none":
        die_pid, die_step, marker = sys.argv[7].split(":", 2)
        if pid == int(die_pid) and not os.path.exists(marker):
            open(marker, "w").close()
            die_after = int(die_step)

    from openvoice_tpu.runtime.elastic import train_worker_main

    train_worker_main(
        data_root, ckpt_dir, TINY,
        coordinator=coordinator, num_processes=world, process_id=pid,
        steps=steps, batch_size=4, segment_frames=16, ckpt_every=4,
        lr=2e-3, adversarial=False, die_after_step=die_after,
    )


if __name__ == "__main__":
    main()
