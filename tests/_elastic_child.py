"""Elastic-recovery worker child, launched by runtime.elastic.Supervisor in
tests/test_elastic.py with
``python -m tests._elastic_child <state_dir> <coordinator|none> <world> <pid>
[round_sleep_s]``.

Processes its share of the WorkLog through the lock-step
DistributedConvertService; killed workers (SIGKILL from the test) and their
fatally-terminated peers are relaunched by the Supervisor as a shrunk world.
"""

from __future__ import annotations

import os
import sys

# IMPORTANT: only mutate the process environment when running AS the child.
# This module is also imported by tests/test_elastic.py (for TINY), and an
# unconditional append here would override conftest's 8-virtual-device
# XLA_FLAGS for the whole pytest process (last flag wins → 2 devices).
if __name__ == "__main__":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")

from openvoice_tpu.config import SynthesizerConfig  # noqa: E402

# shared with tests/test_elastic.py (imported from here so child and test
# always agree)
TINY = SynthesizerConfig(
    spec_channels=33, inter_channels=16, hidden_channels=16,
    filter_channels=32, n_heads=2, n_layers=1, kernel_size=3,
    p_dropout=0.0, resblock="2", resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 2),), upsample_rates=(4,),
    upsample_initial_channel=16, upsample_kernel_sizes=(8,),
    n_speakers=0, gin_channels=8, zero_g=True,
    filter_length=64, hop_length=4, win_length=64,
)


def main() -> None:
    state_dir = sys.argv[1]
    coordinator = None if sys.argv[2] == "none" else sys.argv[2]
    world, pid = int(sys.argv[3]), int(sys.argv[4])
    round_sleep = float(sys.argv[5]) if len(sys.argv) > 5 else 0.0
    # fault injection: "<pid>:<round>:<marker_path>" — that process dies
    # after that round, on the FIRST attempt only (marker file gates it)
    die_after = None
    if len(sys.argv) > 6 and sys.argv[6] != "none":
        die_pid, die_round, marker = sys.argv[6].split(":", 2)
        if pid == int(die_pid) and not os.path.exists(marker):
            open(marker, "w").close()
            die_after = int(die_round)

    from openvoice_tpu.runtime.elastic import worker_main

    worker_main(
        state_dir, TINY,
        coordinator=coordinator, num_processes=world, process_id=pid,
        max_batch=2, heartbeat_timeout_s=6.0, round_sleep_s=round_sleep,
        die_after_round=die_after,
    )


if __name__ == "__main__":
    main()
