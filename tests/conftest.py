"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so sharding/mesh tests work
without a pod (SURVEY.md §4 point 3).  Must set env before importing jax.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# The upstream reference (read-only, torch) is used as a numerical oracle in
# parity tests.  We import it — we never copy it.
REFERENCE_ROOT = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "openvoice"))


def add_reference_to_path() -> None:
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
