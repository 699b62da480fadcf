"""Test configuration: force CPU backend with 8 virtual devices.

This is the TPU-world "multi-node without a cluster" mechanism (SURVEY.md §4):
multi-chip sharding is validated on a virtual 8-device CPU mesh; the driver
separately dry-run-compiles the multi-chip path via __graft_entry__.py.

Must run before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
