"""Test configuration: force CPU backend with 8 virtual devices.

This is the TPU-world "multi-node without a cluster" mechanism (SURVEY.md §4):
multi-chip sharding is validated on a virtual 8-device CPU mesh; the driver
separately dry-run-compiles the multi-chip path via __graft_entry__.py.

NOTE: the environment's sitecustomize force-registers the remote 'axon' TPU
platform and overrides JAX_PLATFORMS, so we must reset jax.config *after*
importing jax — env vars alone are not enough here.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: repeated test runs skip recompiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/latentpose_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# NOTE: no persistent compilation cache here — XLA:CPU's AOT cache fails
# its load-time machine-feature check on this fleet (cpu_aot_loader errors,
# then recompiles anyway); utils/compile_cache.py gates it to TPU backends.
