"""Persistent XLA compilation cache for the CLI entry points.

The fine-tune step compiles in ~2 minutes on a v5e chip but runs 230
iterations in ~15 s — and ``batched_finetune`` spawns one ``train.py``
process per avatar (30 in the paper protocol), so without a persistent
cache the sweep spends ~1 h recompiling the SAME program.  JAX's
compilation cache keys on the HLO + compiler version, so every process
after the first loads the executable in seconds.

Default location: ``$LATENTPOSE_COMPILE_CACHE`` or
``~/.cache/latentpose_tpu/xla``.  Set ``LATENTPOSE_COMPILE_CACHE=off`` to
disable.  (The reference has no analog — torch eager recompiles nothing,
but also fuses nothing.)
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

logger = logging.getLogger("latentpose_tpu.compile_cache")


def enable_persistent_compilation_cache() -> None:
    """Idempotent; call before the first jit compilation."""
    target = os.environ.get("LATENTPOSE_COMPILE_CACHE", "")
    if target.lower() == "off":
        return
    if not target:
        target = str(Path.home() / ".cache" / "latentpose_tpu" / "xla")
    try:
        import jax

        if jax.default_backend() == "cpu":
            # XLA:CPU persists AOT results whose recorded machine features
            # (incl. pseudo-features like +prefer-no-gather) fail the
            # load-time host check on this fleet — every lookup then logs a
            # cpu_aot_loader error and recompiles anyway.  Measured: a warm
            # flagship dryrun with the cache was SLOWER than cold.  The
            # cache stays TPU-only.
            logger.info("compilation cache disabled on the CPU backend "
                        "(XLA:CPU AOT machine-feature check is unreliable)")
            return

        Path(target).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", target)
        # cache anything that took meaningful compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        logger.info("persistent XLA compilation cache at %s", target)
    except Exception as exc:  # cache is an optimization, never fatal
        logger.warning("compilation cache unavailable: %s", exc)
