"""XLA persistent compilation cache wiring.

Parity: the reference's pipeline cache ./out/pipeline_cache.bin
(rt_renderer.rs:229-240, 258: load-if-exists before pipeline build, save
after). On TPU the compiled artifact is the XLA executable, and the
equivalent mechanism is jax's persistent compilation cache directory:
enabling it makes renderer cold-start (recompile) drop from minutes to
seconds across processes.
"""

from __future__ import annotations

import logging
import os

import jax

logger = logging.getLogger("hala_tpu.cache")

# Anchored to the REPO (two levels above this file), not the process
# cwd: a driver invoking bench.py from elsewhere silently got a fresh
# empty cache per cwd — one candidate for the BENCH_r04 cold-compile
# mystery (workers paid 114-258 s with ./out/xla_cache populated).
DEFAULT_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))),
    "out", "xla_cache",
)


def enable_compilation_cache(cache_dir: str = DEFAULT_CACHE_DIR) -> None:
    """Idempotently enable the persistent compile cache at `cache_dir`."""
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        # Also persist XLA-internal caches (autotune results etc.):
        # under the axon backend the executable itself may fail to
        # serialize, and these side caches still cut recompiles.
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
        logger.info("XLA compilation cache at %s", cache_dir)
    except (OSError, AttributeError) as e:  # pragma: no cover
        logger.warning("Could not enable compilation cache: %s", e)
