"""Diagnose cross-process XLA persistent-cache misses under axon.

The cache key (jax._src.cache_key.get) hashes: computation, jaxlib
version, backend version, XLA flags, compile_options,
accelerator_config, compression, custom_hook. Identical code in two
fresh processes produced four distinct jit__stage_extend entries
(out/xla_cache), so one of those components is process-varying under
the axon tunnel. This probe compiles one fixed function with DEBUG
logging on the cache-key module, printing each component's hash —
run it twice and diff the lines.

  python -u tools/probe_cache.py > out/probe_logs/r4/cache_a.log 2>&1
  python -u tools/probe_cache.py > out/probe_logs/r4/cache_b.log 2>&1
"""
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.WARNING, stream=sys.stdout)
for name in ("jax._src.cache_key", "jax._src.compilation_cache",
             "jax._src.compiler"):
    logging.getLogger(name).setLevel(logging.DEBUG)

import jax
import jax.numpy as jnp

from hala_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


@jax.jit
def probe_fn(x):
    def body(i, acc):
        return acc + jnp.sin(acc) * 1e-3 + jnp.float32(i)

    y = jax.lax.fori_loop(0, 64, body, x)
    return (y @ y.T).sum()


t0 = time.perf_counter()
x = jnp.ones((333, 128), jnp.float32)  # odd shape: unique to this probe
out = probe_fn(x)
jax.block_until_ready(out)
print(f"[probe_cache] compile+run {time.perf_counter() - t0:.2f}s "
      f"result {float(out):.3e}", flush=True)
