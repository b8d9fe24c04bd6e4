"""Is the wavefront TPU compile wall the VARIADIC SORT?

intersect_wavefront carries its per-ray top-K candidate columns as
lax.sort payloads: 10 + K operands (26 at K=16). matrix_query's sort
has 9 operands and compiles in ~80 s; the wavefront pair at K=16 never
finished (>880 s) while K=8 (18 operands) compiled in 188 s — every
measured point is consistent with compile time exploding in sort
operand count, not in kernel code (the Pallas walker is m-bounded and
the cull alone compiles in 1.4 s). This probe compiles ONLY a
monolithic variadic sort at the frame batch size for rising operand
counts and prints each compile time.

  timeout 1200 python -u tools/probe_sortwall.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

t00 = time.perf_counter()


def stamp(msg):
    print(f"[{time.perf_counter() - t00:8.1f}s] {msg}", flush=True)


N = int(os.environ.get("N", "131072"))
key = jax.random.PRNGKey(0)
k32 = jax.random.randint(key, (N,), 0, 1 << 30, jnp.int32)
f = jax.random.uniform(key, (N,), jnp.float32)

for n_ops in (2, 10, 18, 26):
    def fn(k32, f, n_ops=n_ops):
        ops = (k32,) + tuple(f + i for i in range(n_ops - 1))
        return jax.lax.sort(ops, num_keys=1)[1]

    t0 = time.perf_counter()
    out = jax.jit(fn).lower(k32, f).compile()
    stamp(f"sort {n_ops} operands: compile {time.perf_counter() - t0:.1f}s")
