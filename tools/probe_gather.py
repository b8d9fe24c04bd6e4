"""Microbench: TPU row-gather lowerings for the dense intersector.

The dense path's per-rank cost is one (N,) row take from a (C, 1152)
table; ideal is HBM-bound (~0.75 ms per 600 MB expansion at 131k).
Measures the realized rate for several lowerings.

  python -u tools/probe_gather.py
"""
import os
import sys
import time

t00 = time.perf_counter()


def stamp(msg):
    print(f"[{time.perf_counter() - t00:8.1f}s] {msg}", flush=True)


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

C = 1861
N = 131072
K = 12

rs = np.random.RandomState(0)
tab = jnp.asarray(rs.rand(C, 9 * 128).astype(np.float32))
tab3 = tab.reshape(C, 9, 128)
tab_flat = tab.reshape(-1)
ids = jnp.asarray(rs.randint(0, C, (N, K)).astype(np.int32))
ids_sorted = jnp.sort(ids, axis=0)  # coherent variant


def timed(tag, fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    gb = out.size * out.dtype.itemsize / 1e9
    stamp(f"{tag}: {dt*1e3:.2f} ms  ({gb/dt:.0f} GB/s out)")
    return out


@jax.jit
def take_rank0(ids):
    return jnp.take(tab, ids[:, 0], axis=0)


@jax.jit
def take_all(ids):
    return jnp.take(tab, ids.reshape(-1), axis=0)


@jax.jit
def take_scan(ids):
    def body(acc, kk):
        r = jnp.take(
            tab, jax.lax.dynamic_index_in_dim(ids, kk, 1, False), axis=0
        )
        return acc + r.sum(), None

    s, _ = jax.lax.scan(
        body, jnp.float32(0), jnp.arange(K, dtype=jnp.int32)
    )
    return s


@jax.jit
def take_narrow(ids):
    # 9 separate 128-wide row takes from (C*9, 128)
    t2 = tab.reshape(C * 9, 128)
    base = ids[:, 0] * 9
    outs = [jnp.take(t2, base + i, axis=0) for i in range(9)]
    return jnp.stack(outs, axis=1)


@jax.jit
def onehot_mxu(ids):
    # (N, C) one-hot @ (C, 1152) on the MXU: N*C*1152 MACs — only to
    # see whether the MXU route beats gather at this C.
    oh = jax.nn.one_hot(ids[:, 0], C, dtype=jnp.bfloat16)
    return jnp.dot(
        oh, tab.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


timed("take rank0 (N rows of 4.6KB)", take_rank0, ids)
timed("take rank0 sorted ids", take_rank0, ids_sorted)
timed("take all K at once (N*K rows)", take_all, ids)
timed("scan over K ranks", take_scan, ids, reps=10)
timed("9x narrow 128-lane takes", take_narrow, ids)
timed("one-hot MXU (rank0)", onehot_mxu, ids)
