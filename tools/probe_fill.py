"""Price the matrix kernel's per-tile key FILL against its cluster
walk on a large scene.

With t_max=0 every slab test fails, the while_loop sees INF
immediately and exits: the dispatch measures the fill skeleton (C
fori iterations per tile) plus fixed costs. Comparing against real
rays (unsorted, and sorted via matrix_query) splits frame cost into
fill vs walk+MT — the gate for a supercluster prefilter (PLAN round-2
item 2 shape).

  python -u tools/probe_fill.py [atrium_big.glb] [131072]
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

from hala_tpu.ops.traverse import intersect_matrix, matrix_query
from hala_tpu.scene.cpu.scene import Scene
from hala_tpu.scene.loader.uploader import SceneUploader

asset = sys.argv[1] if len(sys.argv) > 1 else "atrium_big.glb"
n = int(sys.argv[2]) if len(sys.argv) > 2 else 131072

path = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets", asset,
)
scene = SceneUploader.upload(Scene.load(path), use_ray_tracing=False)
g = scene.geometry
jax.block_until_ready(g.tri_v0)
stamp(f"upload done (clusters={g.tri_packed.shape[0]})")

rs = np.random.RandomState(0)
v0 = np.asarray(g.tri_v0)
e1 = np.asarray(g.tri_e1)
e2 = np.asarray(g.tri_e2)
real = np.where(np.asarray(g.tri_mat) >= 0)[0]
pick = real[rs.randint(0, len(real), n)]
cent = v0[pick] + e1[pick] / 3 + e2[pick] / 3
lo = v0[real].min(0)
hi = v0[real].max(0)
orig = lo + (hi - lo) * rs.uniform(0.2, 0.8, (n, 3))
d = cent - orig
d /= np.linalg.norm(d, axis=1, keepdims=True)
o = jnp.asarray(orig, jnp.float32)
dd = jnp.asarray(d, jnp.float32)
zero_t = jnp.zeros((n,), jnp.float32)


def timed(tag, fn, reps=20):
    h = fn()
    jax.block_until_ready(h.t)
    t0 = time.perf_counter()
    for _ in range(reps):
        h = fn()
    jax.block_until_ready(h.t)
    dt = (time.perf_counter() - t0) / reps
    hits = int(np.asarray(h.tri >= 0).sum())
    stamp(f"{tag}: {dt*1e3:.2f} ms/{n} rays  (hits {hits})")
    return dt


timed("fill-only (t_max=0)", lambda: intersect_matrix(o, dd, g, t_max=zero_t))
timed("unsorted real", lambda: intersect_matrix(o, dd, g))
timed("sorted real (matrix_query)", lambda: matrix_query(o, dd, g))
timed(
    "sorted any-hit",
    lambda: matrix_query(o, dd, g, t_max=jnp.full((n,), 1e7), any_hit=True),
)
