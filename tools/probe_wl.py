"""Validate + time the worklist visit engine vs the branch engine.

Runs matrix_query closest + any-hit with worklist on/off on the big
asset, asserts bit-identical results (both engines run the identical
MT math over the identical visit set, so t/tri/u/v must agree exactly),
and reports per-query times.

  python -u tools/probe_wl.py [atrium_big.glb] [131072]
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

from hala_tpu.ops.traverse import matrix_query
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
far = jnp.full((n,), 1e7)


def timed(tag, fn, reps=20):
    h = fn()
    jax.block_until_ready(h.t)
    stamp(f"{tag}: compiled")
    t0 = time.perf_counter()
    for _ in range(reps):
        h = fn()
    jax.block_until_ready(h.t)
    dt = (time.perf_counter() - t0) / reps
    hits = int(np.asarray(h.tri >= 0).sum())
    stamp(f"{tag}: {dt*1e3:.2f} ms/{n} rays  (hits {hits})")
    return h


for any_hit in (False, True):
    kind = "any-hit" if any_hit else "closest"
    kw = dict(any_hit=any_hit)
    if any_hit:
        kw["t_max"] = far
    h0 = timed(f"{kind} wl=0", lambda: matrix_query(
        o, dd, g, worklist=False, **kw))
    h1 = timed(f"{kind} wl=1", lambda: matrix_query(
        o, dd, g, worklist=True, **kw))
    tri0 = np.asarray(h0.tri)
    tri1 = np.asarray(h1.tri)
    t0_ = np.asarray(h0.t)
    t1_ = np.asarray(h1.t)
    if any_hit:
        agree = float(((tri0 >= 0) == (tri1 >= 0)).mean())
        stamp(f"{kind}: found-agree {agree}")
        assert agree == 1.0, f"{kind} mismatch"
    else:
        agree = float((tri0 == tri1).mean())
        mdt = float(np.abs(t0_ - t1_).max())
        stamp(f"{kind}: tri-agree {agree} max|dt| {mdt}")
        assert agree == 1.0 and mdt == 0.0, f"{kind} mismatch"
stamp("OK worklist == branch")
