"""Measure the dense gather-MT intersector vs the matrix kernel.

  python -u tools/probe_dense.py [atrium_big.glb] [131072]

Reports per-K dense closest/any-hit times, the truncation fraction,
and exactness vs the matrix kernel (t within canonical bits).
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

from hala_tpu.ops.dense import intersect_dense
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
    t0 = time.perf_counter()
    for _ in range(reps):
        h = fn()
    jax.block_until_ready(h.t)
    dt = (time.perf_counter() - t0) / reps
    hits = int(np.asarray(h.tri >= 0).sum())
    stamp(f"{tag}: {dt*1e3:.2f} ms/{n} rays  (hits {hits})")
    return h


ref = timed("matrix closest (ref)", lambda: matrix_query(o, dd, g))
rt = np.asarray(ref.t)
rtri = np.asarray(ref.tri)

from hala_tpu.ops.cull import cull_topk

for k in [4, 6, 8, 12]:
    h = timed(
        f"dense closest K={k}",
        lambda k=k: intersect_dense(o, dd, g, k=k),
    )
    # exactness: same found mask; t bit-close (both canonicalized
    # winners; tri may flip only on near-ties)
    ht = np.asarray(h.t)
    htri = np.asarray(h.tri)
    same_found = ((htri >= 0) == (rtri >= 0)).mean()
    m = (htri >= 0) & (rtri >= 0)
    dt_rel = np.abs(ht[m] - rt[m]) / np.maximum(rt[m], 1e-6)
    tri_same = (htri[m] == rtri[m]).mean()
    stamp(
        f"  found-agree {same_found*100:.3f}%  tri-agree "
        f"{tri_same*100:.3f}%  max|dt|/t {dt_rel.max():.2e}"
    )
    timed(
        f"dense any-hit K={k}",
        lambda k=k: intersect_dense(
            o, dd, g, t_max=far, k=k, any_hit=True
        ),
    )
    _, cnt = jax.jit(
        lambda k=k: cull_topk(
            o, dd, far, g.cluster_min, g.cluster_max, k=k
        )
    )()
    cn = np.asarray(cnt)
    stamp(
        f"  candidates: mean {cn.mean():.1f} p99 "
        f"{np.percentile(cn, 99):.0f} trunc>{k}: "
        f"{(cn > k).mean()*100:.2f}%"
    )
