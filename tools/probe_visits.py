"""Visit-count decomposition of the matrix kernel at the shipped
frame defaults (bs=512 mg=32 worklist+pipeline).

Per-visit cost = kernel ms / total visits; comparing origin-Morton vs
candidate-signature ray ordering separates "fewer/cheaper visits"
(ordering tightens the per-tile cluster unions) from "cheaper MT"
(ordering clumps wanting lanes into fewer mt_group slices — invisible
in visit counts, visible in ms).

  python -u tools/probe_visits.py [atrium_big.glb] [131072]
"""
import os
import sys
import time

t00 = time.perf_counter()


def stamp(msg):
    print(f"[{time.perf_counter() - t00:8.1f}s] {msg}", flush=True)


sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

from hala_tpu.ops.cull import _ID_MASK as _CULL_ID_MASK
from hala_tpu.ops.cull import cull_topk
from hala_tpu.ops.traverse import _coherence_key, intersect_matrix
from hala_tpu.scene.cpu.scene import Scene
from hala_tpu.scene.loader.uploader import SceneUploader

asset = sys.argv[1] if len(sys.argv) > 1 else "atrium_big.glb"
n = int(sys.argv[2]) if len(sys.argv) > 2 else 131072
BS = int(os.environ.get("BS", "512"))

path = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets", asset,
)
scene = SceneUploader.upload(Scene.load(path), use_ray_tracing=False)
g = scene.geometry
jax.block_until_ready(g.tri_v0)
stamp(f"geometry ready (clusters={g.tri_packed.shape[0]}) bs={BS}")

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
tm = jnp.full((n,), 1e7, jnp.float32)


@jax.jit
def order_morton(o, d, tm):
    key = _coherence_key(o, d, tm, g.cluster_min, g.cluster_max)
    srt = jax.lax.sort(
        (key, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], tm),
        num_keys=1,
    )
    return (
        jnp.stack(srt[1:4], axis=1), jnp.stack(srt[4:7], axis=1), srt[7]
    )


@jax.jit
def order_sig(o, d, tm):
    pk, _ = cull_topk(o, d, tm, g.cluster_min, g.cluster_max, k=4)
    id0 = pk[:, 0] & _CULL_ID_MASK
    id1 = pk[:, 1] & _CULL_ID_MASK
    id2 = pk[:, 2] & _CULL_ID_MASK
    key = (id0 << 18) | (id1 << 5) | (id2 >> 8)
    srt = jax.lax.sort(
        (key, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], tm),
        num_keys=1,
    )
    return (
        jnp.stack(srt[1:4], axis=1), jnp.stack(srt[4:7], axis=1), srt[7]
    )


for tag, order in (("morton", order_morton), ("signature", order_sig)):
    o_s, d_s, tm_s = map(jax.block_until_ready, order(o, dd, tm))
    for ah in (False, True):
        fn = lambda: intersect_matrix(
            o_s, d_s, g, t_max=tm_s, any_hit=ah, with_stats=True,
            sublanes=BS, mt_group=32, worklist=True, pipeline=True,
        )
        hit, runs = fn()
        jax.block_until_ready(runs)
        t0 = time.perf_counter()
        reps = 10
        for _ in range(reps):
            hit, runs = fn()
        jax.block_until_ready(runs)
        dt = (time.perf_counter() - t0) / reps
        visits = int(np.asarray(runs).sum())
        per_tile = np.asarray(runs)
        stamp(
            f"{tag} {'any-hit' if ah else 'closest'}: {dt*1e3:.2f} ms, "
            f"visits {visits} (per tile {per_tile.tolist()}), "
            f"{dt/max(visits,1)*1e6:.2f} us/visit"
        )
