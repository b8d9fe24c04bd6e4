"""Sweep the keyless matrix kernel's tile height and MT-group size.

The walk cost model: every cluster visit runs the Moller-Trumbore loop
over each mt_group-sublane slice of the tile that contains ANY wanting
lane. Taller tiles amortize the O(C) fill; narrower groups waste fewer
lockstep lanes per visit but pay more scalar loop overhead. Measures
sorted closest + sorted any-hit per combo on the big asset.

  python -u tools/probe_tile.py [atrium_big.glb] [131072]
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
    t0 = time.perf_counter()
    for _ in range(reps):
        h = fn()
    jax.block_until_ready(h.t)
    dt = (time.perf_counter() - t0) / reps
    hits = int(np.asarray(h.tri >= 0).sum())
    stamp(f"{tag}: {dt*1e3:.2f} ms/{n} rays  (hits {hits})")
    return dt


for bs, mg in [(64, 16), (64, 8), (128, 16), (128, 8), (256, 8)]:
    timed(
        f"closest bs={bs} mg={mg}",
        lambda bs=bs, mg=mg: matrix_query(
            o, dd, g, sublanes=bs, mt_group=mg
        ),
    )
    timed(
        f"any-hit bs={bs} mg={mg}",
        lambda bs=bs, mg=mg: matrix_query(
            o, dd, g, t_max=far, any_hit=True, sublanes=bs, mt_group=mg
        ),
    )
