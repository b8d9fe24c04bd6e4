"""Wavefront home-turf verdict (VERDICT r4 item 8): bench-grade TPU
measurement on its PREDICTED winning domain — coherent primary and
short AO/shadow batches on the 369-cluster atrium, K=8, own-program
dispatch — vs the matrix champion on the same batches. If it wins, a
scale-gated auto cap re-enables it for that query class; if not, it is
demoted to experimental.

  python -u tools/probe_wf_home.py
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

from probe_common import bounce_rays, load_scene
from hala_tpu.ops.traverse import matrix_query
from hala_tpu.ops.wavefront import intersect_wavefront

scene = load_scene("atrium.glb")
g = scene.geometry
o, d, p, sd, st_ = bounce_rays(scene, tag="atrium")
n = o.shape[0]
stamp(f"rays ready n={n}")

# Short AO rays: bounce directions with a tight t_max (the AO regime —
# most rays terminate in the first cluster or escape fast).
ao_t = jnp.full((n,), 0.35)


def timed(tag, fn, reps=20):
    h = fn()
    jax.block_until_ready(h.t if hasattr(h, "t") else h)
    t0 = time.perf_counter()
    for _ in range(reps):
        h = fn()
    jax.block_until_ready(h.t if hasattr(h, "t") else h)
    dt = (time.perf_counter() - t0) / reps
    stamp(f"{tag}: {dt*1e3:.2f} ms/{n}")
    return h


# PRIMARY-class (coherent camera rays would be even tighter; bounce
# rays from one camera depth are the staged frame's extend class)
timed("matrix closest (champion)", lambda: matrix_query(o, d, g))
timed("wavefront closest k=8 own-program",
      lambda: intersect_wavefront(o, d, g, k_per_ray=8))
# shadow class: point-light shadow rays with per-lane t_max
timed("matrix any-hit shadow",
      lambda: matrix_query(p, sd, g, t_max=st_, any_hit=True))
timed("wavefront any-hit shadow k=8",
      lambda: intersect_wavefront(p, sd, g, t_max=st_, any_hit=True,
                                  k_per_ray=8))
# AO class: short bounce rays
timed("matrix any-hit AO",
      lambda: matrix_query(o, d, g, t_max=ao_t, any_hit=True))
timed("wavefront any-hit AO k=8",
      lambda: intersect_wavefront(o, d, g, t_max=ao_t, any_hit=True,
                                  k_per_ray=8))
