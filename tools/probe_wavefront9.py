#!/usr/bin/env python
"""Round-3 probe #9: wavefront tuning on REALISTIC bounce rays."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp, numpy as np
from probe_common import N, bounce_rays, load_scene, timeit

def main():
    from hala_tpu.ops.traverse import matrix_query
    from hala_tpu.ops.wavefront import intersect_wavefront
    scene = load_scene()
    g = scene.geometry
    ou, du, psurf, sdn, stm = bounce_rays(scene)
    tmx = jnp.full((N,), 3.0e38, jnp.float32)

    timeit("matrix_query bounce", lambda: matrix_query(ou, du, g), iters=5)
    for K, M in ((8, 32), (8, 48), (16, 48), (8, 64)):
        hit, nlist = intersect_wavefront(ou, du, g, k_per_ray=K, m_group=M, with_stats=True)
        jax.block_until_ready(hit.t)
        print(f"  K={K} M={M}: list mean={float(jnp.mean(nlist)):.1f}", flush=True)
        timeit(f"wf K={K} M={M}", lambda K=K, M=M: intersect_wavefront(ou, du, g, k_per_ray=K, m_group=M))
    timeit("wf shadow anyhit K=8 M=32", lambda: intersect_wavefront(psurf, sdn, g, t_max=stm, any_hit=True, k_per_ray=8))
    timeit("matrix shadow anyhit", lambda: matrix_query(psurf, sdn, g, t_max=stm, any_hit=True), iters=5)
    # exactness spot-check
    wf = intersect_wavefront(ou, du, g, k_per_ray=8, m_group=48)
    mx = matrix_query(ou, du, g)
    same = np.asarray(wf.tri == mx.tri)
    print(f"vs matrix tri match={same.mean():.5f}", flush=True)
if __name__ == "__main__":
    main()
