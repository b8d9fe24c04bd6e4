#!/usr/bin/env python
"""Round-3 probe #5: wavefront v2 (internal signature sort, per-lane
exit bounds, want-mask entry skips) on TPU, atrium bounce rays."""
import os, sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
N = 131072
def timeit(name, fn, *args, iters=10):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*args)
    jax.block_until_ready(out)
    print(f"PROBE {name}: {(time.perf_counter()-t0)/iters*1000:.3f} ms", flush=True)
    return out
def main():
    from hala_tpu.ops.traverse import intersect_matrix, matrix_query
    from hala_tpu.ops.wavefront import intersect_wavefront
    from hala_tpu.ops.cull import cull_topk
    from hala_tpu.ops.camera import generate_rays
    from hala_tpu.ops import rng
    from hala_tpu.ops.sampling import build_basis, normalize
    from hala_tpu.scene.cpu.scene import Scene
    from hala_tpu.scene.loader.uploader import SceneUploader
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene = SceneUploader.upload(Scene.load(os.path.join(root, "assets", "atrium.glb")), use_ray_tracing=False)
    g = scene.geometry
    print(f"SCENE tris={g.num_triangles} clusters={g.tri_packed.shape[0]}", flush=True)

    @jax.jit
    def make_bounce():
        pix = jnp.arange(N, dtype=jnp.int32)
        px = (pix % 512).astype(jnp.float32)
        py = (pix // 512).astype(jnp.float32) * 4.0
        r = rng.sample4(pix, jnp.uint32(0), 0, seed=1)
        o, d = generate_rays(scene.cameras, jnp.int32(0), px, py, 512, 1024, r[:, :2], r[:, 2:])
        hit = intersect_matrix(o, d, g)
        tid = jnp.maximum(hit.tri, 0)
        e1 = jnp.take(g.tri_e1, tid, axis=0); e2 = jnp.take(g.tri_e2, tid, axis=0)
        nrm = normalize(jnp.cross(e1, e2))
        nrm = jnp.where(jnp.sum(nrm * d, -1, keepdims=True) > 0, -nrm, nrm)
        ok = hit.tri >= 0
        p = o + hit.t[:, None] * d + nrm * 1e-4
        r2 = rng.sample4(pix, jnp.uint32(0), 1, seed=2)
        t_b, b_b = build_basis(nrm)
        phi = 2.0 * jnp.pi * r2[:, 0]; st = jnp.sqrt(r2[:, 1]); ct = jnp.sqrt(jnp.maximum(1.0 - r2[:, 1], 0.0))
        wi = (jnp.cos(phi)*st)[:, None]*t_b + (jnp.sin(phi)*st)[:, None]*b_b + ct[:, None]*nrm
        return jnp.where(ok[:, None], p, o), jnp.where(ok[:, None], wi, d), hit.t, nrm, ok, p

    ou, du, t0_, nrm, okm, psurf = make_bounce()
    jax.block_until_ready(ou)
    print("BOUNCE ready", flush=True)
    tmx = jnp.full((N,), 3.0e38, jnp.float32)

    timeit("cull v3 K=8", lambda: cull_topk(ou, du, tmx, g.cluster_min, g.cluster_max, k=8))
    timeit("cull v3 K=16", lambda: cull_topk(ou, du, tmx, g.cluster_min, g.cluster_max, k=16))
    timeit("wf2 K=8 M=32", lambda: intersect_wavefront(ou, du, g, k_per_ray=8))
    timeit("wf2 K=8 M=48", lambda: intersect_wavefront(ou, du, g, k_per_ray=8, m_group=48))
    timeit("wf2 K=16 M=48", lambda: intersect_wavefront(ou, du, g, k_per_ray=16, m_group=48))
    timeit("wf2 anyhit K=8 M=32", lambda: intersect_wavefront(ou, du, g, t_max=tmx, any_hit=True, k_per_ray=8))
    # shadow-like: tight t_max toward a point (light-ish)
    lp = jnp.asarray([0.0, 8.0, 0.0])
    sd = lp[None, :] - psurf
    dist = jnp.linalg.norm(sd, axis=1)
    sdn = sd / jnp.maximum(dist, 1e-6)[:, None]
    stm = jnp.where(okm, dist * 0.999, 0.0)
    jax.block_until_ready(stm)
    timeit("wf2 shadow anyhit", lambda: intersect_wavefront(psurf, sdn, g, t_max=stm, any_hit=True, k_per_ray=8))
    timeit("matrix shadow anyhit", lambda: intersect_matrix(psurf, sdn, g, t_max=stm, any_hit=True), iters=5)
    timeit("matrix_query bounce baseline", lambda: matrix_query(ou, du, g), iters=5)
    # exactness + stats
    wf, nlist = intersect_wavefront(ou, du, g, k_per_ray=8, with_stats=True)
    mx = intersect_matrix(ou, du, g)
    same = np.asarray(wf.tri == mx.tri)
    dtv = np.abs(np.asarray(wf.t) - np.asarray(mx.t))[np.asarray(mx.tri >= 0)]
    print(f"list len mean={float(jnp.mean(nlist)):.1f}; vs matrix tri match={same.mean():.5f} max|dt|={dtv.max():.2e}", flush=True)
if __name__ == "__main__":
    main()
