#!/usr/bin/env python
"""Round-3 probe #3: the built wavefront on real TPU, atrium bounce rays."""
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
    from hala_tpu.ops.traverse import intersect_matrix, matrix_query, _coherence_key
    from hala_tpu.ops.wavefront import intersect_wavefront, _group_lists
    from hala_tpu.ops.cull import cull_topk
    from hala_tpu.ops.camera import generate_rays
    from hala_tpu.ops import rng
    from hala_tpu.ops.sampling import build_basis, normalize
    from hala_tpu.scene.cpu.scene import Scene
    from hala_tpu.scene.loader.uploader import SceneUploader
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene = SceneUploader.upload(Scene.load(os.path.join(root, "assets", "atrium.glb")), use_ray_tracing=False)
    g = scene.geometry
    C = g.tri_packed.shape[0]
    print(f"SCENE tris={g.num_triangles} clusters={C}", flush=True)

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
        n = normalize(jnp.cross(e1, e2))
        n = jnp.where(jnp.sum(n * d, -1, keepdims=True) > 0, -n, n)
        ok = hit.tri >= 0
        p = o + hit.t[:, None] * d + n * 1e-4
        r2 = rng.sample4(pix, jnp.uint32(0), 1, seed=2)
        t_b, b_b = build_basis(n)
        phi = 2.0 * jnp.pi * r2[:, 0]; st = jnp.sqrt(r2[:, 1]); ct = jnp.sqrt(jnp.maximum(1.0 - r2[:, 1], 0.0))
        wi = (jnp.cos(phi)*st)[:, None]*t_b + (jnp.sin(phi)*st)[:, None]*b_b + ct[:, None]*n
        o2 = jnp.where(ok[:, None], p, o); d2 = jnp.where(ok[:, None], wi, d)
        tmx = jnp.full((N,), 3.0e38, jnp.float32)
        key = _coherence_key(o2, d2, tmx, g.cluster_min, g.cluster_max)
        (_, s0, s1, s2, s3, s4, s5) = jax.lax.sort(
            (key, o2[:,0], o2[:,1], o2[:,2], d2[:,0], d2[:,1], d2[:,2]), num_keys=1)
        return jnp.stack([s0,s1,s2],1), jnp.stack([s3,s4,s5],1), o2, d2

    o2, d2, ou, du = make_bounce()
    jax.block_until_ready(o2)
    print("BOUNCE ready", flush=True)
    tmx = jnp.full((N,), 3.0e38, jnp.float32)

    timeit("cull_topk K=16", lambda: cull_topk(o2, d2, tmx, g.cluster_min, g.cluster_max, k=16), iters=10)
    timeit("wavefront sorted K=16 M=32", lambda: intersect_wavefront(o2, d2, g), iters=10)
    timeit("wavefront sorted K=12 M=24", lambda: intersect_wavefront(o2, d2, g, k_per_ray=12, m_group=24), iters=10)
    timeit("wavefront sorted K=16 no-canon", lambda: intersect_wavefront(o2, d2, g, canonical=False), iters=10)
    timeit("wavefront any-hit", lambda: intersect_wavefront(o2, d2, g, t_max=tmx, any_hit=True), iters=10)
    timeit("wavefront UNSORTED K=16", lambda: intersect_wavefront(ou, du, g), iters=5)
    timeit("matrix_query baseline", lambda: matrix_query(o2, d2, g), iters=5)
    # glue decomposition
    pk, cnt = cull_topk(o2, d2, tmx, g.cluster_min, g.cluster_max, k=16)
    jax.block_until_ready(pk)
    timeit("_group_lists", jax.jit(lambda p: _group_lists(p, N // 128, 16, 32)), pk)
    tnb, gb = _group_lists(pk, N // 128, 16, 32)
    ncand = jnp.sum((pk != 0x7FFFFFFF).astype(jnp.int32), 1)
    nlist = jnp.sum((tnb != 0x7FFFFFFF).astype(jnp.int32), 1)
    print(f"per-ray cand mean={float(jnp.mean(ncand)):.2f} ovf={float(jnp.mean((cnt>16).astype(jnp.float32)))*100:.1f}%", flush=True)
    print(f"group list mean={float(jnp.mean(nlist)):.1f} trunc={float(jnp.mean((gb!=0x7FFFFFFF).astype(jnp.float32)))*100:.1f}%", flush=True)
    # exactness spot check vs matrix
    wf = intersect_wavefront(o2, d2, g)
    mx = intersect_matrix(o2, d2, g)
    same = np.asarray(wf.tri == mx.tri)
    dt = np.abs(np.asarray(wf.t) - np.asarray(mx.t))
    print(f"vs matrix: tri match={same.mean():.5f} max|dt|={dt[np.asarray(mx.tri>=0)].max():.2e}", flush=True)

if __name__ == "__main__":
    main()
