#!/usr/bin/env python
"""Round-3 gate probe (PLAN.md item 1): measure the per-round glue
primitives of the rank-iteration wavefront BEFORE building it.

Everything runs on the real atrium geometry with realistic diffuse
bounce rays (camera hit points + cosine hemisphere). One jit per
measurement; dispatch `iters` calls and block once (axon tunnel rule).

Usage: timeout 590 python -u tools/probe_wavefront.py > /tmp/probe1.log
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 131072
TILE = 256  # counting-sort tile (bf16-exact counts need <= 256)


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"PROBE {name}: {dt*1000:.3f} ms", flush=True)
    return out


def main():
    from hala_tpu.models.integrator import RenderSettings
    from hala_tpu.ops.camera import generate_rays
    from hala_tpu.ops.traverse import cull_ordered, intersect_grouped, \
        intersect_matrix, matrix_query
    from hala_tpu.ops import rng
    from hala_tpu.ops.sampling import build_basis, normalize
    from hala_tpu.scene.cpu.scene import Scene
    from hala_tpu.scene.loader.uploader import SceneUploader

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene = SceneUploader.upload(
        Scene.load(os.path.join(root, "assets", "atrium.glb")),
        use_ray_tracing=False,
    )
    g = scene.geometry
    C = g.tri_packed.shape[0]
    print(f"SCENE tris={g.num_triangles} clusters={C}", flush=True)

    @jax.jit
    def make_bounce():
        pix = jnp.arange(N, dtype=jnp.int32)
        px = (pix % 512).astype(jnp.float32)
        py = (pix // 512).astype(jnp.float32) * 4.0  # cover the film
        r = rng.sample4(pix, jnp.uint32(0), 0, seed=1)
        o, d = generate_rays(
            scene.cameras, jnp.int32(0), px, py, 512, 1024,
            r[:, :2], r[:, 2:],
        )
        hit = intersect_matrix(o, d, g)
        tid = jnp.maximum(hit.tri, 0)
        e1 = jnp.take(g.tri_e1, tid, axis=0)
        e2 = jnp.take(g.tri_e2, tid, axis=0)
        n = normalize(jnp.cross(e1, e2))
        n = jnp.where(jnp.sum(n * d, -1, keepdims=True) > 0, -n, n)
        ok = hit.tri >= 0
        p = o + hit.t[:, None] * d + n * 1e-4
        r2 = rng.sample4(pix, jnp.uint32(0), 1, seed=2)
        t_b, b_b = build_basis(n)
        phi = 2.0 * jnp.pi * r2[:, 0]
        st = jnp.sqrt(r2[:, 1])
        ct = jnp.sqrt(jnp.maximum(1.0 - r2[:, 1], 0.0))
        wi = (
            (jnp.cos(phi) * st)[:, None] * t_b
            + (jnp.sin(phi) * st)[:, None] * b_b
            + ct[:, None] * n
        )
        o2 = jnp.where(ok[:, None], p, o)
        d2 = jnp.where(ok[:, None], wi, d)
        return o2, d2

    o2, d2 = make_bounce()
    jax.block_until_ready(o2)
    print("BOUNCE rays ready", flush=True)

    # ---- baseline: current kernels on the bounce batch ------------------
    timeit("matrix_query(sorted) bounce", lambda: matrix_query(o2, d2, g),
           iters=5)
    timeit("intersect_grouped(unsorted) bounce",
           lambda: intersect_grouped(o2, d2, g), iters=5)

    # ---- cull: top_k vs iterative min+mask ------------------------------
    K = 16
    tmx = jnp.full((N,), 3.0e38, jnp.float32)

    timeit("cull_ordered topk K=16",
           jax.jit(lambda o, d: cull_ordered(
               o, d, tmx, g.cluster_min, g.cluster_max, K)),
           o2, d2, iters=5)

    @jax.jit
    def cull_minmask(o, d):
        safe = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
        inv = 1.0 / safe
        t0 = (g.cluster_min[None] - o[:, None]) * inv[:, None]
        t1 = (g.cluster_max[None] - o[:, None]) * inv[:, None]
        tn = jnp.max(jnp.minimum(t0, t1), -1)
        tf = jnp.min(jnp.maximum(t0, t1), -1)
        hit = (tn <= tf) & (tf > 0.0)
        key = jnp.where(hit, tn, jnp.float32(3e38))  # (N, C)
        ids_l, tns_l = [], []
        for _ in range(K):
            m = jnp.min(key, axis=1)
            sel = key == m[:, None]
            cid = jnp.argmax(sel, axis=1)
            tns_l.append(m)
            ids_l.append(cid.astype(jnp.int32))
            key = jnp.where(sel, jnp.float32(3e38), key)
        return jnp.stack(ids_l, 1), jnp.stack(tns_l, 1)

    timeit("cull min+mask K=16", cull_minmask, o2, d2, iters=5)

    # ---- counting-sort primitives ---------------------------------------
    # realistic keys: each ray's nearest candidate cluster id
    ids16, tns16, _ = cull_ordered(
        o2, d2, tmx, g.cluster_min, g.cluster_max, K)
    key0 = jnp.asarray(ids16[:, 0])
    key0 = jnp.where(key0 >= C, C, key0)  # sentinel bucket C
    jax.block_until_ready(key0)

    perm = jnp.asarray(np.random.RandomState(0).permutation(N).astype(np.int32))
    pay8 = jnp.asarray(np.random.rand(N, 8).astype(np.float32))

    timeit("scatter i32 (N,) perm",
           jax.jit(lambda p: jnp.zeros((N,), jnp.int32).at[p].set(
               jnp.arange(N, dtype=jnp.int32))), perm)
    timeit("scatter f32 (N,8) rows",
           jax.jit(lambda p, v: jnp.zeros((N, 8), jnp.float32).at[p].set(v)),
           perm, pay8)
    timeit("take f32 (N,8) rows",
           jax.jit(lambda p, v: jnp.take(v, p, axis=0)), perm, pay8)
    timeit("take f32 (N,) x8 cols",
           jax.jit(lambda p, v: [jnp.take(v[:, i], p) for i in range(8)]),
           perm, pay8)
    timeit("lax.sort key+8pay",
           jax.jit(lambda k, v: jax.lax.sort(
               (k,) + tuple(v[:, i] for i in range(8)), num_keys=1)),
           key0, pay8)
    timeit("scatter-add hist C+1",
           jax.jit(lambda k: jnp.zeros((C + 1,), jnp.int32).at[k].add(1)),
           key0)

    @jax.jit
    def counting_pos(k):
        # one-hot in bf16; counts <= TILE=256 stay exact in bf16
        t = N // TILE
        oh = (k[:, None] == jnp.arange(C + 1, dtype=jnp.int32)[None, :])
        ohb = oh.astype(jnp.bfloat16).reshape(t, TILE, C + 1)
        tile_hist = ohb.sum(axis=1).astype(jnp.float32)        # (T, C+1)
        tile_base = jnp.cumsum(tile_hist, axis=0) - tile_hist  # exclusive
        total = tile_hist.sum(axis=0)
        offsets = jnp.cumsum(total) - total                    # (C+1,)
        tri = jnp.tril(jnp.ones((TILE, TILE), jnp.bfloat16), -1)
        ranks = jax.lax.dot_general(
            tri, ohb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TILE, T, C+1)
        ranks = ranks.transpose(1, 0, 2)
        base_off = offsets[None, :] + tile_base                # (T, C+1)
        pos = jnp.einsum(
            "tic,tc->ti", ohb.astype(jnp.float32), base_off
        ) + (ranks * ohb.astype(jnp.float32)).sum(-1)
        return pos.reshape(N).astype(jnp.int32)

    pos = timeit("counting_pos (hist+tri-matmul)", counting_pos, key0)
    # sanity: pos must be a permutation
    pos_np = np.asarray(pos)
    assert len(np.unique(pos_np)) == N, "counting_pos not a permutation"
    srt = np.asarray(key0)[np.argsort(pos_np)]
    assert (np.diff(srt) >= 0).all(), "counting_pos not sorted by key"
    print("counting_pos CORRECT", flush=True)

    @jax.jit
    def counting_sort_full(k, v):
        p = counting_pos(k)
        return jnp.zeros((N, 8), jnp.float32).at[p].set(v)

    timeit("counting sort+scatter (N,8)", counting_sort_full, key0, pay8)

    # ---- grouped kernel under rank-0 grouping ---------------------------
    @jax.jit
    def rank0_group_sort(o, d):
        k = jnp.where(key0 >= C, C, key0)
        _, o0, o1, o2_, d0, d1, d2_, i = jax.lax.sort(
            (k, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
             jnp.arange(N, dtype=jnp.int32)), num_keys=1)
        return jnp.stack([o0, o1, o2_], 1), jnp.stack([d0, d1, d2_], 1), i

    os_, ds_, _ = rank0_group_sort(o2, d2)
    jax.block_until_ready(os_)
    timeit("grouped on rank0-sorted bounce",
           lambda: intersect_grouped(os_, ds_, g), iters=5)
    timeit("matrix on rank0-sorted bounce",
           lambda: intersect_matrix(os_, ds_, g), iters=5)

    # stats: pairs actually needed
    h, usz = intersect_grouped(os_, ds_, g, with_stats=True)
    print(f"rank0-sorted group union mean={float(jnp.mean(usz)):.1f}",
          flush=True)
    h2, usz2 = intersect_grouped(o2, d2, g, with_stats=True)
    print(f"unsorted group union mean={float(jnp.mean(usz2)):.1f}",
          flush=True)


if __name__ == "__main__":
    main()
