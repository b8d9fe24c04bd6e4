#!/usr/bin/env python
"""Round-3 probe #7: stage decomposition of wavefront v2.1 (DMA ring)."""
import os, sys, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp, numpy as np
from probe_common import N, bounce_rays, load_scene, timeit

def main():
    from hala_tpu.ops.traverse import intersect_matrix, matrix_query
    from hala_tpu.ops import wavefront as W
    from hala_tpu.ops.cull import cull_topk, INF_KEY, _ID_MASK
    scene = load_scene()
    g = scene.geometry
    ou, du, psurf, sdn, stm = bounce_rays(scene)
    tmx = jnp.full((N,), 3.0e38, jnp.float32)
    K, M = 8, 32
    G = N // 128

    @jax.jit
    def stage_sort(o, d):
        pk, cnt = cull_topk(o, d, tmx, g.cluster_min, g.cluster_max, k=K)
        id0 = pk[:, 0] & _ID_MASK; id1 = pk[:, 1] & _ID_MASK; id2 = pk[:, 2] & _ID_MASK
        skey = (id0 << 18) | (id1 << 5) | (id2 >> 8)  # 13-bit ids, matches ops/wavefront
        lane = jnp.arange(N, dtype=jnp.int32)
        return jax.lax.sort((skey, o[:,0],o[:,1],o[:,2],d[:,0],d[:,1],d[:,2],tmx,lane,cnt)
                            + tuple(pk[:, i] for i in range(K)), num_keys=1)
    srt = timeit("stage cull+sort", stage_sort, ou, du)
    o_s = jnp.stack(srt[1:4], 1); d_s = jnp.stack(srt[4:7], 1)
    tm_s = srt[7]; cnt_s = srt[9]
    pk_s = jnp.stack(srt[10:], 1)
    jax.block_until_ready(pk_s)

    @jax.jit
    def stage_lists(pk_s):
        tnb, grp_bound = W._group_lists(pk_s, G, K, M)
        pkl = jnp.pad(tnb.reshape(G * M, 1), ((0,0),(0,127)), constant_values=INF_KEY)
        eid = jnp.where(tnb != INF_KEY, tnb & _ID_MASK, -2)
        cand = jnp.where(pk_s != INF_KEY, pk_s & _ID_MASK, -1).reshape(G, 128, K)
        want = jnp.any(cand[:, :, :, None] == eid[:, None, None, :], axis=2)
        want_arr = want.transpose(0, 2, 1).reshape(G * M, 128).astype(jnp.int32)
        own_last = jnp.max(jnp.where(pk_s != INF_KEY, pk_s, -1), axis=1).astype(jnp.int32)
        return tnb, grp_bound, pkl, want_arr, own_last
    tnb, grp_bound, pkl, want_arr, own_last = timeit("stage lists+want", stage_lists, pk_s)
    jax.block_until_ready(pkl)

    kern = jax.jit(functools.partial(W._wf_pallas_call, m=M, any_hit=False, interpret=False))
    out = timeit("stage kernel", kern, o_s, d_s, tm_s, g, pkl, want_arr, own_last)
    stats = out[4]
    walked = stats[:, 0, 0]; tested = stats[:, 1, 0]
    nlist = jnp.sum((tnb != INF_KEY).astype(jnp.int32), 1)
    print(f"list len mean={float(jnp.mean(nlist)):.1f} walked mean={float(jnp.mean(walked)):.1f} tested mean={float(jnp.mean(tested)):.1f}", flush=True)
    t_acc = out[0][:, 0, :]
    found = t_acc < 3.0e38
    t_fin = jnp.where(found, t_acc, tm_s.reshape(G, 128)).reshape(-1)
    ray_bound = jnp.where(cnt_s > K, pk_s[:, K-1], jnp.int32(INF_KEY))
    gb_lane = jnp.repeat(grp_bound, 128)
    own_dropped = jnp.min(jnp.where(pk_s >= gb_lane[:, None], pk_s, jnp.int32(INF_KEY)), axis=1)
    bound = jnp.minimum(ray_bound, own_dropped)
    t_bits = jax.lax.bitcast_convert_type(jnp.maximum(t_fin, 0.0), jnp.int32)
    need = t_bits > bound
    print(f"need frac={float(jnp.mean(need.astype(jnp.float32)))*100:.2f}% trunc groups={float(jnp.mean((grp_bound != INF_KEY).astype(jnp.float32)))*100:.1f}%", flush=True)
    t_lim = jnp.where(need, t_fin, 0.0)
    timeit("stage fallback matrix(t_lim)", jax.jit(lambda tl: intersect_matrix(o_s, d_s, g, t_max=tl)), t_lim, iters=5)
    # end-to-end after DMA-ring rework
    timeit("wf2.1 K=8 M=32 e2e", lambda: W.intersect_wavefront(ou, du, g, k_per_ray=8))
    timeit("wf2.1 shadow anyhit", lambda: W.intersect_wavefront(psurf, sdn, g, t_max=stm, any_hit=True, k_per_ray=8))
    timeit("matrix_query bounce baseline", lambda: matrix_query(ou, du, g), iters=5)
if __name__ == "__main__":
    main()
