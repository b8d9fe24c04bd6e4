"""Per-ray ordered cluster traversal — the large-scene intersector.

Replaces the hardware BVH role (reference BLAS/TLAS + trace_rays,
/root/reference/src/scene/loader/gpu_uploader.rs:774-967) for scenes too
big for SMEM residency, fixing the two round-1 failure modes measured in
DESIGN.md:

- the lockstep block kernel (ops/cluster.py) pays for the UNION of
  clusters any ray in a 1024-ray block touches (~100 clusters/block on
  incoherent bounce rays -> 2.2 Mrays/s on 20k triangles);
- (ray, cluster) item expansion (a retired round-1 experiment) needs the items grouped
  by cluster, and a global lax.sort of ~1M items is ~10x the cost of the
  intersection itself on TPU (bitonic).

Here nothing is ever sorted or expanded. The dense cull emits, PER RAY,
the K nearest candidate clusters ordered by slab entry distance tn (a
top_k over the (rays, clusters) slab matrix — regular VPU work). One
Pallas kernel then walks each 1024-ray tile:

1. every lane exposes its nearest unconsumed candidate (tn below the
   lane's current best hit, else "done");
2. the tile picks the minimum candidate id, DMAs that cluster's packed
   geometry block HBM->SMEM once, and Moller-Trumbore's the whole tile
   masked to lanes holding that cluster ANYWHERE in their list (one DMA
   serves every lane that wants the cluster, at any position);
3. consumed candidates are retired; a lane whose best hit is closer
   than its nearest remaining tn stops contributing (per-ray
   front-to-back early termination — the thing a per-block sweep can
   never do);
4. the loop ends when every lane is done.

Exactness under truncation: candidate lists keep the K SMALLEST tn, so
any truncated cluster has tn >= the last kept one. A lane is "resolved"
iff its best hit t <= its smallest remaining/truncated tn; unresolved
lanes (rare: deep overflow without an early hit) are re-dispatched
through the block kernel with t_max preset to their current best — for
resolved lanes t_max=0 makes every slab test fail, so the fallback
costs only the AABB sweep. The combined result is exact (tests compare
against brute force with K forced tiny).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import Hit, T_MAX, out_struct, varying_like

LANES = 128
# 4096-ray tiles: the per-run fixed cost (selection folds + scalar
# reductions + DMA wait, ~3 us) is paid per tile-visit, and the measured
# sweet spot on sponza_like trades a slightly looser per-tile cluster
# union for 2.8x fewer runs (18.9 -> 13.5 ms at 64k rays vs 1024-tiles).
BLOCK_SUBLANES = 32
RAY_BLOCK = BLOCK_SUBLANES * LANES
TRI_CHUNK = 128
BIG_CLUSTER = 0x3FFFFFFF  # "no candidate" sentinel (Python int: Pallas
# kernels must not close over jnp array constants)
_INF = 3.0e38
_EPS = 1.0e-7
_T_MIN = 1.0e-4
_MT_ITERS = TRI_CHUNK  # ablation knob: triangle iterations per run
# in-chunk pretest span (== ops/cluster.PRETEST_TRIS; row-9 AABB layout)
_PRETEST_TRIS = 16


def cull_ordered(o, d, t_max, cluster_min, cluster_max, k_per_ray: int,
                 row_chunk: int = 8192):
    """Per-ray candidates ordered by slab entry distance.

    Returns (ids (N, K) i32 BIG_CLUSTER-padded, tn (N, K) f32 INF-padded,
    overflow (N,) bool — ray had more than K candidate clusters).
    Candidate k holds the k-th SMALLEST tn, so truncated clusters all
    have tn >= tn[:, -1]; lax.top_k breaks ties by lowest index, keeping
    the result independent of tiling/device count (multi-chip
    bit-identity invariant).
    """
    n = o.shape[0]
    c = cluster_min.shape[0]
    k = min(k_per_ray, c)
    safe_d = jnp.where(jnp.abs(d) < 1e-12, jnp.float32(1e-12), d)
    inv_d = 1.0 / safe_d

    n_chunks = -(-n // row_chunk)
    n_pad = n_chunks * row_chunk
    if n_pad != n:
        o = jnp.pad(o, ((0, n_pad - n), (0, 0)))
        inv_d = jnp.pad(inv_d, ((0, n_pad - n), (0, 0)), constant_values=1.0)
        t_max = jnp.pad(t_max, (0, n_pad - n))

    o_c = o.reshape(n_chunks, row_chunk, 3)
    i_c = inv_d.reshape(n_chunks, row_chunk, 3)
    t_c = t_max.reshape(n_chunks, row_chunk)

    def per_chunk(args):
        oc, ic, tc = args
        t0 = (cluster_min[None, :, :] - oc[:, None, :]) * ic[:, None, :]
        t1 = (cluster_max[None, :, :] - oc[:, None, :]) * ic[:, None, :]
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        hit = (tn <= tf) & (tf > 0.0) & (tn < tc[:, None])  # (R, C)
        key = jnp.where(hit, tn, jnp.float32(_INF))
        neg_tn, idx = jax.lax.top_k(-key, k)  # k smallest tn first
        valid = neg_tn > jnp.float32(-_INF)
        ids = jnp.where(valid, idx.astype(jnp.int32), jnp.int32(BIG_CLUSTER))
        tns = jnp.where(valid, -neg_tn, jnp.float32(_INF))
        count = jnp.sum(hit.astype(jnp.int32), axis=1)
        return ids, tns, count > k

    ids, tns, ovf = jax.lax.map(per_chunk, (o_c, i_c, t_c))
    return (
        ids.reshape(n_pad, k)[:n],
        tns.reshape(n_pad, k)[:n],
        ovf.reshape(n_pad)[:n],
    )


def cull_candidates(o, d, t_max, cluster_min, cluster_max,
                    k_per_ray: int, interpret: bool = False,
                    kernel: bool | None = None,
                    superchunk: int | None = None):
    """Per-ray K nearest candidate clusters in unpacked (ids, tns) form.

    Front end for the ordered-traversal engines: on TPU (or in Pallas
    interpret mode) the Pallas cull kernel (ops/cull.py, measured 4.4x
    faster than the lax.top_k sweep) produces packed keys per
    <=CULL_MAX_CLUSTERS cluster superchunk; superchunk lists merge with
    one (N, K*chunks) row sort on UNPACKED (tn, global id) pairs, so —
    unlike the packed path — the cluster-id width is unbounded and this
    serves the >MATRIX_MAX_CLUSTERS fallback (PLAN round-3 completeness
    item). The packed keys' sacrificed mantissa bits round each tn DOWN,
    which every consumer tolerates: ordering is efficiency-only, and the
    truncation-fallback bound compares hit-t against a LOWER bound of
    the true entry distance (still >= the last kept tn). On CPU without
    interpret the exact XLA `cull_ordered` runs instead.

    Returns (ids (N, K) i32 BIG_CLUSTER-padded, tns (N, K) f32
    INF-padded ascending, overflow (N,) bool).
    """
    c = cluster_min.shape[0]
    k = min(k_per_ray, c)
    if kernel is None:
        kernel = jax.default_backend() == "tpu" or interpret
    if not kernel:
        return cull_ordered(o, d, t_max, cluster_min, cluster_max, k)
    from .cull import _ID_MASK, CULL_MAX_CLUSTERS, INF_KEY, cull_topk

    sc = CULL_MAX_CLUSTERS if superchunk is None else superchunk
    ids_all, tns_all, cnt = [], [], None
    for lo in range(0, c, sc):
        pk, cnt_i = cull_topk(
            o, d, t_max,
            cluster_min[lo : lo + sc], cluster_max[lo : lo + sc],
            k=k, interpret=interpret,
        )
        valid = pk != jnp.int32(INF_KEY)
        ids_all.append(jnp.where(
            valid, (pk & jnp.int32(_ID_MASK)) + jnp.int32(lo),
            jnp.int32(BIG_CLUSTER),
        ))
        tns_all.append(jnp.where(
            valid,
            jax.lax.bitcast_convert_type(
                pk & jnp.int32(~_ID_MASK), jnp.float32
            ),
            jnp.float32(_INF),
        ))
        cnt = cnt_i if cnt is None else cnt + cnt_i
    if len(ids_all) == 1:
        ids, tns = ids_all[0], tns_all[0]
    else:
        # ascending per-superchunk lists merge exactly: a candidate
        # outside its own chunk's top-K is farther than K same-chunk
        # candidates, so it can never enter the global top-K. Ties in
        # the rounded tn break to the smaller global id (num_keys=2),
        # matching the packed key's in-chunk ordering.
        tns, ids = jax.lax.sort(
            (jnp.concatenate(tns_all, axis=1),
             jnp.concatenate(ids_all, axis=1)),
            dimension=1, num_keys=2,
        )
        tns, ids = tns[:, :k], ids[:, :k]
    return ids, tns, cnt > k


@functools.partial(
    jax.jit, static_argnames=("k_per_ray", "exact", "interpret")
)
def traverse_query(
    o, d, geometry, t_max=None, k_per_ray: int = 12,
    exact: bool = True, interpret: bool = False,
) -> Hit:
    """Full sorted traversal query: cull, then sort rays by their
    NEAREST candidate cluster (plus direction octant), so kernel tiles
    group rays that will fetch the same geometry blocks — a much denser
    grouping than an origin-cell Morton key, because it is derived from
    what each ray will actually intersect. Dead rays (no candidates)
    key to the sentinel and sink to the tail tiles, which exit after a
    single selection round (free wavefront compaction)."""
    n = o.shape[0]
    if t_max is None:
        tm = varying_like(o[:, 0], 0.0) + T_MAX
    else:
        tm = jnp.broadcast_to(t_max, (n,)).astype(jnp.float32)

    ids, tns, ovf = cull_candidates(
        o, d, tm, geometry.cluster_min, geometry.cluster_max,
        min(k_per_ray, geometry.cluster_min.shape[0]),
        interpret=interpret,
    )
    octant = (
        (d[:, 0] >= 0).astype(jnp.uint32)
        | ((d[:, 1] >= 0).astype(jnp.uint32) << 1)
        | ((d[:, 2] >= 0).astype(jnp.uint32) << 2)
    )
    key = (ids[:, 0].astype(jnp.uint32) << jnp.uint32(3)) | octant
    order = jnp.argsort(key).astype(jnp.int32)
    inverse = (
        jnp.zeros((n,), jnp.int32)
        .at[order]
        .set(jnp.arange(n, dtype=jnp.int32))
    )
    o_s = jnp.take(o, order, axis=0)
    d_s = jnp.take(d, order, axis=0)
    tm_s = jnp.take(tm, order)
    ids_s = jnp.take(ids, order, axis=0)
    tns_s = jnp.take(tns, order, axis=0)
    ovf_s = jnp.take(ovf, order)
    hit = _traverse_core(
        o_s, d_s, geometry, tm_s, ids_s, tns_s, ovf_s,
        exact=exact, interpret=interpret,
    )
    return Hit(
        t=jnp.take(hit.t, inverse),
        tri=jnp.take(hit.tri, inverse),
        u=jnp.take(hit.u, inverse),
        v=jnp.take(hit.v, inverse),
    )


def _make_traverse_kernel(k_per_ray: int):
    return functools.partial(_traverse_kernel_body, k_per_ray)


def _traverse_kernel_body(
    k_per_ray,
    ox, oy, oz, dx, dy, dz, tmax,   # VMEM (BLOCK_SUBLANES, LANES)
    cid_ref,                        # VMEM (K*BLOCK_SUBLANES, LANES) i32
    tn_ref,                         # VMEM (K*BLOCK_SUBLANES, LANES) f32
    ovf_ref,                        # VMEM (BLOCK_SUBLANES, LANES) i32
    tri_hbm,                        # ANY (C, 16, TRI_CHUNK)
    t_out, tri_out, u_out, v_out, unres_out, runs_out,
    cons,                           # scratch VMEM (K*BLOCK_SUBLANES, LANES)
    tri_smem,                       # scratch SMEM (16, TRI_CHUNK)
    sem,
):
    big = jnp.int32(BIG_CLUSTER)
    inf = jnp.float32(_INF)
    cons[:] = cid_ref[:]
    t_out[:] = tmax[:]
    tri_out[:] = jnp.full(t_out.shape, -1, jnp.int32)
    u_out[:] = jnp.zeros(t_out.shape, jnp.float32)
    v_out[:] = jnp.zeros(t_out.shape, jnp.float32)

    rox, roy, roz = ox[:], oy[:], oz[:]
    rdx, rdy, rdz = dx[:], dy[:], dz[:]

    def _plane(ref, kk):
        s = kk * BLOCK_SUBLANES
        return ref[s : s + BLOCK_SUBLANES, :]

    def next_cid():
        # Tile-level front-to-back selection: pick the cluster with the
        # smallest entry distance among candidates still LIVE (tn below
        # the owning lane's current best hit). Processing in tn order is
        # what makes per-ray early termination actually fire — the first
        # few runs resolve most lanes' hits, after which their remaining
        # candidates fail the live test and are never fetched. (Id-order
        # selection measured ~all clusters/tile on this step; tn-order
        # collapses it to the clusters some lane truly needs.)
        m = jnp.full((BLOCK_SUBLANES, LANES), _INF, jnp.float32)
        tb = t_out[:]
        for kk in range(k_per_ray):
            live = (_plane(cons, kk) < big) & (_plane(tn_ref, kk) < tb)
            m = jnp.minimum(m, jnp.where(live, _plane(tn_ref, kk), inf))
        tn_min = jnp.min(m)
        # the (a) cluster achieving that tn; min id breaks exact ties
        cur = jnp.full((BLOCK_SUBLANES, LANES), BIG_CLUSTER, jnp.int32)
        for kk in range(k_per_ray):
            pick = (_plane(cons, kk) < big) & (_plane(tn_ref, kk) == tn_min)
            cur = jnp.minimum(cur, jnp.where(pick, _plane(cons, kk), big))
        return jnp.min(cur)

    def run(cid):
        cp = pltpu.make_async_copy(tri_hbm.at[cid], tri_smem, sem)
        cp.start()
        cp.wait()
        in_run = _plane(cons, 0) == cid
        for kk in range(1, k_per_ray):
            in_run = in_run | (_plane(cons, kk) == cid)
        base = cid * TRI_CHUNK

        def tri_body(t, _):
            av0x = tri_smem[0, t]
            av0y = tri_smem[1, t]
            av0z = tri_smem[2, t]
            ae1x = tri_smem[3, t]
            ae1y = tri_smem[4, t]
            ae1z = tri_smem[5, t]
            ae2x = tri_smem[6, t]
            ae2y = tri_smem[7, t]
            ae2z = tri_smem[8, t]

            px = rdy * ae2z - rdz * ae2y
            py = rdz * ae2x - rdx * ae2z
            pz = rdx * ae2y - rdy * ae2x
            det = px * ae1x + py * ae1y + pz * ae1z
            inv_det = jnp.where(jnp.abs(det) > _EPS, 1.0 / det, 0.0)
            tx = rox - av0x
            ty = roy - av0y
            tz = roz - av0z
            u = (tx * px + ty * py + tz * pz) * inv_det
            qx = ty * ae1z - tz * ae1y
            qy = tz * ae1x - tx * ae1z
            qz = tx * ae1y - ty * ae1x
            v = (rdx * qx + rdy * qy + rdz * qz) * inv_det
            tt = (ae2x * qx + ae2y * qy + ae2z * qz) * inv_det

            t_cur = t_out[:]
            ok = (
                in_run
                & (jnp.abs(det) > _EPS)
                & (u >= 0.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (tt > _T_MIN)
                & (tt < t_cur)
            )
            t_out[:] = jnp.where(ok, tt, t_cur)
            tri_out[:] = jnp.where(ok, base + t, tri_out[:])
            u_out[:] = jnp.where(ok, u, u_out[:])
            v_out[:] = jnp.where(ok, v, v_out[:])
            return 0

        jax.lax.fori_loop(0, _MT_ITERS, tri_body, 0)

        for kk in range(k_per_ray):
            ck = _plane(cons, kk)
            cons[kk * BLOCK_SUBLANES : (kk + 1) * BLOCK_SUBLANES, :] = (
                jnp.where(ck == cid, big, ck)
            )
        return next_cid()

    def run_counted(carry):
        cid, cnt = carry
        return run(cid), cnt + 1

    _, n_runs = jax.lax.while_loop(
        lambda c: c[0] < big, run_counted, (next_cid(), jnp.int32(0))
    )
    # Diagnostic: clusters fetched by this tile (same value in every lane).
    runs_out[:] = jnp.full(t_out.shape, 1, jnp.int32) * n_runs

    # A lane is unresolved iff its list overflowed AND its best hit is
    # not provably ahead of every truncated cluster (all truncated tn >=
    # the last kept tn because the list keeps the K smallest).
    last_tn = _plane(tn_ref, k_per_ray - 1)
    unres_out[:] = (
        (ovf_ref[:] != 0) & (t_out[:] > last_tn)
    ).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("k_per_ray", "exact", "interpret", "with_stats")
)
def intersect_traversed(
    o: jnp.ndarray,
    d: jnp.ndarray,
    geometry,
    t_max=None,
    k_per_ray: int = 12,
    exact: bool = True,
    interpret: bool = False,
    with_stats: bool = False,
) -> Hit:
    """Closest hit via per-ray ordered traversal (+ exact fallback).

    `k_per_ray` bounds the per-ray candidate list; `exact=True` (the
    default) re-dispatches overflowed-and-unresolved lanes through the
    block kernel so the result matches brute force regardless of K.
    """
    n = o.shape[0]
    c = geometry.cluster_min.shape[0]
    k = min(k_per_ray, c)
    if t_max is None:
        tm = varying_like(o[:, 0], 0.0) + T_MAX
    else:
        tm = jnp.broadcast_to(t_max, (n,)).astype(jnp.float32)

    ids, tns, ovf = cull_candidates(
        o, d, tm, geometry.cluster_min, geometry.cluster_max, k,
        interpret=interpret,
    )
    return _traverse_core(
        o, d, geometry, tm, ids, tns, ovf,
        exact=exact, interpret=interpret, with_stats=with_stats,
    )


@functools.partial(
    jax.jit, static_argnames=("exact", "interpret", "with_stats")
)
def _traverse_core(
    o, d, geometry, tm, ids, tns, ovf,
    exact: bool = True, interpret: bool = False, with_stats: bool = False,
):
    n = o.shape[0]
    k = ids.shape[1]
    n_pad = -(-n // RAY_BLOCK) * RAY_BLOCK
    if n_pad != n:
        pad = n_pad - n
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        tm_p = jnp.pad(tm, (0, pad))
        ids = jnp.pad(ids, ((0, pad), (0, 0)), constant_values=BIG_CLUSTER)
        tns = jnp.pad(tns, ((0, pad), (0, 0)), constant_values=_INF)
        ovf = jnp.pad(ovf, (0, pad))
    else:
        tm_p = tm

    nb = n_pad // RAY_BLOCK
    shape2 = (n_pad // LANES, LANES)

    def comp(a):
        return a.reshape(shape2)

    # Candidate planes: tile b, plane k = rows [b*K*8 + k*8, ...+8).
    def planes(a):
        return (
            a.reshape(nb, BLOCK_SUBLANES, LANES, k)
            .transpose(0, 3, 1, 2)
            .reshape(nb * k * BLOCK_SUBLANES, LANES)
        )

    cid_in = planes(ids)
    tn_in = planes(tns)
    ovf_in = ovf.astype(jnp.int32).reshape(shape2)

    ray_spec = pl.BlockSpec(
        (BLOCK_SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    cand_spec = pl.BlockSpec(
        (k * BLOCK_SUBLANES, LANES), lambda i: (i, 0),
        memory_space=pltpu.VMEM,
    )
    tri_spec = pl.BlockSpec(memory_space=pl.ANY)

    t_b, tri_b, u_b, v_b, unres_b, runs_b = pl.pallas_call(
        _make_traverse_kernel(k),
        grid=(nb,),
        in_specs=[ray_spec] * 7 + [cand_spec, cand_spec, ray_spec, tri_spec],
        out_specs=[ray_spec] * 6,
        out_shape=[
            out_struct(shape2, jnp.float32, comp(tm_p)),
            out_struct(shape2, jnp.int32, comp(tm_p)),
            out_struct(shape2, jnp.float32, comp(tm_p)),
            out_struct(shape2, jnp.float32, comp(tm_p)),
            out_struct(shape2, jnp.int32, comp(tm_p)),
            out_struct(shape2, jnp.int32, comp(tm_p)),
        ],
        scratch_shapes=[
            pltpu.VMEM((k * BLOCK_SUBLANES, LANES), jnp.int32),
            pltpu.SMEM((16, TRI_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        comp(o[:, 0]), comp(o[:, 1]), comp(o[:, 2]),
        comp(d[:, 0]), comp(d[:, 1]), comp(d[:, 2]),
        comp(tm_p), cid_in, tn_in, ovf_in, geometry.tri_packed,
    )

    hit = Hit(
        t=t_b.reshape(-1)[:n],
        tri=tri_b.reshape(-1)[:n],
        u=u_b.reshape(-1)[:n],
        v=v_b.reshape(-1)[:n],
    )
    runs = runs_b.reshape(nb, RAY_BLOCK)[:, 0]  # clusters fetched per tile
    if not exact:
        return (hit, runs) if with_stats else hit

    # Exact fallback: unresolved lanes sweep every cluster through the
    # block kernel, t-bounded by their current best; resolved lanes get
    # t_max=0 so every slab test fails (no DMA, no leaf work).
    from .cluster import intersect_clustered

    # Resolved lanes get t_max=-INF, NOT 0: a ray whose origin sits
    # inside a cluster AABB has NEGATIVE slab tn, so tn < 0 would still
    # trigger the leaf (measured +20 ms on sponza_like from exactly
    # this — every interior ray re-ran its block's full cluster list).
    unres = unres_b.reshape(-1)[:n] != 0
    fb = intersect_clustered(
        o[:n], d[:n], geometry,
        t_max=jnp.where(unres, hit.t, -_INF),
        interpret=interpret,
    )
    better = (fb.tri >= 0) & (fb.t < hit.t)
    merged = Hit(
        t=jnp.where(better, fb.t, hit.t),
        tri=jnp.where(better, fb.tri, hit.tri),
        u=jnp.where(better, fb.u, hit.u),
        v=jnp.where(better, fb.v, hit.v),
    )
    return (merged, runs) if with_stats else merged


# ---------------------------------------------------------------------------
# Matrix traversal: the whole (cluster x ray-tile) slab matrix lives in
# VMEM and there is NO host-side glue at all — no cull, no top-k, no ray
# sort, no candidate truncation, no fallback. Exact by construction.
# ---------------------------------------------------------------------------

# Packed traversal keys: (slab-entry-tn bits | cluster id). Positive f32
# bit patterns compare monotonically as int32, so one i32 min over the
# matrix simultaneously finds the nearest live cluster AND its id (ties
# break to the smaller id). The low 13 mantissa bits are sacrificed to
# the id, rounding each tn DOWN — conservative: a cluster can only look
# slightly NEARER than it is, never farther, so no live cluster is
# ever skipped (and _pack_t rounds each lane's own bound UP, so the
# widened gap only admits a few extra visits near ties, ~1e-3 relative
# t). 13 bits = up to 8191 clusters = ~1M triangle slots; exactness at
# 5680 clusters is covered by the opt-in HALA_BIG_TESTS capacity test.
_ID_BITS = 13
_ID_MASK = (1 << _ID_BITS) - 1
_INF_KEY = 0x7FFFFFFF
# One below the width: an id equal to _ID_MASK would make the liveness
# compare against the tile bound (whose low bits are forced to the
# mask) non-strict at shared tn granules — a near-tie closer hit in
# that one cluster could be skipped.
MATRIX_MAX_CLUSTERS = (1 << _ID_BITS) - 1
# 16384-ray tiles for the matrix kernel: per-run fixed costs (selection
# fold, scalar reduction, DMA wait) are tile-count-bound, and the wider
# tile measured best (round-3 sweep on atrium_big 1861 clusters/131k
# sorted rays, tools/probe_tile.py: bs 64/128/256 at mg=16 ->
# 145/139/137 ms closest; bs=128 mg=32 -> 127.5 closest / 69.3 any-hit,
# the overall winner).
MATRIX_SUBLANES = 128
MATRIX_BLOCK = MATRIX_SUBLANES * LANES


def _make_matrix_kernel(num_clusters: int, subs: int, mt_group: int,
                        pretest: bool, worklist: bool,
                        visit_batch: int, pipeline: bool, flat: bool,
                        page: int = 1):
    return functools.partial(
        _matrix_kernel_body, num_clusters, subs, mt_group, pretest,
        worklist, visit_batch, pipeline, flat, page, False,
    )


def _matrix_kernel_body(
    num_clusters, subs, mt_group, pretest, worklist, visit_batch,
    pipeline, flat, page, any_hit,
    *args,
    # positional refs (page > 1 prepends the page-AABB pair):
    #   [pmin_ref, pmax_ref]            VMEM (P, LANES)  (page > 1 only)
    #   cmin_ref, cmax_ref              VMEM (C, LANES)
    #   ox, oy, oz, dx, dy, dz, tmax    VMEM (bs, LANES)
    #   tri_hbm                         ANY (C, 16, TRI_CHUNK)
    #   t_out, tri_out, u_out, v_out, runs_out
    #   rmin                            scratch VMEM (rows(P|C), LANES)
    #   tri_smem                        scratch SMEM (16, W*TRI_CHUNK)
    #   invx_s, invy_s, invz_s          scratch VMEM (bs, LANES) f32
    #   inrun_s                         scratch VMEM (bs, LANES) i32
    #   ew_vmem, ew_smem                scratch (8, LANES) i32
    #   sem, sem2, sem3
):
    if page > 1:
        pmin_ref, pmax_ref = args[0], args[1]
        args = args[2:]
    else:
        pmin_ref = pmax_ref = None
    (cmin_ref, cmax_ref, ox, oy, oz, dx, dy, dz, tmax, tri_hbm,
     t_out, tri_out, u_out, v_out, runs_out,
     rmin, tri_smem, invx_s, invy_s, invz_s, inrun_s,
     ew_vmem, ew_smem, sem, sem2, sem3) = args
    _matrix_traverse(
        num_clusters, subs, mt_group, pretest, worklist, visit_batch,
        pipeline, flat,
        cmin_ref, cmax_ref,
        ox, oy, oz, dx, dy, dz, tmax, tri_hbm,
        t_out, tri_out, u_out, v_out, runs_out,
        rmin, tri_smem, invx_s, invy_s, invz_s, inrun_s,
        ew_vmem, ew_smem, sem, sem2, sem3,
        any_hit=any_hit, page=page,
        pmin_ref=pmin_ref, pmax_ref=pmax_ref,
    )


def _make_matrix_occluded_kernel(num_clusters: int, subs: int,
                                 mt_group: int, pretest: bool,
                                 worklist: bool, visit_batch: int,
                                 pipeline: bool, flat: bool,
                                 page: int = 1):
    """Any-hit variant: a blocked lane zeroes its remaining range, so
    its liveness collapses immediately — shadow queries touch far fewer
    clusters than closest-hit (no need to ORDER hits, just find one)."""
    return functools.partial(
        _matrix_kernel_body, num_clusters, subs, mt_group, pretest,
        worklist, visit_batch, pipeline, flat, page, True,
    )


# 32-sublane MT groups: lanes wanting the selected cluster are CLUMPED
# after any coherence ordering, so predicating the Moller-Trumbore loop
# per group skips most of the tile for most runs. The round-3 sweep
# (tools/probe_tile.py, atrium_big) showed the kernel is per-group
# SCALAR-OVERHEAD-bound, not MT-lane-bound: mg=8 loses ~30%, mg=32
# wins ~9% over mg=16 at bs=128 (127.5 vs 139 ms closest /131k).
_MT_GROUP = 32

# Worklist engine: 4-bit nibble sentinel terminating a packed work list.
_NIB = 0xF


def _pack_worklist(flags):
    """Pack the ids of wanting entries into ONE i32 as 4-bit nibbles
    (low-to-high in list order), 0xF-terminated. All math stays in the
    VECTOR domain, so the caller pays a single vector->scalar sync for
    the whole list — the round-3 sweep showed the branch engine is
    bound by exactly these syncs (one `jnp.any` + `pl.when` region per
    group and per pretest span, ~1-2 us each).

    flags: list of (1, 1) i32 arrays holding 0/1; at most 8 entries.
    """
    assert len(flags) <= 8
    zero = jnp.zeros_like(flags[0])
    cnt = zero
    packed = zero
    for i, w in enumerate(flags):
        packed = packed | jnp.where(
            w != 0, jax.lax.shift_left(zero + i, 4 * cnt), zero
        )
        cnt = cnt + w
    # Sentinel-fill every nibble past the last entry. cnt == 8 leaves
    # no room (and a 32-bit shift would be UB), hence the clamp+select —
    # an all-8 list carries NO sentinel, so drain loops MUST also bound
    # their iteration count (the round-3 hang: 8 wanting pretest spans
    # left nibble 0 spinning forever after the word shifted empty).
    sa = 4 * jnp.minimum(cnt, 7)
    hi = jnp.where(
        cnt >= 8, zero, jax.lax.shift_left(zero - 1, sa)
    )
    return packed | hi

# The kernel is KEYLESS: no (C*bs, LANES) per-lane key matrix. The
# fill pass reduces each cluster's slab test straight to one packed
# scalar (min tn over the tile | cluster id) accumulated into a tiny
# (ceil(C/LANES), LANES) VMEM tile via a masked select, and visits
# recompute the slab row on the fly. Selection is then a single vector
# min over that tile per visit — O(1) instead of the O(C) fold that
# dominated big scenes (644 ms/131k sorted closest at 1861 clusters,
# DESIGN.md round-3) — and with no key matrix the 8 MB VMEM cap no
# longer shrinks the tile height, so big scenes keep 64-sublane tiles
# (8x fewer fill-loop trips than the bs=8 they were forced into).


def _rmin_rows(c: int) -> int:
    rows = -(-c // LANES)   # ceil(C / LANES) packed scalars per row
    return -(-rows // 8) * 8  # sublane-pad to 8


def _matrix_traverse(
    num_clusters, subs, mt_group, pretest, worklist, visit_batch,
    pipeline, flat,
    cmin_ref, cmax_ref,
    ox, oy, oz, dx, dy, dz, tmax,
    tri_hbm,
    t_out, tri_out, u_out, v_out, runs_out,
    rmin, tri_smem, invx_s, invy_s, invz_s, inrun_s,
    ew_vmem, ew_smem, sem, sem2, sem3,
    any_hit: bool,
    page: int = 1,
    pmin_ref=None, pmax_ref=None,
):
    bs = ox.shape[0]  # tile height (intersect_matrix adapts it to C)
    inf_key = jnp.int32(_INF_KEY)
    t_out[:] = tmax[:]
    tri_out[:] = jnp.full(t_out.shape, -1, jnp.int32)
    u_out[:] = jnp.zeros(t_out.shape, jnp.float32)
    v_out[:] = jnp.zeros(t_out.shape, jnp.float32)

    rox, roy, roz = ox[:], oy[:], oz[:]
    rdx, rdy, rdz = dx[:], dy[:], dz[:]
    big = jnp.float32(1e12)
    invx = jnp.where(jnp.abs(rdx) < 1e-12, big, 1.0 / rdx)
    invy = jnp.where(jnp.abs(rdy) < 1e-12, big, 1.0 / rdy)
    invz = jnp.where(jnp.abs(rdz) < 1e-12, big, 1.0 / rdz)
    if worklist:
        # The worklist visit path reads per-group ray slices back from
        # refs with dynamic sublane offsets; park the reciprocals in
        # scratch once so group bodies need no divides.
        invx_s[:] = invx
        invy_s[:] = invy
        invz_s[:] = invz

    def _pack_t(t):
        # Upper liveness bound per lane; non-positive range -> -1 so no
        # key (all >= 0) can pass (dead or already-blocked lanes).
        bits = jax.lax.bitcast_convert_type(jnp.maximum(t, 0.0), jnp.int32)
        return jnp.where(t > 0.0, bits | jnp.int32(_ID_MASK), jnp.int32(-1))

    tm0 = tmax[:]

    def slab_refs(lo_ref, hi_ref, c, t_lim):
        """Box c's slab test against the whole tile: (tn, live)."""
        t0x = (lo_ref[c, 0] - rox) * invx
        t1x = (hi_ref[c, 0] - rox) * invx
        t0y = (lo_ref[c, 1] - roy) * invy
        t1y = (hi_ref[c, 1] - roy) * invy
        t0z = (lo_ref[c, 2] - roz) * invz
        t1z = (hi_ref[c, 2] - roz) * invz
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.minimum(t0z, t1z),
        )
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z),
        )
        return tn, (tn <= tf) & (tf > 0.0) & (tn < t_lim)

    def slab(c, t_lim):
        """Cluster c's slab test against the whole tile: (tn, live)."""
        return slab_refs(cmin_ref, cmax_ref, c, t_lim)

    # Supercluster pages: selection runs over pages of `page`
    # consecutive SAH-adjacent clusters with one union AABB, so the
    # fill loop is page-count long and each drain round serves a whole
    # page through one merged worklist — the per-visit fixed cost
    # (selection fold, bound, scalar syncs) amortizes over `page`
    # clusters. The TLAS/BLAS two-level role the reference gets from
    # the Vulkan driver (/root/reference/src/scene/loader/
    # gpu_uploader.rs:843-959). Exactness is unchanged: per-cluster
    # want-masks are still recomputed against the live t_out at visit
    # time, and the page key (min slab tn of the union box) is a lower
    # bound of every member cluster's entry distance, so the
    # front-to-back early-exit bound stays conservative.
    num_sel = -(-num_clusters // page) if page > 1 else num_clusters
    sel_lo = pmin_ref if page > 1 else cmin_ref
    sel_hi = pmax_ref if page > 1 else cmax_ref

    rm_rows = rmin.shape[0]
    lin = (
        jax.lax.broadcasted_iota(jnp.int32, (rm_rows, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (rm_rows, LANES), 1)
    )
    rmin[:] = jnp.full((rm_rows, LANES), _INF_KEY, jnp.int32)

    def fill_row(c, _):
        tn, hit = slab_refs(sel_lo, sel_hi, c, tm0)
        bits = jax.lax.bitcast_convert_type(
            jnp.maximum(tn, 0.0), jnp.int32
        )
        key = (bits & jnp.int32(~_ID_MASK)) | c
        kmin = jnp.min(jnp.where(hit, key, inf_key))
        rmin[:] = jnp.where(lin == c, kmin, rmin[:])
        return 0

    jax.lax.fori_loop(0, num_sel, fill_row, 0)

    def next_key():
        # Nearest cluster any lane's slab test admitted: one vector min
        # over the rmin tile (the packed key carries the cluster id).
        return jnp.min(rmin[:])

    def bound():
        # Tile-level liveness bound: once every remaining key is at or
        # beyond every lane's own t_best, no visit can improve a lane.
        return jnp.max(_pack_t(t_out[:]))

    def _worklist_visit(clusters, span, n_pre, dma=True, coff0=0):
        """Worklist visit path: the branch engine pays one `jnp.any` +
        `pl.when` region per MT group and per pretest span (~20
        vector->scalar syncs / branches per visit, the measured
        per-visit wall); here each level packs its wanting-entry ids
        into ONE nibble list (vector-domain, single scalar sync) and a
        data-dependent while_loop drains exactly the wanting entries
        via dynamic sublane slices. The triangle DMAs start before the
        mask build so their latency hides under the vector work.

        `clusters` is a list of (cid, chunk, sub_off, base, valid)
        visits drained through ONE merged worklist: batching amortizes
        the per-visit selection/bound overhead and overlaps the DMAs
        (each chunk lands in its own TRI_CHUNK-wide tri_smem column
        block). Entry id e maps to cluster e // n_groups, group
        e % n_groups; per-cluster want-masks ride inrun_s as bits."""
        g_sz = min(mt_group, bs)
        n_groups = bs // g_sz
        nib = jnp.int32(_NIB)
        nb = len(clusters)

        def mt_span_at(gsl, g_mask, g_ox, g_oy, g_oz, g_dx, g_dy, g_dz,
                       coff, sub_off, base, k0, k_n):
            """Moller-Trumbore over one mt_group slice for triangles
            [k0, k0+k_n) of the visit's chunk column (shared by the
            nibble drain and the flat SMEM-entry drain)."""
            def tri_body(k, _):
                t = coff + sub_off + k0 + k
                av0x = tri_smem[0, t]
                av0y = tri_smem[1, t]
                av0z = tri_smem[2, t]
                ae1x = tri_smem[3, t]
                ae1y = tri_smem[4, t]
                ae1z = tri_smem[5, t]
                ae2x = tri_smem[6, t]
                ae2y = tri_smem[7, t]
                ae2z = tri_smem[8, t]

                px = g_dy * ae2z - g_dz * ae2y
                py = g_dz * ae2x - g_dx * ae2z
                pz = g_dx * ae2y - g_dy * ae2x
                det = px * ae1x + py * ae1y + pz * ae1z
                inv_det = jnp.where(
                    jnp.abs(det) > _EPS, 1.0 / det, 0.0
                )
                tx = g_ox - av0x
                ty = g_oy - av0y
                tz = g_oz - av0z
                u = (tx * px + ty * py + tz * pz) * inv_det
                qx = ty * ae1z - tz * ae1y
                qy = tz * ae1x - tx * ae1z
                qz = tx * ae1y - ty * ae1x
                v = (g_dx * qx + g_dy * qy + g_dz * qz) * inv_det
                tt = (ae2x * qx + ae2y * qy + ae2z * qz) * inv_det

                t_cur = t_out[gsl]
                ok = (
                    g_mask
                    & (jnp.abs(det) > _EPS)
                    & (u >= 0.0)
                    & (v >= 0.0)
                    & (u + v <= 1.0)
                    & (tt > _T_MIN)
                    & (tt < t_cur)
                )
                if any_hit:
                    t_out[gsl] = jnp.where(ok, 0.0, t_cur)
                    tri_out[gsl] = jnp.where(
                        ok, base + k0 + k, tri_out[gsl]
                    )
                else:
                    t_out[gsl] = jnp.where(ok, tt, t_cur)
                    tri_out[gsl] = jnp.where(
                        ok, base + k0 + k, tri_out[gsl]
                    )
                    u_out[gsl] = jnp.where(ok, u, u_out[gsl])
                    v_out[gsl] = jnp.where(ok, v, v_out[gsl])
                return 0

            jax.lax.fori_loop(0, k_n, tri_body, 0)

        if flat and nb == 1 and n_pre > 0 and n_groups <= LANES:
            # FLAT drain: the two-level nibble scheme pays one
            # vector->scalar sync per word PLUS one per drained group
            # (the span pack) — measured ~10 of the 37.6 us/visit at
            # bs=512/mg=32 (probe_visits + DESIGN.md round-4 ledger).
            # Here every (group, span-mask) want is computed in ONE
            # vector pass (full-tile pretest slabs folded per group),
            # staged one 32-bit entry per LANE of a (8, LANES) VMEM
            # tile, and DMA'd to SMEM — after which the whole drain is
            # scalar-domain SMEM reads: per visit the only
            # vector->scalar round trips left are the selection min,
            # the liveness bound, and this one 4 KB DMA wait.
            cid, chunk, sub_off, base, valid = clusters[0]
            if dma:
                cp = pltpu.make_async_copy(
                    tri_hbm.at[chunk], tri_smem.at[:, 0:TRI_CHUNK], sem
                )
                cp.start()
            _, in_run = slab(cid, t_out[:])
            if valid is not None:
                in_run = in_run & valid
            inrun_s[:] = in_run.astype(jnp.int32)
            if dma:
                cp.wait()
            # Full-tile sub-chunk pretest (row-9 span AABBs just
            # landed): span p is wanted by group g iff any of g's lanes
            # is live for the cluster AND enters the span's box before
            # its current best t.
            t_cur_full = t_out[:]
            pre_m = []
            for p in range(n_pre):
                lane0 = coff0 + (sub_off // _PRETEST_TRIS + p) * 6
                bnx = tri_smem[9, lane0 + 0]
                bny = tri_smem[9, lane0 + 1]
                bnz = tri_smem[9, lane0 + 2]
                bxx = tri_smem[9, lane0 + 3]
                bxy = tri_smem[9, lane0 + 4]
                bxz = tri_smem[9, lane0 + 5]
                p0x = (bnx - rox) * invx
                p1x = (bxx - rox) * invx
                p0y = (bny - roy) * invy
                p1y = (bxy - roy) * invy
                p0z = (bnz - roz) * invz
                p1z = (bxz - roz) * invz
                ptn = jnp.maximum(
                    jnp.maximum(
                        jnp.minimum(p0x, p1x), jnp.minimum(p0y, p1y)
                    ),
                    jnp.minimum(p0z, p1z),
                )
                ptf = jnp.minimum(
                    jnp.minimum(
                        jnp.maximum(p0x, p1x), jnp.maximum(p0y, p1y)
                    ),
                    jnp.maximum(p0z, p1z),
                )
                pre = (
                    in_run & (ptn <= ptf) & (ptf > 0.0)
                    & (ptn < t_cur_full)
                )
                pre_m.append(pre.astype(jnp.int32))
            # Per-group span masks, then one 32-bit (g << 16 | mask)
            # entry per wanting group, compacted into row 0's lanes by
            # a running count; -1 pads (n_groups < LANES guarantees a
            # sentinel lane).
            row_i = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
            lane_i = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
            acc = jnp.full((8, LANES), -1, jnp.int32)
            cnt = jnp.zeros((1, 1), jnp.int32)
            for g in range(n_groups):
                sl = slice(g * g_sz, (g + 1) * g_sz)
                bits = jnp.zeros((1, 1), jnp.int32)
                for p in range(n_pre):
                    b = jnp.max(pre_m[p][sl], axis=(0, 1), keepdims=True)
                    bits = bits | jax.lax.shift_left(b, p)
                has = bits != 0
                entry = jnp.full((1, 1), g << 16, jnp.int32) | bits
                acc = jnp.where(
                    (row_i == 0) & (lane_i == cnt) & has, entry, acc
                )
                cnt = cnt + has.astype(jnp.int32)
            ew_vmem[:] = acc
            cpe = pltpu.make_async_copy(ew_vmem, ew_smem, sem3)
            cpe.start()
            cpe.wait()

            def flat_entry(carry):
                idx = carry
                e = ew_smem[0, idx]
                g = jax.lax.shift_right_logical(e, 16)
                mask0 = e & jnp.int32(0xFFFF)
                gsl = pl.ds(g * g_sz, g_sz)
                g_ox, g_oy, g_oz = ox[gsl], oy[gsl], oz[gsl]
                g_dx, g_dy, g_dz = dx[gsl], dy[gsl], dz[gsl]
                g_mask = inrun_s[gsl] != 0

                def s_body(c):
                    m, p = c

                    @pl.when((m & 1) != 0)
                    def _():
                        mt_span_at(
                            gsl, g_mask, g_ox, g_oy, g_oz,
                            g_dx, g_dy, g_dz,
                            jnp.int32(coff0), sub_off, base,
                            p * _PRETEST_TRIS, _PRETEST_TRIS,
                        )
                    return (
                        jax.lax.shift_right_logical(m, 1), p + 1
                    )

                jax.lax.while_loop(
                    lambda c: c[0] != 0, s_body, (mask0, jnp.int32(0))
                )
                return idx + 1

            jax.lax.while_loop(
                lambda i: ew_smem[0, i] != -1, flat_entry, jnp.int32(0)
            )
            return

        cps = []
        if dma:
            for i, (cid, chunk, sub_off, base, valid) in enumerate(
                clusters
            ):
                cp = pltpu.make_async_copy(
                    tri_hbm.at[chunk],
                    tri_smem.at[:, i * TRI_CHUNK:(i + 1) * TRI_CHUNK],
                    sem,
                )
                cp.start()
                cps.append(cp)

        packed_run = jnp.zeros((bs, LANES), jnp.int32)
        flags = []
        runs = []
        for i, (cid, chunk, sub_off, base, valid) in enumerate(clusters):
            _, in_run = slab(cid, t_out[:])
            if valid is not None:
                in_run = in_run & valid
            runs.append(in_run)
            packed_run = packed_run | (
                in_run.astype(jnp.int32) << i
            )
        inrun_s[:] = packed_run
        # Cluster-major entry order preserves front-to-back visiting
        # (clusters arrive nearest-first from the selection min).
        for i in range(nb):
            for g in range(n_groups):
                flags.append(
                    jnp.max(
                        runs[i][g * g_sz:(g + 1) * g_sz].astype(jnp.int32),
                        axis=(0, 1), keepdims=True,
                    )
                )
        # One nibble word holds 8 entries; finer MT groups (mg=8 at
        # bs=128 -> 16 groups) or batched visits spill into extra
        # words, drained in order (global entry id = word*8 + nibble).
        # Cost per extra word: one vector->scalar sync per visit.
        words = [
            _pack_worklist(flags[w:w + 8])[0, 0]
            for w in range(0, len(flags), 8)
        ]
        for cp in cps:
            cp.wait()

        def g_body(pkc, base_e):
            e = (pkc & nib) + jnp.int32(base_e)
            if nb == 1:
                g = e
                ci = jnp.int32(0)
                sub_off = clusters[0][2]
                base = clusters[0][3]
                coff = jnp.int32(coff0)
            else:
                g = jax.lax.rem(e, jnp.int32(n_groups))
                ci = e // jnp.int32(n_groups)
                # Scalar select chain (no 1D arrays in Mosaic).
                sub_off = clusters[0][2]
                base = clusters[0][3]
                for i in range(1, nb):
                    sub_off = jnp.where(ci == i, clusters[i][2], sub_off)
                    base = jnp.where(ci == i, clusters[i][3], base)
                coff = ci * TRI_CHUNK
            lo = g * g_sz
            gsl = pl.ds(lo, g_sz)
            g_ox, g_oy, g_oz = ox[gsl], oy[gsl], oz[gsl]
            g_dx, g_dy, g_dz = dx[gsl], dy[gsl], dz[gsl]
            g_ix = invx_s[gsl]
            g_iy = invy_s[gsl]
            g_iz = invz_s[gsl]
            if nb == 1:
                g_mask = inrun_s[gsl] != 0
            else:
                g_mask = (
                    jax.lax.shift_right_logical(inrun_s[gsl], ci) & 1
                ) != 0

            def mt_span(k0, k_n):
                mt_span_at(
                    gsl, g_mask, g_ox, g_oy, g_oz, g_dx, g_dy, g_dz,
                    coff, sub_off, base, k0, k_n,
                )

            if n_pre == 0:
                mt_span(jnp.int32(0), span)
            else:
                sflags = []
                for p in range(n_pre):
                    lane0 = coff + (sub_off // _PRETEST_TRIS + p) * 6
                    bnx = tri_smem[9, lane0 + 0]
                    bny = tri_smem[9, lane0 + 1]
                    bnz = tri_smem[9, lane0 + 2]
                    bxx = tri_smem[9, lane0 + 3]
                    bxy = tri_smem[9, lane0 + 4]
                    bxz = tri_smem[9, lane0 + 5]
                    p0x = (bnx - g_ox) * g_ix
                    p1x = (bxx - g_ox) * g_ix
                    p0y = (bny - g_oy) * g_iy
                    p1y = (bxy - g_oy) * g_iy
                    p0z = (bnz - g_oz) * g_iz
                    p1z = (bxz - g_oz) * g_iz
                    ptn = jnp.maximum(
                        jnp.maximum(
                            jnp.minimum(p0x, p1x),
                            jnp.minimum(p0y, p1y),
                        ),
                        jnp.minimum(p0z, p1z),
                    )
                    ptf = jnp.minimum(
                        jnp.minimum(
                            jnp.maximum(p0x, p1x),
                            jnp.maximum(p0y, p1y),
                        ),
                        jnp.maximum(p0z, p1z),
                    )
                    pre = (
                        g_mask
                        & (ptn <= ptf)
                        & (ptf > 0.0)
                        & (ptn < t_out[gsl])
                    )
                    sflags.append(
                        jnp.max(
                            pre.astype(jnp.int32),
                            axis=(0, 1), keepdims=True,
                        )
                    )
                sp0 = _pack_worklist(sflags)[0, 0]

                def s_body(carry):
                    spc, si = carry
                    mt_span((spc & nib) * _PRETEST_TRIS, _PRETEST_TRIS)
                    return (
                        jax.lax.shift_right_logical(spc, 4), si + 1
                    )

                jax.lax.while_loop(
                    lambda c: ((c[0] & nib) != nib)
                    & (c[1] < len(sflags)),
                    s_body, (sp0, jnp.int32(0)),
                )
            return jax.lax.shift_right_logical(pkc, 4)

        for w, word in enumerate(words):
            cap = min(8, len(flags) - w * 8)

            def g_loop(carry, base_e=w * 8):
                pkc, gi = carry
                return g_body(pkc, base_e), gi + 1

            jax.lax.while_loop(
                lambda c, cap=cap: ((c[0] & nib) != nib) & (c[1] < cap),
                g_loop, (word, jnp.int32(0)),
            )

    max_chunk = jnp.int32((num_clusters - 1) // subs)

    def _decode(cid):
        chunk = jnp.minimum(cid // subs, max_chunk)
        sub_off = (cid % subs) * (TRI_CHUNK // subs)
        return chunk, sub_off, chunk * TRI_CHUNK + sub_off

    def run_counted(carry):
        skey, _, cnt = carry
        cid = skey & jnp.int32(_ID_MASK)
        rmin[:] = jnp.where(lin == cid, inf_key, rmin[:])

        span = min(_MT_ITERS, TRI_CHUNK // subs)
        n_pre = (
            span // _PRETEST_TRIS
            if pretest and span % _PRETEST_TRIS == 0 else 0
        )

        if page > 1:
            # `cid` is a PAGE id: drain its `page` member clusters
            # through one merged worklist. The tail page carries
            # past-the-end cluster ids; their `valid` mask kills every
            # want lane (the wrapper pads the cluster-AABB operand rows
            # so the slab recompute stays in bounds, and _decode clamps
            # the DMA chunk).
            visits = []
            for i in range(page):
                cid_i = cid * jnp.int32(page) + jnp.int32(i)
                chunk_i, sub_off_i, base_i = _decode(cid_i)
                # Only tail-page members at index >= C % page can fall
                # past the end; every other (page, i) is always real.
                valid_i = (
                    None
                    if num_clusters % page == 0
                    or i < num_clusters % page
                    else cid_i < jnp.int32(num_clusters)
                )
                visits.append((cid_i, chunk_i, sub_off_i, base_i, valid_i))
            _worklist_visit(visits, span, n_pre)
            return next_key(), bound(), cnt + 1

        chunk, sub_off, base = _decode(cid)

        if worklist:
            visits = [(cid, chunk, sub_off, base, None)]
            extra = jnp.int32(0)
            for _ in range(visit_batch - 1):
                # Pull the NEXT-nearest cluster into the same visit:
                # its DMA overlaps the first one's and the whole batch
                # shares one selection/bound round. An exhausted
                # selection yields _INF_KEY; mask that visit out (and
                # guard its rmin clear — the masked id aliases _ID_MASK).
                skey_n = next_key()
                ok_n = skey_n != inf_key
                cid_n = skey_n & jnp.int32(_ID_MASK)
                rmin[:] = jnp.where(
                    (lin == cid_n) & ok_n, inf_key, rmin[:]
                )
                chunk_n, sub_off_n, base_n = _decode(cid_n)
                visits.append((cid_n, chunk_n, sub_off_n, base_n, ok_n))
                extra = extra + ok_n.astype(jnp.int32)
            _worklist_visit(visits, span, n_pre)
            return next_key(), bound(), cnt + 1 + extra

        # --- branch engine (original visit path) ---
        # Recompute the slab row (keyless): exact per-lane want-mask
        # against the CURRENT t_best, tighter than a cached key.
        _, in_run = slab(cid, t_out[:])

        # The selection bound is tile-global, so a selected cluster may
        # interest no lane anymore — skip its DMA entirely (the group
        # loops below already skip via their own any(g_mask) guards).
        @pl.when(jnp.any(in_run))
        def _fetch():
            cp = pltpu.make_async_copy(tri_hbm.at[chunk], tri_smem, sem)
            cp.start()
            cp.wait()
        # The predication group can never exceed the tile height: tests
        # pin bs below _MT_GROUP via `sublanes`, and range(bs // 16) ==
        # range(0) at bs=8 silently tested NO triangles — every ray
        # missed (caught on atrium_big when the old keyed kernel shrank
        # big-scene tiles to bs=8: sky-only renders).
        g_sz = min(mt_group, bs)
        for gi in range(bs // g_sz):
            lo = gi * g_sz
            hi = lo + g_sz
            g_mask = in_run[lo:hi, :]

            @pl.when(jnp.any(g_mask))
            def _mt_group(lo=lo, hi=hi, g_mask=g_mask):
                g_dx, g_dy, g_dz = rdx[lo:hi], rdy[lo:hi], rdz[lo:hi]
                g_ox, g_oy, g_oz = rox[lo:hi], roy[lo:hi], roz[lo:hi]
                g_ix, g_iy, g_iz = invx[lo:hi], invy[lo:hi], invz[lo:hi]

                def tri_body(k, _):
                    t = sub_off + k
                    av0x = tri_smem[0, t]
                    av0y = tri_smem[1, t]
                    av0z = tri_smem[2, t]
                    ae1x = tri_smem[3, t]
                    ae1y = tri_smem[4, t]
                    ae1z = tri_smem[5, t]
                    ae2x = tri_smem[6, t]
                    ae2y = tri_smem[7, t]
                    ae2z = tri_smem[8, t]

                    px = g_dy * ae2z - g_dz * ae2y
                    py = g_dz * ae2x - g_dx * ae2z
                    pz = g_dx * ae2y - g_dy * ae2x
                    det = px * ae1x + py * ae1y + pz * ae1z
                    inv_det = jnp.where(
                        jnp.abs(det) > _EPS, 1.0 / det, 0.0
                    )
                    tx = g_ox - av0x
                    ty = g_oy - av0y
                    tz = g_oz - av0z
                    u = (tx * px + ty * py + tz * pz) * inv_det
                    qx = ty * ae1z - tz * ae1y
                    qy = tz * ae1x - tx * ae1z
                    qz = tx * ae1y - ty * ae1x
                    v = (g_dx * qx + g_dy * qy + g_dz * qz) * inv_det
                    tt = (ae2x * qx + ae2y * qy + ae2z * qz) * inv_det

                    t_cur = t_out[lo:hi, :]
                    ok = (
                        g_mask
                        & (jnp.abs(det) > _EPS)
                        & (u >= 0.0)
                        & (v >= 0.0)
                        & (u + v <= 1.0)
                        & (tt > _T_MIN)
                        & (tt < t_cur)
                    )
                    if any_hit:
                        # Blocked: zero the remaining range; liveness
                        # (t > 0) dies, ending this lane's traversal.
                        t_out[lo:hi, :] = jnp.where(ok, 0.0, t_cur)
                        tri_out[lo:hi, :] = jnp.where(
                            ok, base + k, tri_out[lo:hi, :]
                        )
                    else:
                        t_out[lo:hi, :] = jnp.where(ok, tt, t_cur)
                        tri_out[lo:hi, :] = jnp.where(
                            ok, base + k, tri_out[lo:hi, :]
                        )
                        u_out[lo:hi, :] = jnp.where(ok, u, u_out[lo:hi, :])
                        v_out[lo:hi, :] = jnp.where(ok, v, v_out[lo:hi, :])
                    return 0

                if n_pre == 0:
                    jax.lax.fori_loop(0, span, tri_body, 0)
                else:
                    # Sub-chunk pretest: 16-triangle spans are skipped
                    # when no live lane's ray enters their AABB (packed
                    # in tri_smem row 9 by subchunk_aabb_row). Bounce
                    # rays want 1-3 of a chunk's 8 spans, so the ~90
                    # cycles of slab test per span replace most of the
                    # ~2k-cycle lockstep MT iterations they gate.
                    for p in range(n_pre):
                        lane0 = (
                            sub_off // _PRETEST_TRIS + p
                        ) * 6
                        bnx = tri_smem[9, lane0 + 0]
                        bny = tri_smem[9, lane0 + 1]
                        bnz = tri_smem[9, lane0 + 2]
                        bxx = tri_smem[9, lane0 + 3]
                        bxy = tri_smem[9, lane0 + 4]
                        bxz = tri_smem[9, lane0 + 5]
                        p0x = (bnx - g_ox) * g_ix
                        p1x = (bxx - g_ox) * g_ix
                        p0y = (bny - g_oy) * g_iy
                        p1y = (bxy - g_oy) * g_iy
                        p0z = (bnz - g_oz) * g_iz
                        p1z = (bxz - g_oz) * g_iz
                        ptn = jnp.maximum(
                            jnp.maximum(
                                jnp.minimum(p0x, p1x),
                                jnp.minimum(p0y, p1y),
                            ),
                            jnp.minimum(p0z, p1z),
                        )
                        ptf = jnp.minimum(
                            jnp.minimum(
                                jnp.maximum(p0x, p1x),
                                jnp.maximum(p0y, p1y),
                            ),
                            jnp.maximum(p0z, p1z),
                        )
                        pre_hit = (
                            g_mask
                            & (ptn <= ptf)
                            & (ptf > 0.0)
                            & (ptn < t_out[lo:hi, :])
                        )

                        @pl.when(jnp.any(pre_hit))
                        def _span(p=p):
                            def span_body(k, _):
                                return tri_body(p * _PRETEST_TRIS + k, 0)

                            jax.lax.fori_loop(
                                0, _PRETEST_TRIS, span_body, 0
                            )

        return next_key(), bound(), cnt + 1

    if worklist and pipeline:
        # Software-pipelined visits: cluster N+1's 8 KB triangle DMA is
        # in flight while cluster N's worklist drains, on static
        # ping-pong tri_smem halves with per-half semaphores (a SHARED
        # semaphore cannot distinguish which copy landed — waiting one
        # signal of two in-flight copies is a race). Each iteration
        # processes two clusters so the half/sem references stay
        # static. Selection (rmin) is fill-time static, so selecting
        # ahead of processing changes nothing; want-masks are still
        # computed against the CURRENT t_out at process time.
        span_p = min(_MT_ITERS, TRI_CHUNK // subs)
        n_pre_p = (
            span_p // _PRETEST_TRIS
            if pretest and span_p % _PRETEST_TRIS == 0 else 0
        )
        halves = [
            tri_smem.at[:, 0:TRI_CHUNK],
            tri_smem.at[:, TRI_CHUNK:2 * TRI_CHUNK],
        ]
        sems = [sem, sem2]

        def _select_clear():
            sk = next_key()
            cid = sk & jnp.int32(_ID_MASK)
            ok = sk != inf_key
            rmin[:] = jnp.where((lin == cid) & ok, inf_key, rmin[:])
            return sk, cid, ok

        def _start(cid, hi):
            chunk, sub_off, base = _decode(cid)
            pltpu.make_async_copy(
                tri_hbm.at[chunk], halves[hi], sems[hi]
            ).start()
            return sub_off, base

        def _wait(hi):
            pltpu.make_async_copy(
                tri_hbm.at[0], halves[hi], sems[hi]
            ).wait()

        def pipe_body(carry):
            sk_a, _, cnt = carry
            cid_a = sk_a & jnp.int32(_ID_MASK)
            _, sub_a, base_a = _decode(cid_a)
            sk_b, cid_b, ok_b = _select_clear()
            sub_b, base_b = _start(cid_b, 1)
            _wait(0)
            _worklist_visit(
                [(cid_a, None, sub_a, base_a, None)],
                span_p, n_pre_p, dma=False, coff0=0,
            )
            sk_c, cid_c, _ = _select_clear()
            _start(cid_c, 0)
            _wait(1)
            _worklist_visit(
                [(cid_b, None, sub_b, base_b, ok_b)],
                span_p, n_pre_p, dma=False, coff0=TRI_CHUNK,
            )
            return sk_c, bound(), cnt + 1 + ok_b.astype(jnp.int32)

        sk0, cid0, _ = _select_clear()
        _start(cid0, 0)
        _, _, n_runs = jax.lax.while_loop(
            lambda c: c[0] < c[1], pipe_body,
            (sk0, bound(), jnp.int32(0)),
        )
        # Exactly one prefetch is always left in flight on half 0 (the
        # prologue copy if zero iterations ran, else the last C).
        _wait(0)
    else:
        _, _, n_runs = jax.lax.while_loop(
            lambda c: c[0] < c[1], run_counted,
            (next_key(), bound(), jnp.int32(0)),
        )
    runs_out[:] = jnp.full(t_out.shape, 1, jnp.int32) * n_runs


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "with_stats", "any_hit", "subs",
                     "sublanes", "mt_group", "pretest", "worklist",
                     "visit_batch", "pipeline", "flat", "page"),
)
def intersect_matrix(
    o: jnp.ndarray,
    d: jnp.ndarray,
    geometry,
    t_max=None,
    interpret: bool = False,
    with_stats: bool = False,
    any_hit: bool = False,
    subs: int = 1,
    sublanes: int | None = None,
    mt_group: int | None = None,
    pretest: bool = True,
    worklist: bool = False,
    visit_batch: int = 1,
    pipeline: bool = False,
    flat: bool = False,
    page: int = 1,
) -> Hit:
    """Exact closest hit via the VMEM-resident matrix traversal.

    `subs` splits each 128-triangle DMA chunk into finer traversal
    clusters: tighter entry distances, fewer false in_run lanes, and
    fewer Moller-Trumbore iterations per run, at the cost of a taller
    key matrix (which also shrinks the adaptive tile height below).
    With the binned-SAH cluster layout (ops/sahbuild.py) the chunk
    AABBs are already tight, so subs=1 is the default. The fine AABBs are a
    cheap reshape-reduce over the (already Morton-ordered) triangle
    soup, so no upload-side table change is needed.

    Scales to MATRIX_MAX_CLUSTERS and ~VMEM/8KB fine clusters per tile;
    the integrator falls back to traverse_query beyond that.
    """
    n = o.shape[0]
    n_chunks = geometry.tri_packed.shape[0]
    c = n_chunks * subs
    assert c <= MATRIX_MAX_CLUSTERS, "cluster id must fit the key's low bits"
    if subs == 1:
        cmin, cmax = geometry.cluster_min, geometry.cluster_max
        assert cmin.shape[0] == c, "geometry tables are per 128-tri chunk"
    else:
        # Fine AABBs over the Morton-ordered soup; padding triangles
        # carry far-away sentinel bounds (same convention as upload).
        sub_sz = geometry.tri_v0.shape[0] // c
        v0, e1, e2 = geometry.tri_v0, geometry.tri_e1, geometry.tri_e2
        real = geometry.tri_mat >= 0
        t_lo = jnp.minimum(jnp.minimum(v0, v0 + e1), v0 + e2)
        t_hi = jnp.maximum(jnp.maximum(v0, v0 + e1), v0 + e2)
        far = jnp.float32(3.0e37)
        t_lo = jnp.where(real[:, None], t_lo, far)
        t_hi = jnp.where(real[:, None], t_hi, far)
        cmin = t_lo.reshape(c, sub_sz, 3).min(axis=1)
        cmax = t_hi.reshape(c, sub_sz, 3).max(axis=1)
    if t_max is None:
        tm = varying_like(o[:, 0], 0.0) + T_MAX
    else:
        tm = jnp.broadcast_to(t_max, (n,)).astype(jnp.float32)

    # The keyless kernel's VMEM footprint is O(C) (one packed scalar
    # per cluster), not O(C * bs), so every scene keeps the full
    # 64-sublane tile height. `sublanes` pins it for tests (the bs=8
    # regression: tiles below the 16-sublane predication group).
    bs = MATRIX_SUBLANES if sublanes is None else sublanes
    block = bs * LANES
    n_pad = -(-n // block) * block
    if n_pad != n:
        pad = n_pad - n
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        tm_p = jnp.pad(tm, (0, pad))
    else:
        tm_p = tm

    nb = n_pad // block
    shape2 = (n_pad // LANES, LANES)

    def comp(a):
        return a.reshape(shape2)

    mg = _MT_GROUP if mt_group is None else mt_group
    # The worklist engine packs wanting-entry ids into 32-bit nibble
    # lists; the group level spills past 8 entries into extra words
    # (one extra scalar sync each), capped at 4 words, while the
    # pretest-span level stays single-word (8 spans at subs=1).
    span = min(_MT_ITERS, TRI_CHUNK // subs)
    n_pre = (
        span // _PRETEST_TRIS
        if pretest and span % _PRETEST_TRIS == 0 else 0
    )
    wl = worklist and bs // min(mg, bs) <= 32 and n_pre <= 8
    # Supercluster pages need the merged-worklist visit path and
    # exclude the (mutually redundant) batch/pipeline/flat variants.
    pg = page if (wl and page > 1 and subs == 1 and c > page) else 1
    vb = visit_batch if (
        wl and pg == 1 and visit_batch * (bs // min(mg, bs)) <= 32
    ) else 1
    pipe = bool(pipeline) and wl and vb == 1 and pg == 1
    # Flat SMEM-entry drain: single-visit worklist with pretest spans
    # only (the (group, span-mask) entries assume both), entries bounded
    # by the staging row's lane count.
    fl = (
        bool(flat) and wl and vb == 1 and pg == 1 and n_pre > 0
        and bs // min(mg, bs) <= LANES
    )

    # Lane- and row-padded AABB operands (see ops/cluster.py note).
    # With pages the cluster rows extend to the tail page's end so the
    # visit-time slab recompute of past-the-end members stays in
    # bounds (their want lanes are killed by the `valid` mask).
    c_full = -(-c // pg) * pg
    c_rows = c_full + (-c_full) % 8
    cmin_in = jnp.pad(cmin, ((0, c_rows - c), (0, LANES - 3)))
    cmax_in = jnp.pad(cmax, ((0, c_rows - c), (0, LANES - 3)))
    aabb_spec = pl.BlockSpec(
        (c_rows, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    ray_spec = pl.BlockSpec(
        (bs, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    tri_spec = pl.BlockSpec(memory_space=pl.ANY)

    extra_in = []
    extra_specs = []
    num_sel = c
    if pg > 1:
        # Page (union) AABBs over `pg` consecutive SAH-adjacent
        # clusters; padding members carry inverted far boxes so the
        # union ignores them.
        num_sel = c_full // pg
        far = jnp.float32(3.0e37)
        pm = jnp.pad(cmin, ((0, c_full - c), (0, 0)), constant_values=far)
        px = jnp.pad(cmax, ((0, c_full - c), (0, 0)),
                     constant_values=-far)
        pmin = pm.reshape(num_sel, pg, 3).min(axis=1)
        pmax = px.reshape(num_sel, pg, 3).max(axis=1)
        p_rows = num_sel + (-num_sel) % 8
        extra_in = [
            jnp.pad(pmin, ((0, p_rows - num_sel), (0, LANES - 3))),
            jnp.pad(pmax, ((0, p_rows - num_sel), (0, LANES - 3))),
        ]
        extra_specs = [
            pl.BlockSpec(
                (p_rows, LANES), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            )
        ] * 2

    kern = (
        _make_matrix_occluded_kernel(c, subs, mg, pretest, wl, vb, pipe,
                                     fl, pg)
        if any_hit
        else _make_matrix_kernel(c, subs, mg, pretest, wl, vb, pipe, fl,
                                 pg)
    )
    t_b, tri_b, u_b, v_b, runs_b = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=extra_specs + [aabb_spec, aabb_spec]
        + [ray_spec] * 7 + [tri_spec],
        out_specs=[ray_spec] * 5,
        out_shape=[
            out_struct(shape2, jnp.float32, comp(tm_p)),
            out_struct(shape2, jnp.int32, comp(tm_p)),
            out_struct(shape2, jnp.float32, comp(tm_p)),
            out_struct(shape2, jnp.float32, comp(tm_p)),
            out_struct(shape2, jnp.int32, comp(tm_p)),
        ],
        scratch_shapes=[
            pltpu.VMEM((_rmin_rows(num_sel), LANES), jnp.int32),
            pltpu.SMEM((16, (2 if pipe else max(vb, pg)) * TRI_CHUNK),
                       jnp.float32),
            pltpu.VMEM((bs, LANES), jnp.float32),
            pltpu.VMEM((bs, LANES), jnp.float32),
            pltpu.VMEM((bs, LANES), jnp.float32),
            pltpu.VMEM((bs, LANES), jnp.int32),
            pltpu.VMEM((8, LANES), jnp.int32),
            pltpu.SMEM((8, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        *extra_in,
        cmin_in, cmax_in,
        comp(o[:, 0]), comp(o[:, 1]), comp(o[:, 2]),
        comp(d[:, 0]), comp(d[:, 1]), comp(d[:, 2]),
        comp(tm_p), geometry.tri_packed,
    )

    hit = Hit(
        t=t_b.reshape(-1)[:n],
        tri=tri_b.reshape(-1)[:n],
        u=u_b.reshape(-1)[:n],
        v=v_b.reshape(-1)[:n],
    )
    if with_stats:
        return hit, runs_b.reshape(nb, block)[:, 0]
    return hit


@functools.partial(jax.jit, static_argnames=("interpret",))
def occluded_matrix(o, d, t_far, geometry, interpret: bool = False):
    """Any-hit shadow query: True where something lies in (T_MIN, t_far).
    Uses the any-hit matrix kernel — a blocked lane stops traversing
    immediately instead of ordering hits."""
    hit = intersect_matrix(
        o, d, geometry, t_max=t_far, interpret=interpret, any_hit=True
    )
    return hit.tri >= 0


# ---------------------------------------------------------------------------
# Grouped MXU traversal: Moller-Trumbore as a matmul over a static grid.
#
# The four MT determinants are scalar triple products that factor into
# dot products of per-RAY features against per-TRIANGLE coefficient
# vectors (relative to the chunk's AABB center cc for conditioning):
#
#   o' = o - cc,  w' = (o x d) - cc x d,  F = [o'(3), d(3), w'(3), 1]
#   n = e1 x e2, c0 = v0'.n, c1 = e2 x v0', c2 = v0' x e1   (per tri)
#
#   det   = -d.n                 u_num = w'.e2 - d.c1
#   v_num = -w'.e1 - d.c2        t_num = o'.n - c0
#
# so ONE (16,512)^T x (16,128) MXU matmul tests a 128-triangle chunk
# against a 128-ray group, replacing the ~65-VPU-op/pair sequential
# loop of the block kernel. Work selection happens entirely in XLA:
# rays are cut into 128-ray groups, a dense slab sweep + top_k yields
# each group's candidate chunks ordered by entry distance, and the
# flattened (group, chunk) pairs become a STATIC Pallas grid with
# scalar-prefetch indexing — no in-kernel while_loop, no dynamic row
# loops, nothing that defeats Mosaic's pipelining (a previous
# while-loop variant of this kernel measured ~90 ns of serial latency
# per dynamically-addressed row step; the static grid amortizes it).
# Blocks are ordered (slot, chunk)-major so consecutive grid steps
# reuse the same coefficient block's VMEM copy (Pallas skips the DMA
# when the index map repeats) and capacity truncation drops the
# farthest candidates first. Truncated or overflowed groups fall back
# to the exact block kernel with t_max preset to their current best
# hit (lax.cond — free when nothing overflowed), so the result is
# exact: tests force tiny caps and compare against brute force.
# ---------------------------------------------------------------------------

GROUP = LANES             # rays per group = one lane row
_MM_COLS = 4 * TRI_CHUNK  # [det | u_num | v_num | t_num] x 128 tris
# Mosaic supports DEFAULT (single-pass bf16) or HIGHEST (fp32 contract)
# only; bf16 is too coarse for hit decisions, so fp32 it is.
_MM_PRECISION = jax.lax.Precision.HIGHEST


def mm_table(geometry, cmin, cmax):
    """Per-chunk MT coefficient blocks (C, 16, 4*TRI_CHUNK).

    Columns hold [det | u_num | v_num | t_num] x TRI_CHUNK, built from
    triangles re-centered at their chunk's AABB center (the kernel
    subtracts the identical f32 center, 0.5*(cmin+cmax), from the ray
    features). Cheap O(T) fused jnp, so it is rebuilt per query and
    always consistent with refit/deformed geometry. Padding triangles
    (e1 = e2 = 0) produce all-zero columns -> det 0 -> never valid."""
    c = geometry.tri_packed.shape[0]
    cc = 0.5 * (cmin + cmax)  # (C, 3)
    v0 = geometry.tri_v0.reshape(c, TRI_CHUNK, 3) - cc[:, None, :]
    e1 = geometry.tri_e1.reshape(c, TRI_CHUNK, 3)
    e2 = geometry.tri_e2.reshape(c, TRI_CHUNK, 3)
    n = jnp.cross(e1, e2)
    c0 = jnp.sum(v0 * n, axis=-1)
    c1 = jnp.cross(e2, v0)
    c2 = jnp.cross(v0, e1)

    def t(a):  # (C, T, 3) -> (C, 3, T)
        return a.transpose(0, 2, 1)

    g = jnp.zeros((c, 16, 4, TRI_CHUNK), jnp.float32)
    g = g.at[:, 3:6, 0].set(t(-n))        # det   = -d.n
    g = g.at[:, 3:6, 1].set(t(-c1))       # u_num = w'.e2 - d.c1
    g = g.at[:, 6:9, 1].set(t(e2))
    g = g.at[:, 3:6, 2].set(t(-c2))       # v_num = -w'.e1 - d.c2
    g = g.at[:, 6:9, 2].set(t(-e1))
    g = g.at[:, 0:3, 3].set(t(n))         # t_num = o'.n - c0
    g = g.at[:, 9, 3].set(-c0)
    return g.reshape(c, 16, _MM_COLS)


def _group_candidates(o, d, tm, cluster_min, cluster_max, k: int):
    """Per-128-ray-group candidate chunks ordered by entry distance.

    Returns (ids (G, K) i32 with C as empty-slot sentinel,
    tns (G, K) f32 kept entry distances ascending (INF pad), usz (G,)
    i32 — true union size). Group entry distance = min over the
    group's rays of the per-ray slab entry tn, so every chunk the
    group does NOT test sits at a distance >= the relevant kept bound
    for EVERY ray in the group (the fallback bound in
    intersect_grouped)."""
    n = o.shape[0]
    c = cluster_min.shape[0]
    g_total = n // GROUP
    safe_d = jnp.where(jnp.abs(d) < 1e-12, jnp.float32(1e-12), d)
    inv = 1.0 / safe_d
    groups_per_chunk = math.gcd(g_total, 64)
    rc = groups_per_chunk * GROUP
    chunks = n // rc

    def per(args):
        oc, ic, tc = args
        t0 = (cluster_min[None] - oc[:, None]) * ic[:, None]
        t1 = (cluster_max[None] - oc[:, None]) * ic[:, None]
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        hit = (
            (tn <= tf) & (tf > 0.0)
            & (tn < tc[:, None]) & (tc[:, None] > 0.0)
        )
        key = jnp.where(hit, jnp.maximum(tn, 0.0), jnp.float32(_INF))
        return key.reshape(groups_per_chunk, GROUP, c).min(axis=1)

    tn_g = jax.lax.map(
        per,
        (
            o.reshape(chunks, rc, 3),
            inv.reshape(chunks, rc, 3),
            tm.reshape(chunks, rc),
        ),
    ).reshape(g_total, c)
    usz = jnp.sum((tn_g < _INF).astype(jnp.int32), axis=1)
    neg, idx = jax.lax.top_k(-tn_g, k)   # k smallest tn first
    valid = neg > jnp.float32(-_INF)
    ids = jnp.where(valid, idx.astype(jnp.int32), jnp.int32(c))
    tns = jnp.where(valid, -neg, jnp.float32(_INF))
    return ids, tns, usz


def _mm_chunk_test(gbuf, raw, bmat, dx, dy, dz, t_cur, c, rows, any_hit):
    """One (128-ray group, chunk) MXU Moller-Trumbore test + epilogue.

    gbuf: the chunk's (16, 4*TRI_CHUNK) coefficient block (VMEM value),
    raw: (16, GROUP) ray features, bmat: (16, GROUP) scratch ref.
    Returns (t_new, tri_new, u_new, v_new), each (1, GROUP). Shared by
    the grouped kernel and the wavefront kernel (ops/wavefront.py)."""
    inf = jnp.float32(_INF)
    # chunk center rides rows 10-12 of the coefficient block
    ccx = gbuf[10:11, 0:GROUP]
    ccy = gbuf[11:12, 0:GROUP]
    ccz = gbuf[12:13, 0:GROUP]
    bmat[:] = raw
    bmat[0:1, :] = raw[0:1, :] - ccx
    bmat[1:2, :] = raw[1:2, :] - ccy
    bmat[2:3, :] = raw[2:3, :] - ccz
    bmat[6:7, :] = raw[6:7, :] - (ccy * dz - ccz * dy)
    bmat[7:8, :] = raw[7:8, :] - (ccz * dx - ccx * dz)
    bmat[8:9, :] = raw[8:9, :] - (ccx * dy - ccy * dx)
    bmat[10:16, :] = jnp.zeros((6, GROUP), jnp.float32)
    res = jax.lax.dot_general(
        gbuf, bmat[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_MM_PRECISION,
    )  # (4*TRI_CHUNK, GROUP): [det | u_num | v_num | t_num] stacks
    det = res[0 * TRI_CHUNK : 1 * TRI_CHUNK, :]
    un = res[1 * TRI_CHUNK : 2 * TRI_CHUNK, :]
    vn = res[2 * TRI_CHUNK : 3 * TRI_CHUNK, :]
    tnm = res[3 * TRI_CHUNK : 4 * TRI_CHUNK, :]
    sg = jnp.where(det >= 0.0, 1.0, -1.0)
    adet = det * sg
    us = un * sg
    vs_ = vn * sg
    inv_det = 1.0 / jnp.where(adet > _EPS, det, 1.0)
    tt = tnm * inv_det
    valid = (
        (adet > _EPS)
        & (us >= 0.0)
        & (vs_ >= 0.0)
        & (us + vs_ <= adet)
        & (tt > _T_MIN)
        & (tt < t_cur)
    )
    if any_hit:
        blocked = jnp.any(valid, axis=0, keepdims=True)
        t_new = jnp.where(blocked, 0.0, inf)
        tri_new = jnp.where(blocked, c * TRI_CHUNK, -1)
        u_new = jnp.zeros((1, GROUP), jnp.float32)
        v_new = u_new
    else:
        tinf = jnp.where(valid, tt, inf)
        t_new = jnp.min(tinf, axis=0, keepdims=True)
        cand = valid & (tt == t_new)
        win = jnp.min(
            jnp.where(cand, rows, jnp.int32(TRI_CHUNK)),
            axis=0, keepdims=True,
        )
        onehot = cand & (rows == win)
        tri_new = jnp.where(
            t_new < inf, c * TRI_CHUNK + win, -1
        )
        u_new = jnp.sum(
            jnp.where(onehot, un * inv_det, 0.0),
            axis=0, keepdims=True,
        )
        v_new = jnp.sum(
            jnp.where(onehot, vn * inv_det, 0.0),
            axis=0, keepdims=True,
        )
    return t_new, tri_new, u_new, v_new


def _make_grouped_kernel(any_hit: bool, k: int):
    return functools.partial(_grouped_kernel_body, any_hit, k)


def _grouped_kernel_body(
    any_hit, k,
    cnt_ref, ids_ref, tnb_ref,   # SMEM prefetch: (G,), (G*K,), (G*K,)
    f_ref,                # VMEM (16, GROUP) ray features (this group)
    mm_hbm,               # ANY (C, 16, 4*TRI_CHUNK) coefficient blocks
    t_out, tri_out, u_out, v_out,   # VMEM (1, 8, GROUP), row 0 used
    bmat,                 # scratch VMEM (16, GROUP)
    buf2,                 # scratch VMEM (2, 16, 4*TRI_CHUNK)
    sems,                 # (2,) DMA semaphores
):
    g = pl.program_id(0)
    base = g * k
    kg = cnt_ref[g]
    inf = jnp.float32(_INF)
    raw = f_ref[:]
    dx = raw[3:4, :]
    dy = raw[4:5, :]
    dz = raw[5:6, :]
    t_cur = raw[10:11, :]
    rows = jax.lax.broadcasted_iota(jnp.int32, (TRI_CHUNK, GROUP), 0)

    def start_dma(j):
        slot = jax.lax.rem(j, 2)
        c = ids_ref[base + j]
        pltpu.make_async_copy(
            mm_hbm.at[c], buf2.at[slot], sems.at[slot]
        ).start()

    @pl.when(kg > 0)
    def _prime():
        start_dma(0)

    def cond(carry):
        j, t_acc, tri_acc, u_acc, v_acc = carry
        # Entries ascend in tn: once every lane's best is at or inside
        # the next entry distance, later chunks cannot improve it.
        # Compare as i32 bit patterns (monotonic for non-negative f32;
        # Mosaic has no scalar bitcast, so the scalar side stays i32).
        t_bits = jax.lax.bitcast_convert_type(t_acc, jnp.int32)
        return (j < kg) & jnp.any(
            t_bits > tnb_ref[base + jnp.minimum(j, k - 1)]
        )

    def body(carry):
        j, t_acc, tri_acc, u_acc, v_acc = carry
        slot = jax.lax.rem(j, 2)
        c = ids_ref[base + j]
        pltpu.make_async_copy(
            mm_hbm.at[c], buf2.at[slot], sems.at[slot]
        ).wait()

        @pl.when(j + 1 < kg)
        def _prefetch():
            start_dma(j + 1)

        t_new, tri_new, u_new, v_new = _mm_chunk_test(
            buf2[slot], raw, bmat, dx, dy, dz, t_cur, c, rows, any_hit
        )
        # lexicographic (t, tri) min — brute-force tie parity
        take = (t_new < t_acc) | (
            (t_new == t_acc) & (tri_new >= 0)
            & ((tri_new < tri_acc) | (tri_acc < 0))
        )
        return (
            j + 1,
            jnp.where(take, t_new, t_acc),
            jnp.where(take, tri_new, tri_acc),
            jnp.where(take, u_new, u_acc),
            jnp.where(take, v_new, v_acc),
        )

    init = (
        jnp.int32(0),
        jnp.full((1, GROUP), inf, jnp.float32),
        jnp.full((1, GROUP), -1, jnp.int32),
        jnp.zeros((1, GROUP), jnp.float32),
        jnp.zeros((1, GROUP), jnp.float32),
    )
    j_f, t_acc, tri_acc, u_acc, v_acc = jax.lax.while_loop(cond, body, init)

    # The early exit can leave body j_f-1's optimistic prefetch of
    # chunk j_f in flight; every started DMA must be waited before the
    # kernel returns or the device aborts.
    @pl.when(j_f < kg)
    def _drain():
        slot = jax.lax.rem(j_f, 2)
        pltpu.make_async_copy(
            mm_hbm.at[ids_ref[base + j_f]], buf2.at[slot], sems.at[slot]
        ).wait()

    t_out[0, 0:1, :] = t_acc
    tri_out[0, 0:1, :] = tri_acc
    u_out[0, 0:1, :] = u_acc
    v_out[0, 0:1, :] = v_acc


def ray_features(o, d, tm_p):
    """Ray feature matrix (16, N): rows [o(3), d(3), o x d(3), 1,
    t_max, 0 x 5] — one VMEM column block per 128-ray group."""
    n_pad = o.shape[0]
    w = jnp.cross(o, d)
    return jnp.concatenate(
        [
            o.T, d.T, w.T,
            jnp.ones((1, n_pad), jnp.float32),
            tm_p[None, :],
            jnp.zeros((5, n_pad), jnp.float32),
        ],
        axis=0,
    )


def mm_with_centers(geometry):
    """mm_table with the chunk centers riding rows 10-12 (broadcast) so
    kernels need no second lookup stream; the feature side zeroes those
    rows."""
    c = geometry.tri_packed.shape[0]
    cmin, cmax = geometry.cluster_min, geometry.cluster_max
    mm = mm_table(geometry, cmin, cmax)
    cc = 0.5 * (cmin + cmax)  # identical f32 arithmetic to mm_table
    return mm.at[:, 10:13, :].set(
        jnp.broadcast_to(cc[:, :, None], (c, 3, _MM_COLS))
    )


def grouped_pallas_call(
    o, d, tm_p, geometry, counts, ids_flat, tnb_flat,
    k: int, any_hit: bool, interpret: bool,
):
    """Dispatch the grouped MXU kernel over explicit per-group candidate
    lists. `o`/`d`/`tm_p` must already be GROUP-padded; `counts` (G,),
    `ids_flat` (G*k,) clamped chunk ids and `tnb_flat` (G*k,) ascending
    i32 entry-distance lower bounds (f32 bit patterns or the packed
    tn|id keys of ops/cull.py — both are monotone lower bounds, which is
    all the early-exit compare needs). Shared by intersect_grouped
    (union lists from _group_candidates) and the rank-iteration
    wavefront (per-ray top-K merged lists, ops/wavefront.py)."""
    n_pad = o.shape[0]
    g_total = n_pad // GROUP
    feat = ray_features(o, d, tm_p)
    mm = mm_with_centers(geometry)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(g_total,),
        in_specs=[
            pl.BlockSpec(
                (16, GROUP), lambda i, cnt_, ids_, tnb_: (0, i)
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            # Mosaic wants >=8-divisible sublane blocks: one (8, GROUP)
            # row-block per group, row 0 carries the result.
            pl.BlockSpec(
                (1, 8, GROUP), lambda i, cnt_, ids_, tnb_: (i, 0, 0)
            )
        ] * 4,
        scratch_shapes=[
            pltpu.VMEM((16, GROUP), jnp.float32),
            pltpu.VMEM((2, 16, _MM_COLS), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _make_grouped_kernel(any_hit, k),
        grid_spec=grid_spec,
        out_shape=[
            out_struct((g_total, 8, GROUP), jnp.float32, tm_p),
            out_struct((g_total, 8, GROUP), jnp.int32, tm_p),
            out_struct((g_total, 8, GROUP), jnp.float32, tm_p),
            out_struct((g_total, 8, GROUP), jnp.float32, tm_p),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(counts, ids_flat, tnb_flat, feat, mm)


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "any_hit", "k_cap", "with_stats"),
)
def intersect_grouped(
    o: jnp.ndarray,
    d: jnp.ndarray,
    geometry,
    t_max=None,
    interpret: bool = False,
    any_hit: bool = False,
    k_cap: int = 32,
    with_stats: bool = False,
) -> Hit:
    """Exact closest hit via the grouped MXU traversal (banner above).

    `k_cap` bounds each group's candidate list. The cap is safe:
    groups whose union overflowed re-run through intersect_matrix with
    t_max preset to their current best, which costs only that kernel's
    AABB sweep when nothing actually overflowed (and the lax.cond skips
    even that when no group overflows)."""
    n = o.shape[0]
    c = geometry.tri_packed.shape[0]
    k = min(k_cap, c)
    if t_max is None:
        tm = varying_like(o[:, 0], 0.0) + T_MAX
    else:
        tm = jnp.broadcast_to(t_max, (n,)).astype(jnp.float32)

    n_pad = -(-n // GROUP) * GROUP
    if n_pad != n:
        pad = n_pad - n
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        tm_p = jnp.pad(tm, (0, pad))
    else:
        tm_p = tm
    g_total = n_pad // GROUP

    cmin, cmax = geometry.cluster_min, geometry.cluster_max
    ids, tns, usz = _group_candidates(o, d, tm_p, cmin, cmax, k)
    counts = jnp.minimum(usz, k)
    ids_flat = jnp.minimum(ids.reshape(-1), c - 1)  # clamp sentinels
    tnb_flat = jax.lax.bitcast_convert_type(tns.reshape(-1), jnp.int32)

    t_b, tri_b, u_b, v_b = grouped_pallas_call(
        o, d, tm_p, geometry, counts, ids_flat, tnb_flat,
        k=k, any_hit=any_hit, interpret=interpret,
    )

    t_acc = t_b[:, 0, :]
    tri_fin = tri_b[:, 0, :].reshape(-1)
    u_fin = u_b[:, 0, :].reshape(-1)
    v_fin = v_b[:, 0, :].reshape(-1)
    found = t_acc < _INF
    tm_g = tm_p.reshape(g_total, GROUP)
    t_fin = jnp.where(found, t_acc, tm_g).reshape(-1)

    # Fallback for top_k-truncated unions: every untested chunk sits at
    # group entry distance >= the K-th kept one for EVERY ray of the
    # group, so only rays whose current best lies beyond that bound can
    # change. lax.cond skips the whole fallback kernel when no group
    # overflowed.
    bound = jnp.where(usz > k, tns[:, -1], jnp.float32(_INF))
    need = t_fin > jnp.repeat(bound, GROUP)
    t_lim = jnp.where(need, t_fin, 0.0)

    def run_fb(_):
        return intersect_matrix(
            o, d, geometry, t_max=t_lim,
            interpret=interpret, any_hit=any_hit,
        )

    def no_fb(_):
        return Hit(
            t=jnp.zeros_like(t_lim),
            tri=jnp.full((n_pad,), -1, jnp.int32),
            u=jnp.zeros_like(t_lim),
            v=jnp.zeros_like(t_lim),
        )

    fb = jax.lax.cond(jnp.any(need), run_fb, no_fb, 0)
    kern = Hit(t=t_fin, tri=tri_fin, u=u_fin, v=v_fin)
    if not any_hit:
        # Canonicalize BOTH merge candidates and break exact ties by
        # triangle id (ops/wavefront.py merge, round-2 advisor finding):
        # which engine resolved a ray depends on its GROUP's truncation
        # state, which under sharding depends on the device count; the
        # MXU kernel and the matrix fallback round t differently.
        # Re-evaluating the winners with the canonical XLA
        # Moller-Trumbore makes the reported bits a pure function of
        # (ray, winning triangle) again.
        from .intersect import canonical_hit

        kern = canonical_hit(
            o, d, geometry.tri_v0, geometry.tri_e1, geometry.tri_e2,
            kern,
        )
        fbc = canonical_hit(
            o, d, geometry.tri_v0, geometry.tri_e1, geometry.tri_e2, fb
        )
        fb = Hit(
            t=jnp.where(fb.tri >= 0, fbc.t, fb.t),
            tri=fb.tri, u=fbc.u, v=fbc.v,
        )
    closer = need & (fb.tri >= 0) & (
        (fb.t < kern.t)
        | ((fb.t == kern.t) & ((fb.tri < kern.tri) | (kern.tri < 0)))
    )
    hit = Hit(
        t=jnp.where(closer, fb.t, kern.t)[:n],
        tri=jnp.where(closer, fb.tri, kern.tri)[:n],
        u=jnp.where(closer, fb.u, kern.u)[:n],
        v=jnp.where(closer, fb.v, kern.v)[:n],
    )
    if with_stats:
        return hit, usz
    return hit


def occluded_grouped(o, d, t_far, geometry, interpret: bool = False):
    """Any-hit wrapper over intersect_grouped (shadow rays)."""
    hit = intersect_grouped(
        o, d, geometry, t_max=t_far, interpret=interpret, any_hit=True
    )
    return hit.tri >= 0

def _coherence_key(o, d, t_max, cluster_min, cluster_max):
    """Octant + origin-Morton-cell coherence key (compaction.sort_rays
    key), with dead rays (t_max<=0) keyed last."""
    from .morton import morton3d

    smin = jnp.min(cluster_min, axis=0)
    smax = jnp.max(
        jnp.where(cluster_max < 1e30, cluster_max, -jnp.inf), axis=0
    )
    octant = (
        (d[:, 0] >= 0).astype(jnp.uint32)
        | ((d[:, 1] >= 0).astype(jnp.uint32) << 1)
        | ((d[:, 2] >= 0).astype(jnp.uint32) << 2)
    )
    cell = morton3d(o, smin, smax) >> jnp.uint32(3)
    return (
        ((t_max <= 0).astype(jnp.uint32) << 31)
        | (octant << 27)
        | (cell & jnp.uint32((1 << 27) - 1))
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "interpret", "any_hit", "subs", "kernel", "wavefront_k",
        "wavefront_m", "sublanes", "mt_group", "pretest", "worklist",
        "visit_batch", "pipeline", "sort_key", "flat", "page",
    ),
)
def matrix_query(
    o, d, geometry, t_max=None,
    interpret: bool = False, any_hit: bool = False, subs: int = 1,
    kernel: str = "matrix",
    wavefront_k: int = 16, wavefront_m: int = 32,
    sublanes: int | None = None, mt_group: int | None = None,
    pretest: bool = True, worklist: bool = True,
    visit_batch: int = 1, pipeline: bool = True,
    sort_key: str = "morton", flat: bool = False,
    page: int = 1,
) -> Hit:
    """Coherence-sorted traversal with FUSED payload sorts.

    jnp.take row gathers measured ~6 ms for 64k x 7 columns on TPU
    (element-wise), while lax.sort carrying the payload costs ~1.5 ms —
    so both the sort-in and the unsort ride lax.sort directly and no
    gather ever happens. `kernel` picks the tile walker: "matrix" (the
    in-kernel selection loop), "grouped" (the static-grid MXU traversal
    — the sort is what makes its 128-ray groups tight), or "wavefront"
    (per-ray top-K candidates merged into per-group lists,
    ops/wavefront.py — the large-scene default).

    Defaults are the measured champion of the round-3/4 tile sweeps
    (tools/probe_tile.py on 1861 clusters / 131k sorted rays):
    worklist + software-pipelined visits, and 512-sublane ray tiles at
    frame batch sizes (107.7/61.5 ms closest/any-hit vs 127.5/69.3 for
    the round-3 branch-engine default)."""
    n = o.shape[0]
    if sublanes is None and worklist and pipeline and visit_batch == 1:
        # 65536-ray tiles only where they divide the batch (padding a
        # ragged tail to a 65536 tile can waste up to 2x); the tall
        # tile was measured only under the pipelined worklist engine.
        sublanes = 512 if n > 0 and n % (512 * LANES) == 0 else None
    if t_max is None:
        tm = varying_like(o[:, 0], 0.0) + T_MAX
    else:
        tm = jnp.broadcast_to(t_max, (n,)).astype(jnp.float32)
    if kernel == "wavefront":
        # the wavefront sorts internally by candidate signature (a much
        # tighter grouping than the origin-Morton key), so delegate the
        # whole query rather than double-sorting
        from .wavefront import intersect_wavefront

        return intersect_wavefront(
            o, d, geometry, t_max=tm, interpret=interpret,
            any_hit=any_hit, k_per_ray=wavefront_k, m_group=wavefront_m,
        )
    if sort_key == "signature":
        # Candidate-signature ordering: rays keyed by their two nearest
        # candidate-cluster ids plus a prefix of the third (the
        # wavefront's grouping key, ops/wavefront.py — measured tighter
        # than origin-Morton for merged-list occupancy). For the matrix
        # kernel the payoff is lockstep MT occupancy: lanes wanting the
        # same cluster clump into fewer mt_group slices per visit.
        # Costs one Pallas cull pass (~4.7 ms / 131k rays at 1861
        # clusters).
        from .cull import _ID_MASK as _CULL_ID_MASK
        from .cull import cull_topk

        pk, _ = cull_topk(
            o, d, tm, geometry.cluster_min, geometry.cluster_max, k=4,
            interpret=interpret,
        )
        id0 = pk[:, 0] & _CULL_ID_MASK
        id1 = pk[:, 1] & _CULL_ID_MASK
        id2 = pk[:, 2] & _CULL_ID_MASK
        # Dead / no-candidate rays: INF_KEY ids land at 0x1FFF, so they
        # key last, same as _coherence_key's dead-ray bit.
        key = (id0 << 18) | (id1 << 5) | (id2 >> 8)
    else:
        key = _coherence_key(
            o, d, tm, geometry.cluster_min, geometry.cluster_max
        )
    idx = jnp.arange(n, dtype=jnp.int32)
    (_, o0, o1, o2, d0, d1, d2, tm_s, idx_s) = jax.lax.sort(
        (key, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], tm, idx),
        num_keys=1,
    )
    o_s = jnp.stack([o0, o1, o2], axis=1)
    d_s = jnp.stack([d0, d1, d2], axis=1)
    if kernel == "grouped":
        hit = intersect_grouped(
            o_s, d_s, geometry, t_max=tm_s, interpret=interpret,
            any_hit=any_hit,
        )
    else:
        hit = intersect_matrix(
            o_s, d_s, geometry, t_max=tm_s, interpret=interpret,
            any_hit=any_hit, subs=subs, sublanes=sublanes,
            mt_group=mt_group, pretest=pretest, worklist=worklist,
            visit_batch=visit_batch, pipeline=pipeline, flat=flat,
            page=page,
        )
    (_, t_o, tri_o, u_o, v_o) = jax.lax.sort(
        (idx_s, hit.t, hit.tri, hit.u, hit.v), num_keys=1
    )
    return Hit(t=t_o, tri=tri_o, u=u_o, v=v_o)
