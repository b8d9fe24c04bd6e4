"""Per-ray ordered top-K cluster cull — the wavefront's candidate pass.

Replaces `cull_ordered`'s `lax.top_k` over the (rays, clusters) slab
matrix (measured 20.8 ms at 131k x 447 — VERDICT round-2 item 2; XLA's
iterative min+mask alternative measured 16.9 ms) with one Pallas kernel
that never materializes the matrix in HBM: per 1024-ray tile the slab
keys live in VMEM scratch and K min+invalidate passes extract the K
nearest candidates, skipping passes once every lane is exhausted (most
rays have ~7 candidates, so the effective pass count tracks the mean,
not K).

Keys are packed `(tn bits & ~_ID_MASK) | cluster_id` (positive-f32 bit
ordering is monotonic as i32, the matrix-kernel trick): one i32 min
finds the nearest candidate AND its id, ties break to the smaller id,
and the sacrificed mantissa bits round tn DOWN — conservative for
every consumer (ordering is efficiency-only; the unresolved-lane bound
compares hit-t bits against a lower bound of the true entry distance).

Beyond CULL_VMEM_CLUSTER_CAP clusters the keys scratch no longer fits
VMEM; `cull_topk` then runs the kernel per cluster CHUNK and merges
the per-chunk ascending top-K lists with one small row sort — exact,
because a candidate outside its own chunk's top-K is farther than K
same-chunk candidates and so can never enter the global top-K.

Role parity: the selection half of the hardware BVH traversal the
reference gets from trace_rays (/root/reference/src/scene/loader/
gpu_uploader.rs:774-967).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import out_struct

LANES = 128
CULL_SUBLANES = 8
CULL_BLOCK = CULL_SUBLANES * LANES
INF_KEY = 0x7FFFFFFF  # no-candidate sentinel (> any packed real key)
# 13 id bits = 8192 clusters (~1M triangle slots), matching the matrix
# kernel's key width (ops/traverse._ID_BITS). The sacrificed mantissa
# bits round each tn DOWN — still conservative for every consumer (the
# unresolved-lane bound compares hit-t bits against a LOWER bound of
# the true entry distance; ordering is efficiency-only).
_ID_BITS = 13
_ID_MASK = (1 << _ID_BITS) - 1
CULL_MAX_CLUSTERS = 1 << _ID_BITS
# The fill processes chunk rows in blocks of this many (bounds the
# (CB, 8, LANES) vector temporaries at ~2 MB each).
CULL_FILL_BLOCK = 512
# keys scratch is (C_pad * CULL_SUBLANES, LANES) i32; cap it at 10 MB of
# the 16 MB scoped-VMEM budget (the compact lane-packed AABB input and
# the blocked fill temporaries take the rest).
CULL_VMEM_CLUSTER_CAP = (10 * 2**20) // (CULL_SUBLANES * LANES * 4)


def _make_cull_kernel(num_blocks: int, cb: int, k: int):
    return functools.partial(_cull_kernel_body, num_blocks, cb, k)


def _cull_kernel_body(
    num_blocks, cb, k,
    # VMEM (C_pad, LANES): per-chunk AABB packed in lanes 0..5 as
    # [min.x min.y min.z max.x max.y max.z]; NaN rows pad to the fill
    # block size (NaN compares false -> no candidate). The fill
    # lane-broadcasts each component and evaluates a whole block of
    # chunk rows as one vector expression — a per-row fori with 6
    # scalar VMEM reads measured ~10 ms of pure scalar-loop overhead at
    # 131k x 447, and fully pre-broadcast (C, LANES) planes blow the
    # VMEM budget past ~900 clusters.
    aabb_ref,
    ox, oy, oz, dx, dy, dz, tmax,   # VMEM (CULL_SUBLANES, LANES)
    pk_out,                         # VMEM (k*CULL_SUBLANES, LANES) i32
    cnt_out,                        # VMEM (CULL_SUBLANES, LANES) i32
    keys,                           # scratch VMEM (C_pad*CULL_SUBLANES, LANES)
):
    bs = CULL_SUBLANES
    c_pad = num_blocks * cb
    inf = jnp.int32(INF_KEY)
    rox, roy, roz = ox[:][None], oy[:][None], oz[:][None]
    big = jnp.float32(1e12)
    invx = jnp.where(jnp.abs(dx[:]) < 1e-12, big, 1.0 / dx[:])[None]
    invy = jnp.where(jnp.abs(dy[:]) < 1e-12, big, 1.0 / dy[:])[None]
    invz = jnp.where(jnp.abs(dz[:]) < 1e-12, big, 1.0 / dz[:])[None]
    tm = tmax[:][None]

    def fill_block(b, cnt):
        base = b * cb
        blk = aabb_ref[pl.ds(base, cb), :]

        def comp(i):  # lane i -> (CB, 1, LANES) broadcast
            return jnp.broadcast_to(
                blk[:, i : i + 1], (cb, LANES)
            )[:, None, :]

        t0x = (comp(0) - rox) * invx
        t1x = (comp(3) - rox) * invx
        t0y = (comp(1) - roy) * invy
        t1y = (comp(4) - roy) * invy
        t0z = (comp(2) - roz) * invz
        t1z = (comp(5) - roz) * invz
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.minimum(t0z, t1z),
        )
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z),
        )
        hit = (tn <= tf) & (tf > 0.0) & (tn < tm) & (tm > 0.0)
        bits = jax.lax.bitcast_convert_type(
            jnp.maximum(tn, 0.0), jnp.int32
        )
        cid = base + jax.lax.broadcasted_iota(
            jnp.int32, (cb, bs, LANES), 0
        )
        key3 = jnp.where(hit, (bits & jnp.int32(~_ID_MASK)) | cid, inf)
        keys[pl.ds(base * bs, cb * bs), :] = key3.reshape(cb * bs, LANES)
        return cnt + jnp.sum(hit.astype(jnp.int32), axis=0)

    cnt_out[:] = jax.lax.fori_loop(
        0, num_blocks, fill_block, jnp.zeros((bs, LANES), jnp.int32)
    )
    c = c_pad  # extraction sweeps the padded rows (all INF)

    def fold_min(prev):
        # Min over the C key rows, invalidating the previous extraction
        # in the same pass (prev == INF_KEY on the first pass is a no-op
        # compare: no real key equals the sentinel). Whole-matrix ops,
        # NOT a per-row fori_loop: the scalar loop overhead of 2*C
        # dynamic-sliced iterations per pass measured ~3x the vector
        # work itself (16.5 ms -> the fill loop now dominates).
        kk3 = keys[:].reshape(c, bs, LANES)
        inv3 = jnp.where(kk3 == prev[None], inf, kk3)
        keys[:] = inv3.reshape(c * bs, LANES)
        return jnp.min(inv3, axis=0)

    pk_out[:] = jnp.full((k * bs, LANES), INF_KEY, jnp.int32)

    def pass_body(carry):
        kk, prev = carry
        m = fold_min(prev)
        pk_out[pl.ds(kk * bs, bs), :] = m
        return kk + 1, m

    def pass_cond(carry):
        kk, prev = carry
        # stop once every lane is exhausted: the pass count then tracks
        # the per-tile max candidate count, not K
        return (kk < k) & ((kk == 0) | jnp.any(prev < inf))

    jax.lax.while_loop(
        pass_cond, pass_body,
        (jnp.int32(0), jnp.full((bs, LANES), INF_KEY, jnp.int32)),
    )


@functools.partial(jax.jit, static_argnames=("k", "interpret", "chunk"))
def cull_topk(o, d, t_max, cluster_min, cluster_max,
              k: int = 16, interpret: bool = False,
              chunk: int | None = None):
    """Per-ray K nearest candidate clusters, packed-key form.

    Returns (pk (N, K) i32 packed keys ascending, INF_KEY-padded;
    count (N,) i32 — the ray's TOTAL candidate count, so count > K
    means the list was truncated). `unpack`: id = pk & _ID_MASK, tn
    lower bound = bitcast(pk & ~_ID_MASK). Result is independent of
    tiling (pure per-ray computation; ties break to the smaller id).

    `chunk` (static, default CULL_VMEM_CLUSTER_CAP) bounds the cluster
    rows per kernel call; larger scenes run one call per chunk and the
    ascending lists merge in a (N, K*chunks) row sort. Exposed so tests
    can force the merge path on small scenes.
    """
    c = cluster_min.shape[0]
    assert c <= CULL_MAX_CLUSTERS, "cluster id exceeds the key width"
    chunk = min(
        CULL_VMEM_CLUSTER_CAP if chunk is None else chunk,
        CULL_VMEM_CLUSTER_CAP,
    )
    if c <= chunk:
        return _cull_single(o, d, t_max, cluster_min, cluster_max,
                            k, interpret)
    pks, cnt = [], None
    for lo in range(0, c, chunk):
        pk_i, cnt_i = _cull_single(
            o, d, t_max,
            cluster_min[lo : lo + chunk], cluster_max[lo : lo + chunk],
            k, interpret,
        )
        # re-offset the chunk-local ids; id bits never carry into the
        # tn bits (global id < CULL_MAX_CLUSTERS = the mask width)
        pks.append(jnp.where(pk_i == INF_KEY, INF_KEY, pk_i + lo))
        cnt = cnt_i if cnt is None else cnt + cnt_i
    pk = jnp.sort(jnp.concatenate(pks, axis=1), axis=1)[:, :k]
    return pk, cnt


def _cull_single(o, d, t_max, cluster_min, cluster_max, k, interpret):
    n = o.shape[0]
    c = cluster_min.shape[0]
    n_pad = -(-n // CULL_BLOCK) * CULL_BLOCK
    if n_pad != n:
        pad = n_pad - n
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        t_max = jnp.pad(t_max, (0, pad))
    nb = n_pad // CULL_BLOCK
    shape2 = (n_pad // LANES, LANES)

    def comp(a):
        return a.reshape(shape2)

    # lane-packed AABB table (C_pad, LANES): lanes 0..5 hold
    # [min.xyz | max.xyz], NaN rows pad to the fill block size
    cb = min(CULL_FILL_BLOCK, c + (-c) % 8)
    n_blocks = -(-c // cb)
    c_pad = n_blocks * cb
    aabb = jnp.full((c_pad, LANES), jnp.nan, jnp.float32)
    aabb = aabb.at[:c, 0:3].set(cluster_min)
    aabb = aabb.at[:c, 3:6].set(cluster_max)
    aabb_spec = pl.BlockSpec(
        (c_pad, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    ray_spec = pl.BlockSpec(
        (CULL_SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    pk_spec = pl.BlockSpec(
        (k * CULL_SUBLANES, LANES), lambda i: (i, 0),
        memory_space=pltpu.VMEM,
    )
    pk_b, cnt_b = pl.pallas_call(
        _make_cull_kernel(n_blocks, cb, k),
        grid=(nb,),
        in_specs=[aabb_spec] + [ray_spec] * 7,
        out_specs=[pk_spec, ray_spec],
        out_shape=[
            out_struct((nb * k * CULL_SUBLANES, LANES), jnp.int32, comp(t_max)),
            out_struct(shape2, jnp.int32, comp(t_max)),
        ],
        scratch_shapes=[
            pltpu.VMEM((c_pad * CULL_SUBLANES, LANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # The keys scratch (8 MB at the 2560-cluster cap) plus the
            # blocked fill temporaries brush past the 16 MB scoped-VMEM
            # default when composed into larger jits (measured: 16.91 MB
            # inside intersect_dense at 1861 clusters); v5e has 128 MB.
            vmem_limit_bytes=48 * 2**20,
        ),
        interpret=interpret,
    )(
        aabb,
        comp(o[:, 0]), comp(o[:, 1]), comp(o[:, 2]),
        comp(d[:, 0]), comp(d[:, 1]), comp(d[:, 2]),
        comp(t_max),
    )
    # plane layout -> (N, K): tile b, plane kk = rows [b*K*8+kk*8, ..+8)
    pk = (
        pk_b.reshape(nb, k, CULL_SUBLANES, LANES)
        .transpose(0, 2, 3, 1)
        .reshape(n_pad, k)[:n]
    )
    return pk, cnt_b.reshape(-1)[:n]
