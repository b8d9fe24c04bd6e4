"""Cluster-streaming intersector for large scenes.

The TPU-native replacement for per-ray BVH traversal (SURVEY.md
section 7 hard-part #1: per-lane tree walks don't map to a 8x128-lane
machine). Triangles are Morton-ordered at upload so every TRI_PAD chunk
is a spatially coherent *cluster* with a tight AABB. Visibility is then
two dense phases:

1. **Cull** (jnp): every ray of a 1024-ray block is slab-tested against
   every cluster AABB; a block-level OR yields the block's candidate
   cluster list (N x C elementwise VPU work, no gathers).
2. **Stream** (Pallas): grid = (ray_blocks, k_max). The candidate ids are
   scalar-prefetch arguments, so each grid step's BlockSpec index_map
   *is* the indirection: Pallas pipelines the DMA of cluster geometry
   blocks from HBM into VMEM while the previous cluster's 128-triangle
   Moller-Trumbore loop runs on the VPU. Steps beyond the candidate
   count repeat the previous block index (Pallas skips the re-fetch) and
   are predicated off.

Block coherence governs efficiency: primary rays are coherent by
construction; bounce rays rely on the wavefront sorter
(ops/compaction.py) to restore locality.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import Hit, T_MAX, varying_like

LANES = 128
BLOCK_SUBLANES = 8
RAY_BLOCK = BLOCK_SUBLANES * LANES  # 1024 rays per culling/stream block
TRI_CHUNK = 128                     # == scene/gpu TRI_PAD (cluster size)
_EPS = 1.0e-7
_T_MIN = 1.0e-4


class CullResult(NamedTuple):
    ids: jnp.ndarray      # (nb, k_max) i32 — candidate clusters, clamp-filled
    counts: jnp.ndarray   # (nb,) i32
    overflow: jnp.ndarray  # () f32 — fraction of blocks whose list clipped


def cull_clusters(
    o, d, t_max, cluster_min, cluster_max, k_max: int
) -> CullResult:
    """Per-block candidate cluster lists. o, d: (N, 3) with N a multiple
    of RAY_BLOCK; t_max: (N,)."""
    n = o.shape[0]
    nb = n // RAY_BLOCK
    c = cluster_min.shape[0]
    safe_d = jnp.where(jnp.abs(d) < 1e-12, jnp.float32(1e-12), d)
    inv_d = 1.0 / safe_d

    o_b = o.reshape(nb, RAY_BLOCK, 3)
    inv_b = inv_d.reshape(nb, RAY_BLOCK, 3)
    tm_b = t_max.reshape(nb, RAY_BLOCK)

    def per_block(args):
        ob, invb, tmb = args
        t0 = (cluster_min[None, :, :] - ob[:, None, :]) * invb[:, None, :]
        t1 = (cluster_max[None, :, :] - ob[:, None, :]) * invb[:, None, :]
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)  # (R, C)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        hit = (tn <= tf) & (tf > 0.0) & (tn < tmb[:, None])
        m = jnp.any(hit, axis=0)  # (C,)
        count = jnp.sum(m.astype(jnp.int32))
        # Selected clusters first, preserving Morton order.
        ids = jnp.argsort(~m, stable=True).astype(jnp.int32)[:k_max]
        # Clamp-fill the tail with the last valid id so consecutive grid
        # steps see an unchanged block index (no wasted DMA).
        fill = ids[jnp.maximum(jnp.minimum(count, k_max) - 1, 0)]
        pos = jnp.arange(k_max, dtype=jnp.int32)
        ids = jnp.where(pos < count, ids, fill)
        return ids, count

    ids, counts = jax.lax.map(per_block, (o_b, inv_b, tm_b))
    overflow = jnp.mean((counts > k_max).astype(jnp.float32))
    return CullResult(
        ids=ids, counts=jnp.minimum(counts, k_max), overflow=overflow
    )


def _stream_kernel(
    ids_ref,      # SMEM (nb, k_max) i32 (scalar prefetch)
    counts_ref,   # SMEM (nb,) i32 (scalar prefetch)
    ox, oy, oz, dx, dy, dz, tmax,   # VMEM (BLOCK_SUBLANES, LANES)
    tri_ref,      # VMEM (1, TRI_CHUNK, 12) — current cluster block
    t_out, tri_out, u_out, v_out,
):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        t_out[:] = tmax[:]
        tri_out[:] = jnp.full(t_out.shape, -1, jnp.int32)
        u_out[:] = jnp.zeros(t_out.shape, jnp.float32)
        v_out[:] = jnp.zeros(t_out.shape, jnp.float32)

    @pl.when(j < counts_ref[i])
    def _process():
        cid = ids_ref[i, j]
        base = cid * TRI_CHUNK
        rox, roy, roz = ox[:], oy[:], oz[:]
        rdx, rdy, rdz = dx[:], dy[:], dz[:]

        def body(t, _):
            av0x = tri_ref[0, t, 0]
            av0y = tri_ref[0, t, 1]
            av0z = tri_ref[0, t, 2]
            ae1x = tri_ref[0, t, 3]
            ae1y = tri_ref[0, t, 4]
            ae1z = tri_ref[0, t, 5]
            ae2x = tri_ref[0, t, 6]
            ae2y = tri_ref[0, t, 7]
            ae2z = tri_ref[0, t, 8]

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
                (jnp.abs(det) > _EPS)
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

        jax.lax.fori_loop(0, TRI_CHUNK, body, 0)


@functools.partial(jax.jit, static_argnames=("k_max", "interpret"))
def intersect_clustered(
    o: jnp.ndarray,
    d: jnp.ndarray,
    geometry,
    t_max=None,
    k_max: int = 64,
    interpret: bool = False,
) -> tuple[Hit, jnp.ndarray]:
    """Closest hit through cull + stream. Returns (Hit, overflow_frac).

    overflow_frac > 0 means some block's candidate list was clipped at
    k_max and hits may be missed — raise k_max (it is a static arg)."""
    n = o.shape[0]
    n_pad = -(-n // RAY_BLOCK) * RAY_BLOCK

    if t_max is None:
        tm = varying_like(o[:, 0], 0.0) + T_MAX
    else:
        tm = jnp.broadcast_to(t_max, (n,)).astype(jnp.float32)
    if n_pad != n:
        o = jnp.pad(o, ((0, n_pad - n), (0, 0)))
        d = jnp.pad(d, ((0, n_pad - n), (0, 0)), constant_values=1.0)
        tm = jnp.pad(tm, (0, n_pad - n))

    cull = cull_clusters(
        o, d, tm, geometry.cluster_min, geometry.cluster_max, k_max
    )
    nb = n_pad // RAY_BLOCK

    def comp(a, i):
        return a[:, i].reshape(n_pad // LANES, LANES)

    rays = [comp(o, 0), comp(o, 1), comp(o, 2),
            comp(d, 0), comp(d, 1), comp(d, 2),
            tm.reshape(n_pad // LANES, LANES)]

    ray_spec = pl.BlockSpec(
        (BLOCK_SUBLANES, LANES),
        lambda i, j, ids, counts: (i, 0),
        memory_space=pltpu.VMEM,
    )
    tri_spec = pl.BlockSpec(
        (1, TRI_CHUNK, 12),
        lambda i, j, ids, counts: (ids[i, j], 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (BLOCK_SUBLANES, LANES),
        lambda i, j, ids, counts: (i, 0),
        memory_space=pltpu.VMEM,
    )
    shape2 = (n_pad // LANES, LANES)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb, k_max),
        in_specs=[ray_spec] * 7 + [tri_spec],
        out_specs=[out_spec] * 4,
    )
    t_best, tri_best, u_best, v_best = pl.pallas_call(
        _stream_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(shape2, jnp.float32),
            jax.ShapeDtypeStruct(shape2, jnp.int32),
            jax.ShapeDtypeStruct(shape2, jnp.float32),
            jax.ShapeDtypeStruct(shape2, jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(cull.ids, cull.counts, *rays, geometry.tri_packed)

    hit = Hit(
        t=t_best.reshape(-1)[:n],
        tri=tri_best.reshape(-1)[:n],
        u=u_best.reshape(-1)[:n],
        v=v_best.reshape(-1)[:n],
    )
    return hit, cull.overflow
