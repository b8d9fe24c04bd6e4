"""Dense gather-MT intersector: per-ray candidates, XLA-only compute.

The round-3 lockstep law (DESIGN.md): every Pallas traversal engine on
this hardware runs ~22 G pair-tests/s but pays lockstep granularity —
the matrix kernel serves ~42 rays per cluster visit while each visit
costs ~12 us of scalar/branch/DMA fixed overhead (measured: 776
visits per 8192-ray tile, 127-145 ms per 131k closest-hit at 1861
clusters, tools/probe_tile.py). This module removes the lockstep
entirely by paying HBM bandwidth instead:

1. `cull_topk` (ops/cull.py, Pallas, ~5 ms/131k) emits each ray's K
   nearest candidate chunks in entry order plus its TOTAL candidate
   count (truncation detectable);
2. ONE linearized row gather (`jnp.take` over a (C, 9*128) table —
   multi-vector indexing is several times slower on TPU, DESIGN.md
   round-2) expands to (N, K, 9, 128) triangle data;
3. a fully vectorized Moller-Trumbore + packed-key min reduce
   ((t bits & ~mask) | slot, the matrix-kernel trick) finds each ray's
   closest hit over its K*128 candidate pairs — pure VPU work on dense
   arrays, no scalar loops, no DMA waits, no branches;
4. winners are re-evaluated with the canonical XLA Moller-Trumbore
   (ops/intersect.canonical_hit) so reported bits are a pure function
   of (ray, winning triangle) — sharding/batch independent;
5. rays whose candidate list truncated AND whose best hit lies beyond
   the K-th kept entry distance re-run through the exact matrix kernel
   with t_max preset (the wavefront's fallback contract,
   ops/wavefront.py) — a lax.cond skips the kernel when nobody
   overflowed.

Being XLA-only above the cull, the hot path fuses into full-frame jits
without the Mosaic composition wall that keeps the wavefront kernel
out of frames (DESIGN.md round-3 ledger).

Role parity: the hardware-BVH trace the reference gets from
vkCmdTraceRaysKHR (/root/reference/src/scene/loader/
gpu_uploader.rs:774-967) — candidate selection + dense intersection.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# the id mask must match the cull's packing (it produces the keys
# this module unpacks)
from .cull import CULL_MAX_CLUSTERS, INF_KEY, _ID_MASK, cull_topk
from .intersect import Hit, T_MAX, canonical_hit, varying_like

LANES = 128
TRI_CHUNK = 128
_EPS = 1.0e-7
_T_MIN = 1.0e-4
_INF = jnp.float32(3.0e38)

# Per-k gather block: the (N, 9, 128) expansion for one candidate rank
# is ~600 MB at 131k rays; iterating ranks with lax.scan keeps peak
# HBM residency at one rank's block while total traffic is unchanged.
# Past its VMEM cap the cull merges cluster chunks internally, so only
# the key width bounds the scene size here.
DENSE_MAX_CLUSTERS = CULL_MAX_CLUSTERS


def _unpack_tn(pk):
    """Entry-distance lower bound from a packed cull key (the
    sacrificed id bits round tn DOWN — conservative)."""
    return jax.lax.bitcast_convert_type(
        pk & jnp.int32(~_ID_MASK), jnp.float32
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "any_hit", "interpret", "fallback"),
)
def intersect_dense(
    o: jnp.ndarray,
    d: jnp.ndarray,
    geometry,
    t_max=None,
    k: int = 8,
    any_hit: bool = False,
    interpret: bool = False,
    fallback: bool = True,
) -> Hit:
    """Exact closest (or any) hit via dense per-ray candidate testing.

    K bounds the candidate chunks tested densely per ray; rays that
    need more fall through to the exact matrix kernel with a preset
    t_max (lax.cond-skipped when no ray overflows).
    """
    n = o.shape[0]
    g = geometry
    c = g.tri_packed.shape[0]
    assert c <= DENSE_MAX_CLUSTERS, "13-bit cluster-id key width"
    if t_max is None:
        tm = varying_like(o[:, 0], 0.0) + T_MAX
    else:
        tm = jnp.broadcast_to(t_max, (n,)).astype(jnp.float32)

    pk, cnt = cull_topk(
        o, d, tm, g.cluster_min, g.cluster_max, k=k, interpret=interpret
    )
    valid = pk != jnp.int32(INF_KEY)
    ids = jnp.where(valid, pk & jnp.int32(_ID_MASK), 0)

    # Geometry rows 0..8 of the packed tri table: v0.xyz|e1.xyz|e2.xyz
    # (scene/gpu layout, same rows the matrix kernel reads from SMEM).
    tri9 = g.tri_packed[:, :9, :].reshape(c, 9 * LANES)

    ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]
    dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]

    slot_bits = max((k * TRI_CHUNK - 1).bit_length(), 1)
    slot_mask = (1 << slot_bits) - 1
    lane_slot = jnp.arange(TRI_CHUNK, dtype=jnp.int32)[None, :]

    def rank_body(best, kk):
        """Test candidate rank kk for every ray; fold the packed-key
        min into the carry. One (N, 9*128) gather per rank."""
        ids_k = jax.lax.dynamic_index_in_dim(
            ids, kk, axis=1, keepdims=False
        )
        val_k = jax.lax.dynamic_index_in_dim(
            valid, kk, axis=1, keepdims=False
        )
        rows = jnp.take(tri9, ids_k, axis=0).reshape(n, 9, LANES)
        v0x, v0y, v0z = rows[:, 0], rows[:, 1], rows[:, 2]
        e1x, e1y, e1z = rows[:, 3], rows[:, 4], rows[:, 5]
        e2x, e2y, e2z = rows[:, 6], rows[:, 7], rows[:, 8]

        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = px * e1x + py * e1y + pz * e1z
        inv_det = jnp.where(jnp.abs(det) > _EPS, 1.0 / det, 0.0)
        tx = ox - v0x
        ty = oy - v0y
        tz = oz - v0z
        u = (tx * px + ty * py + tz * pz) * inv_det
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv_det
        tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det

        ok = (
            val_k[:, None]
            & (jnp.abs(det) > _EPS)
            & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (tt > _T_MIN) & (tt < tm[:, None])
        )
        # Packed (t | slot) key: low bits sacrificed to the slot index
        # round t DOWN; the canonical re-eval below restores exact t.
        bits = jax.lax.bitcast_convert_type(
            jnp.maximum(tt, 0.0), jnp.int32
        )
        slot = jnp.int32(kk * TRI_CHUNK) + lane_slot
        key = (bits & jnp.int32(~slot_mask)) | slot
        key = jnp.where(ok, key, jnp.int32(INF_KEY))
        return jnp.minimum(best, jnp.min(key, axis=1)), None

    best0 = jnp.full((n,), INF_KEY, jnp.int32)
    best, _ = jax.lax.scan(
        rank_body, best0, jnp.arange(k, dtype=jnp.int32)
    )

    found = best != jnp.int32(INF_KEY)
    slot = best & jnp.int32(slot_mask)
    win_k = slot // TRI_CHUNK
    tri = jnp.where(
        found,
        jnp.take_along_axis(ids, win_k[:, None], axis=1)[:, 0]
        * TRI_CHUNK + (slot % TRI_CHUNK),
        -1,
    )
    kern = canonical_hit(
        o, d, g.tri_v0, g.tri_e1, g.tri_e2,
        Hit(t=tm, tri=tri, u=jnp.zeros_like(tm), v=jnp.zeros_like(tm)),
    )

    if not fallback:
        return kern

    # Truncated-list fallback (wavefront contract): every untested
    # chunk lies at entry distance >= the K-th kept one, so only rays
    # whose best t is beyond that (conservative) bound can change.
    bound = jnp.where(cnt > k, _unpack_tn(pk[:, k - 1]), _INF)
    need = kern.t > bound
    t_lim = jnp.where(need, kern.t, 0.0)

    def run_fb(_):
        from .traverse import intersect_matrix

        fb = intersect_matrix(
            o, d, geometry, t_max=t_lim, interpret=interpret,
            any_hit=any_hit,
        )
        fbc = canonical_hit(
            o, d, g.tri_v0, g.tri_e1, g.tri_e2, fb
        )
        return Hit(
            t=jnp.where(fb.tri >= 0, fbc.t, fb.t),
            tri=fb.tri, u=fbc.u, v=fbc.v,
        )

    def no_fb(_):
        return Hit(
            t=jnp.zeros_like(t_lim),
            tri=jnp.full((n,), -1, jnp.int32),
            u=jnp.zeros_like(t_lim),
            v=jnp.zeros_like(t_lim),
        )

    fb = jax.lax.cond(jnp.any(need), run_fb, no_fb, 0)
    closer = need & (fb.tri >= 0) & (
        (fb.t < kern.t)
        | ((fb.t == kern.t) & ((fb.tri < kern.tri) | (kern.tri < 0)))
    )
    return Hit(
        t=jnp.where(closer, fb.t, kern.t),
        tri=jnp.where(closer, fb.tri, kern.tri),
        u=jnp.where(closer, fb.u, kern.u),
        v=jnp.where(closer, fb.v, kern.v),
    )


def occluded_dense(o, d, t_far, geometry, k: int = 8,
                   interpret: bool = False):
    """Any-hit shadow query over the dense path."""
    hit = intersect_dense(
        o, d, geometry, t_max=t_far, k=k, any_hit=True,
        interpret=interpret,
    )
    return hit.tri >= 0
