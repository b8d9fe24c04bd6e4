"""Rank-iteration wavefront traversal — the large-scene intersector.

The round-2 ledger (DESIGN.md) showed both Moller-Trumbore engines at
the same ~22 G pair-tests/s, so large-scene speed is decided by how few
(ray, chunk) pairs the grouping wastes. The matrix kernel pays for the
UNION of clusters any ray of an 8192-ray tile needs (~18x the required
pairs on diffuse bounce rays); intersect_grouped pays for the union of
each 128-ray group's full slab sweep (~82 chunks measured).

Here every ray gets its own top-K nearest candidate list from the
Pallas cull kernel (ops/cull.py), and each 128-ray group's work list is
the DEDUPLICATED MERGE of its members' lists, ordered by entry
distance. That list drives the existing grouped MXU kernel
(ops/traverse.grouped_pallas_call), whose per-entry early exit — stop
when every lane's best hit is at or inside the next entry's tn —
implements all the wavefront "rounds" inside one kernel launch with
zero per-round glue: the first few entries resolve most lanes, after
which the remaining entries never run. A group's merged list only
contains chunks some member actually ranks among its K nearest, so the
pair count approaches the per-ray requirement instead of the union of
everything every ray might ever touch.

Exactness: a lane is provably resolved iff its best-hit t is at or
inside BOTH (a) its own K-th kept entry distance (per-ray cull
truncation bound) and (b) the group's first dropped entry distance
(M-cap truncation bound). Unresolved lanes re-run through the exact
matrix kernel with t_max preset to their current best (lax.cond — free
when nothing overflowed). Winning hits are then re-evaluated with the
canonical XLA Moller-Trumbore (ops/intersect.canonical_hit) so the
reported t/u/v bits do not depend on WHICH engine found the hit — group
composition depends on the ray batch, so without this, a ray's low bits
could change with the device count (multi-chip bit-identity invariant,
tests/test_multichip.py).

Role parity: the hardware BVH build + trace_rays of the reference
(/root/reference/src/scene/loader/gpu_uploader.rs:774-967,
rt_renderer.rs:458-464), rebuilt as cull + counting-merge + MXU batches
because pointer-chasing traversals are gather-bound on TPU (0.45
Mrays/s, DESIGN.md ledger).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# _ID_MASK must match the producer of the packed keys this module
# unpacks: cull_topk packs ids at cull's width (13 bits), which can
# differ from traverse's matrix-key width.
from .cull import (
    CULL_MAX_CLUSTERS, INF_KEY, _ID_BITS, _ID_MASK, cull_topk,
)
from .intersect import Hit, T_MAX, canonical_hit, out_struct, varying_like
from .traverse import (
    GROUP,
    TRI_CHUNK,
    _INF,
    _MM_COLS,
    _mm_chunk_test,
    intersect_matrix,
    mm_with_centers,
    ray_features,
)

# Per-group merged-list capacity. Groups of coherent rays share most of
# their candidates, so the distinct count sits near the per-ray K; the
# cap only exists to bound the prefetch table (overflow falls back).
M_GROUP = 32


def _group_lists(pk, g_total, k: int, m: int):
    """Merge per-ray packed top-K lists into per-group work lists.

    pk: (G*GROUP, K) i32 packed keys ascending (INF_KEY padded).
    Returns (tnb (G, m) i32 packed (tn|id) keys ascending — the chunk
    id rides the low bits, so this IS the work list — INF_KEY padded;
    grp_bound (G,) i32 — the first DROPPED entry's key, INF_KEY if
    nothing was dropped).

    Two last-axis sorts, no scatter and no (G, GROUP*K, m) one-hot. The
    dedup sort key is (id major, tn minor) — the id bits swapped above
    the tn bits, `(id << (31 - _ID_BITS)) | (key >> _ID_BITS)`, which
    fits i32 because packed keys are positive 31-bit — so all
    occurrences of a chunk are adjacent, ordered by tn (equal shifted tn
    implies equal packed key, so the first occurrence IS the group-min
    key for that chunk). A neighbor compare keeps each id's first
    occurrence, and a second sort on the masked packed keys compacts
    the survivors to the front in entry-distance order.
    """
    pkg = pk.reshape(g_total, GROUP * k)
    dkey = ((pkg & _ID_MASK) << (31 - _ID_BITS)) | (
        jax.lax.shift_right_logical(pkg, _ID_BITS)
    )
    dkey, pk_s = jax.lax.sort((dkey, pkg), dimension=1, num_keys=1)
    sid = pk_s & _ID_MASK
    valid = pk_s != INF_KEY
    first = valid & jnp.concatenate(
        [jnp.ones((g_total, 1), bool), sid[:, 1:] != sid[:, :-1]], axis=1
    )
    masked = jnp.where(first, pk_s, jnp.int32(INF_KEY))
    pk_front = jax.lax.sort(masked, dimension=1)
    total = jnp.sum(first.astype(jnp.int32), axis=1)
    tnb = pk_front[:, :m]
    grp_bound = jnp.where(
        total > m, pk_front[:, m], jnp.int32(INF_KEY)
    )
    return tnb, grp_bound


def _make_wf_kernel(any_hit: bool, m: int, num_clusters: int):
    return functools.partial(_wf_kernel_body, any_hit, m, num_clusters)


def _wf_kernel_body(
    any_hit, m, num_clusters,
    pkl_ref,   # VMEM (m, LANES) i32 — packed (tn|id) list, entry j at [j, 0]
    want_ref,  # VMEM (m, LANES) i32 — want_ref[j, lane] != 0 iff entry j
               # is among lane's OWN per-ray candidates
    f_ref,     # VMEM (16, GROUP) ray features; row 11 carries the
               # bitcast of each lane's LAST own candidate key
    mm_hbm,    # ANY (C, 16, 4*TRI_CHUNK) coefficient blocks
    t_out, tri_out, u_out, v_out,   # VMEM (1, 8, GROUP), row 0 used
    stats_out,  # VMEM (1, 8, GROUP) i32: row 0 = walked entries,
                # row 1 = entries actually tested (want-mask hits)
    bmat,      # scratch VMEM (16, GROUP)
    buf2,      # scratch VMEM (2, 16, 4*TRI_CHUNK)
    sems,      # (2,) DMA semaphores
):
    """The grouped MXU walker over an explicit packed per-group list.

    Differs from _grouped_kernel_body in the list feed (merged (tn|id)
    keys as a VMEM block instead of SMEM scalar-prefetch tables, whose
    G*K*4-byte footprint OOMs SMEM at 1080p batch sizes) and in TWO
    per-lane liveness refinements that the merged lists make necessary:

    - exit bound: a lane keeps the walk alive only while the next entry
      key is at or inside its own LAST candidate key (feature row 11).
      Without it, one miss lane (t = INF) pins the whole group to walk
      every merged entry — measured as "visits = full list length" on
      bounce batches, where some lane always escapes to the sky.
    - per-entry skip: an entry runs only if some lane that actually
      RANKS it among its own candidates can still improve (want mask).
      Entries merged in from neighbors alone are skipped once their
      owners resolve; skipping is exact because a lane's own key for a
      wanted chunk is >= the entry's group-min key, so t <= entry key
      implies t <= that lane's slab entry distance.

    INF_KEY padding self-terminates the walk: no real t_acc bit pattern
    exceeds it, so the early-exit compare doubles as the count check."""
    inf = jnp.float32(_INF)
    inf_key = jnp.int32(INF_KEY)
    raw = f_ref[:]
    dx = raw[3:4, :]
    dy = raw[4:5, :]
    dz = raw[5:6, :]
    t_cur = raw[10:11, :]
    own_last = jax.lax.bitcast_convert_type(raw[11:12, :], jnp.int32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (TRI_CHUNK, GROUP), 0)

    def cid_at(j):
        return jnp.minimum(
            pkl_ref[j, 0] & jnp.int32(_ID_MASK),
            jnp.int32(num_clusters - 1),
        )

    # 4-slot DMA ring, 3 entries ahead, issued UNCONDITIONALLY for
    # every valid entry: a want-skipped entry does no vector work, so a
    # 2-deep just-in-time prefetch exposes the full copy latency on
    # every skip (the skip then saves nothing). Streaming the whole
    # list costs at most m * 32 KB of bandwidth per group — cheap next
    # to a single exposed-latency stall per entry.
    def start_dma(j):
        pltpu.make_async_copy(
            mm_hbm.at[cid_at(j)], buf2.at[jax.lax.rem(j, 4)],
            sems.at[jax.lax.rem(j, 4)],
        ).start()

    def valid_at(j):
        return pkl_ref[jnp.minimum(j, m - 1), 0] != inf_key

    for t in range(min(3, m)):
        @pl.when(valid_at(t))
        def _prime(t=t):
            start_dma(t)

    def cond(carry):
        j, t_acc, tri_acc, u_acc, v_acc = carry
        # Entries ascend in tn (packed keys are monotone lower bounds):
        # a lane keeps the walk alive only while it can still improve
        # (t beyond the next entry) AND the entry is at or inside its
        # own last candidate. INF_KEY padding exits here.
        t_bits = jax.lax.bitcast_convert_type(t_acc, jnp.int32)
        kj = pkl_ref[jnp.minimum(j, m - 1), 0]
        return (j < m) & jnp.any((t_bits > kj) & (own_last >= kj))

    def body(carry):
        j, t_acc, tri_acc, u_acc, v_acc = carry
        slot = jax.lax.rem(j, 4)
        c = cid_at(j)
        pltpu.make_async_copy(
            mm_hbm.at[c], buf2.at[slot], sems.at[slot]
        ).wait()

        @pl.when((j + 3 < m) & valid_at(j + 3))
        def _prefetch():
            start_dma(j + 3)

        t_bits = jax.lax.bitcast_convert_type(t_acc, jnp.int32)
        want = want_ref[pl.ds(j, 1), :]
        needed = jnp.any((want != 0) & (t_bits > pkl_ref[j, 0]))

        def do_test(_):
            t_new, tri_new, u_new, v_new = _mm_chunk_test(
                buf2[slot], raw, bmat, dx, dy, dz, t_cur, c, rows, any_hit
            )
            # lexicographic (t, tri) min — brute-force tie parity
            take = (t_new < t_acc) | (
                (t_new == t_acc) & (tri_new >= 0)
                & ((tri_new < tri_acc) | (tri_acc < 0))
            )
            return (
                jnp.where(take, t_new, t_acc),
                jnp.where(take, tri_new, tri_acc),
                jnp.where(take, u_new, u_acc),
                jnp.where(take, v_new, v_acc),
            )

        t_acc, tri_acc, u_acc, v_acc = jax.lax.cond(
            needed, do_test,
            lambda _: (t_acc, tri_acc, u_acc, v_acc), 0,
        )
        stats_out[0, 1:2, :] = (
            stats_out[0, 1:2, :] + needed.astype(jnp.int32)
        )
        return (j + 1, t_acc, tri_acc, u_acc, v_acc)

    init = (
        jnp.int32(0),
        jnp.full((1, GROUP), inf, jnp.float32),
        jnp.full((1, GROUP), -1, jnp.int32),
        jnp.zeros((1, GROUP), jnp.float32),
        jnp.zeros((1, GROUP), jnp.float32),
    )
    stats_out[:] = jnp.zeros((1, 8, GROUP), jnp.int32)
    j_f, t_acc, tri_acc, u_acc, v_acc = jax.lax.while_loop(cond, body, init)
    stats_out[0, 0:1, :] = jnp.full((1, GROUP), 1, jnp.int32) * j_f

    # The early exit leaves up to 3 look-ahead DMAs in flight (valid
    # entries j_f..j_f+2); every started DMA must be waited before the
    # kernel returns or the device aborts. Valid entries are a prefix
    # (keys ascend with INF padding), so the valid_at guard matches the
    # issued set exactly.
    for t in range(min(3, m)):
        @pl.when((j_f + t < m) & valid_at(j_f + t))
        def _drain(t=t):
            pltpu.make_async_copy(
                mm_hbm.at[cid_at(j_f + t)],
                buf2.at[jax.lax.rem(j_f + t, 4)],
                sems.at[jax.lax.rem(j_f + t, 4)],
            ).wait()

    t_out[0, 0:1, :] = t_acc
    tri_out[0, 0:1, :] = tri_acc
    u_out[0, 0:1, :] = u_acc
    v_out[0, 0:1, :] = v_acc


def _wf_pallas_call(o, d, tm_p, geometry, pkl, want, own_last, m: int,
                    any_hit: bool, interpret: bool):
    """Dispatch the wavefront walker. pkl/want: (G*m, LANES) i32 —
    entry j of group g at row [g*m + j] (key at lane 0; want flags per
    lane). own_last: (N,) i32 per-lane last own candidate key."""
    n_pad = o.shape[0]
    g_total = n_pad // GROUP
    feat = ray_features(o, d, tm_p)
    feat = feat.at[11, :].set(
        jax.lax.bitcast_convert_type(own_last, jnp.float32)
    )
    mm = mm_with_centers(geometry)
    c = geometry.tri_packed.shape[0]

    return pl.pallas_call(
        _make_wf_kernel(any_hit, m, c),
        grid=(g_total,),
        in_specs=[
            pl.BlockSpec((m, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, GROUP), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            # Mosaic wants >=8-divisible sublane blocks: one (8, GROUP)
            # row-block per group, row 0 carries the result.
            pl.BlockSpec((1, 8, GROUP), lambda i: (i, 0, 0))
        ] * 5,
        out_shape=[
            out_struct((g_total, 8, GROUP), jnp.float32, tm_p),
            out_struct((g_total, 8, GROUP), jnp.int32, tm_p),
            out_struct((g_total, 8, GROUP), jnp.float32, tm_p),
            out_struct((g_total, 8, GROUP), jnp.float32, tm_p),
            out_struct((g_total, 8, GROUP), jnp.int32, tm_p),
        ],
        scratch_shapes=[
            pltpu.VMEM((16, GROUP), jnp.float32),
            pltpu.VMEM((4, 16, _MM_COLS), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(pkl, want, feat, mm)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k_per_ray", "m_group", "any_hit", "interpret", "canonical",
        "with_stats", "fallback",
    ),
)
def intersect_wavefront(
    o: jnp.ndarray,
    d: jnp.ndarray,
    geometry,
    t_max=None,
    k_per_ray: int = 16,
    m_group: int = M_GROUP,
    any_hit: bool = False,
    interpret: bool = False,
    canonical: bool = True,
    with_stats: bool = False,
    fallback: bool = True,
) -> Hit:
    """Exact closest (or any) hit via the rank-iteration wavefront.

    Sorts the batch internally by candidate SIGNATURE — the top-3
    candidate chunk ids packed into one key — so a 128-ray group's
    merged list stays near the per-ray candidate count (origin-Morton
    ordering measured 31.6 merged entries/group on bounce batches vs
    ~4 per-ray candidates; signature ordering ~19 before the per-lane
    refinements). The per-ray lists ride the same lax.sort as payload
    columns, so the cull runs once, in the original order.
    """
    n = o.shape[0]
    c = geometry.tri_packed.shape[0]
    # c < _ID_MASK keeps a real id from aliasing INF_KEY's low bits in
    # the signature packing; past the cull's VMEM cap cull_topk merges
    # cluster chunks internally, so only the key width bounds c here.
    assert c < _ID_MASK and c <= CULL_MAX_CLUSTERS
    k = min(k_per_ray, c)
    # round the list capacity up to the VMEM sublane granularity
    m = -(-min(m_group, max(c, 1)) // 8) * 8
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

    pk, cnt = cull_topk(
        o, d, tm_p, geometry.cluster_min, geometry.cluster_max,
        k=k, interpret=interpret,
    )
    id0 = pk[:, 0] & _ID_MASK
    id1 = pk[:, min(1, k - 1)] & _ID_MASK
    id2 = pk[:, min(2, k - 1)] & _ID_MASK
    # 13-bit ids: id0 at bits 18-30, id1 at 5-17, id2's top 5 at 0-4 —
    # the full top-2 plus a prefix of the 3rd, never touching the sign
    skey = (id0 << 18) | (id1 << 5) | (id2 >> 8)
    lane = jnp.arange(n_pad, dtype=jnp.int32)
    # TWO-operand sort + ONE row take, NOT a (10+K)-operand payload
    # sort: XLA-TPU compile time explodes in variadic-sort operand
    # count (out/probe_logs/r4/sortwall.log — 26 operands at K=16 is
    # the round-3 "wavefront compile wall"; the Pallas walker itself is
    # m-bounded and compiles in seconds). num_keys=2 makes the order a
    # total one (lane breaks signature ties), so grouping is
    # deterministic. The row take costs ~2-4 ms at frame batch sizes
    # (DESIGN.md glue-primitive probes) — noise next to the minutes of
    # compile it buys back.
    _, lane_s = jax.lax.sort((skey, lane), num_keys=2)
    bc_f = functools.partial(jax.lax.bitcast_convert_type,
                             new_dtype=jnp.float32)
    payload = jnp.concatenate(
        [o, d, tm_p[:, None], bc_f(cnt)[:, None], bc_f(pk)], axis=1
    )  # (N, 8 + k); int columns ride as raw f32 bits (pure data move)
    pay_s = jnp.take(payload, lane_s, axis=0)
    o_s = pay_s[:, 0:3]
    d_s = pay_s[:, 3:6]
    tm_s = pay_s[:, 6]
    cnt_s = jax.lax.bitcast_convert_type(pay_s[:, 7], jnp.int32)
    pk_s = jax.lax.bitcast_convert_type(pay_s[:, 8:], jnp.int32)

    tnb, grp_bound = _group_lists(pk_s, g_total, k, m)
    pkl = jnp.pad(
        tnb.reshape(g_total * m, 1), ((0, 0), (0, 127)),
        constant_values=INF_KEY,
    )
    # want mask: entry j of group g is wanted by lane l iff the entry's
    # chunk id appears among that lane's own candidates
    eid = jnp.where(tnb != INF_KEY, tnb & _ID_MASK, -2)     # (G, m)
    cand = jnp.where(pk_s != INF_KEY, pk_s & _ID_MASK, -1)  # (N, k)
    cand = cand.reshape(g_total, GROUP, k)
    want = jnp.any(
        cand[:, :, :, None] == eid[:, None, None, :], axis=2
    )  # (G, GROUP, m)
    want_arr = (
        want.transpose(0, 2, 1)
        .reshape(g_total * m, GROUP)
        .astype(jnp.int32)
    )
    # per-lane last own candidate key (exit bound; -1 when no candidates)
    own_last = jnp.max(
        jnp.where(pk_s != INF_KEY, pk_s, -1), axis=1
    ).astype(jnp.int32)

    t_b, tri_b, u_b, v_b, _stats = _wf_pallas_call(
        o_s, d_s, tm_s, geometry, pkl, want_arr, own_last, m,
        any_hit=any_hit, interpret=interpret,
    )
    t_acc = t_b[:, 0, :]
    tri_fin = tri_b[:, 0, :].reshape(-1)
    u_fin = u_b[:, 0, :].reshape(-1)
    v_fin = v_b[:, 0, :].reshape(-1)
    found = t_acc < _INF
    tm_g = tm_s.reshape(g_total, GROUP)
    t_fin = jnp.where(found, t_acc, tm_g).reshape(-1)

    # Unresolved lanes, per-ray: best hit beyond the per-ray cull bound
    # (its own k-th kept entry) or beyond its own FIRST candidate that
    # the group M-cap dropped. Packed keys are tn lower bounds, so the
    # i32 compare is conservative — never misses an unresolved lane;
    # and lanes whose own candidates all survived the merge never fall
    # back, no matter how truncated the group list is.
    ray_bound = jnp.where(cnt_s > k, pk_s[:, k - 1], jnp.int32(INF_KEY))
    gb_lane = jnp.repeat(grp_bound, GROUP)
    own_dropped = jnp.min(
        jnp.where(pk_s >= gb_lane[:, None], pk_s, jnp.int32(INF_KEY)),
        axis=1,
    )
    bound = jnp.minimum(ray_bound, own_dropped)
    t_bits = jax.lax.bitcast_convert_type(
        jnp.maximum(t_fin, 0.0), jnp.int32
    )
    need = t_bits > bound
    t_lim = jnp.where(need, t_fin, 0.0)

    def run_fb(_):
        # matrix_query, NOT raw intersect_matrix: the batch is in
        # signature order here, which is incoherent for the matrix
        # kernel's tile unions (measured 112 ms vs ~15 once its own
        # morton sort re-clumps the few live lanes and sinks the
        # t_max=0 rays into tail tiles).
        from .traverse import matrix_query

        return matrix_query(
            o_s, d_s, geometry, t_max=t_lim,
            interpret=interpret, any_hit=any_hit,
        )

    def no_fb(_):
        return Hit(
            t=jnp.zeros_like(t_lim),
            tri=jnp.full((n_pad,), -1, jnp.int32),
            u=jnp.zeros_like(t_lim),
            v=jnp.zeros_like(t_lim),
        )

    # fallback=False drops the matrix_query branch from the program —
    # NOT exact (truncated lanes keep their conservative kernel result);
    # exists to bisect which sub-kernel owns the TPU compile wall
    # (DESIGN.md round-3 ledger) and for workloads that tolerate a
    # bounded miss rate on truncated candidate lists.
    fb = (
        jax.lax.cond(jnp.any(need), run_fb, no_fb, 0)
        if fallback else no_fb(0)
    )
    kern = Hit(t=t_fin, tri=tri_fin, u=u_fin, v=v_fin)
    if canonical and not any_hit:
        # Canonicalize BOTH candidates before merging and break exact
        # ties by triangle id: coincident geometry then resolves the
        # same way whether both triangles were tested by the kernel
        # (lexicographic (t, tri) take) or split across engines by a
        # composition-dependent truncation.
        kern = canonical_hit(
            o_s, d_s, geometry.tri_v0, geometry.tri_e1, geometry.tri_e2,
            kern,
        )
        fbc = canonical_hit(
            o_s, d_s, geometry.tri_v0, geometry.tri_e1, geometry.tri_e2,
            fb,
        )
        fb = Hit(
            t=jnp.where(fb.tri >= 0, fbc.t, fb.t),
            tri=fb.tri, u=fbc.u, v=fbc.v,
        )
    closer = need & (fb.tri >= 0) & (
        (fb.t < kern.t)
        | ((fb.t == kern.t)
           & ((fb.tri < kern.tri) | (kern.tri < 0)))
    )
    # undo the signature sort (fused unsort, same lax.sort trick)
    (_, t_o, tri_o, u_o, v_o) = jax.lax.sort(
        (
            lane_s,
            jnp.where(closer, fb.t, kern.t),
            jnp.where(closer, fb.tri, kern.tri),
            jnp.where(closer, fb.u, kern.u),
            jnp.where(closer, fb.v, kern.v),
        ),
        num_keys=1,
    )
    hit = Hit(t=t_o[:n], tri=tri_o[:n], u=u_o[:n], v=v_o[:n])
    if with_stats:
        return hit, jnp.sum((tnb != INF_KEY).astype(jnp.int32), axis=1)
    return hit


def occluded_wavefront(o, d, t_far, geometry, interpret: bool = False):
    """Any-hit wrapper (shadow rays)."""
    hit = intersect_wavefront(
        o, d, geometry, t_max=t_far, interpret=interpret, any_hit=True
    )
    return hit.tri >= 0
