"""Exact tile-segment rasterization (the Pallas binned raster path).

The capped candidate tables in ops/raster.rasterize_tiled DROP geometry
on real meshes: at the atrium_big bench camera (1080p, tile=64) the
per-tile candidate distribution is extremely skewed (p50=8, p99=2662,
max 5130) so 102/510 tiles overflow k_max=256, and 2123 triangles
larger than 2x2 tiles swamp the 256-slot shared large list. A dense
(tiles, k_max) table must size k_max at p100 and pays it for EVERY
tile.

Here binning is exact and per-tile work is proportional to the tile's
REAL candidate count:

1. one global sort of fused (cell << 20 | triangle id) keys builds
   variable-length per-tile candidate segments, id-ordered within a
   tile (small triangles are 4-way replicated, mid-size ones — up to
   8x8 tiles — replicate a selected subset 64 ways with coverage
   masks, and huge ones enumerate (tile, candidate) overlap pairs, so
   NO per-tile cap exists anywhere);
2. per-candidate data is packed once into a (16, N) table in segment
   order (one row take — TPU row gathers cost ~25 ns/row regardless
   of width, so ONE take of 16-wide rows beats 14 column takes);
3. a Pallas kernel walks each tile's segment in 128-candidate chunks
   (HBM->SMEM DMA, scalar reads from SMEM — the ops/traverse.py
   idiom), depth-testing each candidate against the tile's
   (tile*tile/128, 128) pixel block with the exact edge/interpolation
   formulas of ops/raster.rasterize, so the result is bit-equal to
   the full O(pixels x triangles) scan.

Role parity: the reference's fixed-function rasterizer has unbounded
per-tile primitive throughput (rz_renderer.rs:429-505); this is the
first binned path here that matches that contract exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .raster import FragmentBuffer

LANES = 128
CAND_CHUNK = 128          # candidates per SMEM chunk (16 x 128 f32 = 8 KB)
_ID_BITS = 20             # fused key layout: cell << 20 | triangle id
_ID_MASK = (1 << _ID_BITS) - 1
_MID_SPAN = 8             # mid class covers <= 8x8 tiles (64 copies)


def _raster_kernel_body(
    sub, tw, tile,
    starts_smem,              # SMEM (1, n_tiles + 1) i32 segment starts
    data_hbm,                 # ANY (16, N_pad) f32 packed candidates
    depth_o, tri_o, uw_o, vw_o, iw_o,   # VMEM (sub, LANES) blocks
    dsmem,                    # scratch SMEM (16, CAND_CHUNK)
    sem,
):
    tid = pl.program_id(0)
    tx0 = jax.lax.rem(tid, jnp.int32(tw)) * tile
    ty0 = (tid // jnp.int32(tw)) * tile

    subs = jax.lax.broadcasted_iota(jnp.int32, (sub, LANES), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (sub, LANES), 1)
    idx = subs * LANES + lanes
    px = (tx0 + jax.lax.rem(idx, jnp.int32(tile))).astype(jnp.float32) + 0.5
    py = (ty0 + idx // jnp.int32(tile)).astype(jnp.float32) + 0.5

    depth_o[:] = jnp.zeros((sub, LANES), jnp.float32)
    tri_o[:] = jnp.full((sub, LANES), -1, jnp.int32)
    uw_o[:] = jnp.zeros((sub, LANES), jnp.float32)
    vw_o[:] = jnp.zeros((sub, LANES), jnp.float32)
    iw_o[:] = jnp.zeros((sub, LANES), jnp.float32)

    start = starts_smem[0, tid]
    end = starts_smem[0, tid + 1]

    def chunk_body(carry):
        cb = carry
        cp = pltpu.make_async_copy(
            data_hbm.at[:, pl.ds(cb * CAND_CHUNK, CAND_CHUNK)], dsmem, sem
        )
        cp.start()
        cp.wait()
        lo = jnp.maximum(start - cb * CAND_CHUNK, 0)
        hi = jnp.minimum(end - cb * CAND_CHUNK, CAND_CHUNK)

        def cand_body(k, _):
            j = lo + k
            x0 = dsmem[0, j]
            y0 = dsmem[1, j]
            x1 = dsmem[2, j]
            y1 = dsmem[3, j]
            x2 = dsmem[4, j]
            y2 = dsmem[5, j]
            z0 = dsmem[6, j]
            z1 = dsmem[7, j]
            z2 = dsmem[8, j]
            iw0 = dsmem[9, j]
            iw1 = dsmem[10, j]
            iw2 = dsmem[11, j]
            sgn = dsmem[12, j]
            inv_area = dsmem[13, j]
            gid = dsmem[14, j].astype(jnp.int32)

            # Exact ops/raster.rasterize edge functions: w0=edge(b,c),
            # w1=edge(c,a), w2=edge(a,b); e(p)=d.x*(py-p0.y)-d.y*(px-p0.x).
            w0 = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
            w1 = (x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)
            w2 = (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)
            inside = (
                (w0 * sgn >= 0.0) & (w1 * sgn >= 0.0) & (w2 * sgn >= 0.0)
            )
            l0 = w0 * inv_area
            l1 = w1 * inv_area
            l2 = w2 * inv_area
            z = l0 * z0 + l1 * z1 + l2 * z2
            iw_i = l0 * iw0 + l1 * iw1 + l2 * iw2
            # Strict GREATER + id-ordered segment == the full scan's
            # lowest-id-among-max-z winner (reverse-Z, rz_renderer.rs:494).
            better = inside & (z > depth_o[:])
            depth_o[:] = jnp.where(better, z, depth_o[:])
            tri_o[:] = jnp.where(better, gid, tri_o[:])
            uw_o[:] = jnp.where(better, l1 * iw1, uw_o[:])
            vw_o[:] = jnp.where(better, l2 * iw2, vw_o[:])
            iw_o[:] = jnp.where(better, iw_i, iw_o[:])
            return 0

        jax.lax.fori_loop(0, hi - lo, cand_body, 0)
        return cb + 1

    jax.lax.while_loop(
        lambda cb: (start < end) & (cb * CAND_CHUNK < end),
        chunk_body,
        start // CAND_CHUNK,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "tile", "mid_max", "huge_max", "cand_cap",
        "interpret",
    ),
)
def rasterize_tiled_exact(
    tri_screen: jnp.ndarray,   # (T, 3, 2)
    tri_depth: jnp.ndarray,    # (T, 3)
    tri_inv_w: jnp.ndarray,    # (T, 3)
    tri_valid: jnp.ndarray,    # (T,)
    width: int,
    height: int,
    tile: int = 64,
    mid_max: int = 4096,
    huge_max: int = 512,
    cand_cap: int = 0,
    interpret: bool = False,
) -> tuple[FragmentBuffer, jnp.ndarray]:
    """Exact tile-binned rasterization (no per-tile candidate caps).

    Returns (FragmentBuffer flat over pixels, overflow flag in {0.0,
    1.0}). Overflow fires only on the three STATIC selection bounds —
    more than `mid_max` mid-size triangles, more than `huge_max` huge
    ones, or more than `cand_cap` total (tile, candidate) pairs — all
    sized generously above real meshes; per-tile counts are never
    capped (contrast rasterize_tiled's k_max, which drops geometry on
    the bench camera).
    """
    t = tri_screen.shape[0]
    assert t < (1 << _ID_BITS), "fused sort key holds ids < 2^20"
    tw = -(-width // tile)
    th = -(-height // tile)
    n_tiles = tw * th
    assert n_tiles * (1 << _ID_BITS) < (1 << 31), "cell bits overflow"
    assert (tile * tile) % LANES == 0, "tile*tile must be lane-divisible"
    sub = (tile * tile) // LANES
    mid_max = min(mid_max, t)
    huge_max = min(huge_max, t)

    # --- classification (screen AABB -> covered tile span) ---
    smin = jnp.min(tri_screen, axis=1)
    smax = jnp.max(tri_screen, axis=1)
    a, b, c = tri_screen[:, 0], tri_screen[:, 1], tri_screen[:, 2]
    area = (
        (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
        - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0])
    )
    onscreen = (
        tri_valid
        & (jnp.abs(area) > 1e-12)   # degenerate tris can never win
        & (smax[:, 0] >= 0.0) & (smin[:, 0] <= width)
        & (smax[:, 1] >= 0.0) & (smin[:, 1] <= height)
    )
    inv_t = 1.0 / tile
    bx0 = jnp.clip(jnp.floor(smin[:, 0] * inv_t).astype(jnp.int32), 0, tw - 1)
    bx1 = jnp.clip(jnp.floor(smax[:, 0] * inv_t).astype(jnp.int32), 0, tw - 1)
    by0 = jnp.clip(jnp.floor(smin[:, 1] * inv_t).astype(jnp.int32), 0, th - 1)
    by1 = jnp.clip(jnp.floor(smax[:, 1] * inv_t).astype(jnp.int32), 0, th - 1)
    spanx = bx1 - bx0
    spany = by1 - by0
    small = onscreen & (spanx <= 1) & (spany <= 1)
    mid = (
        onscreen & ~small
        & (spanx < _MID_SPAN) & (spany < _MID_SPAN)
    )
    huge = onscreen & ~small & ~mid

    ids = jnp.arange(t, dtype=jnp.int32)
    sent = jnp.int32(n_tiles) << _ID_BITS

    def fused(ok, cell, tid_):
        return jnp.where(ok, cell * (1 << _ID_BITS) + tid_, sent + tid_)

    keys = []
    # small: each covers at most 2x2 tiles
    for dx in (0, 1):
        for dy in (0, 1):
            ok = small & (spanx >= dx) & (spany >= dy)
            keys.append(fused(ok, (by0 + dy) * tw + (bx0 + dx), ids))
    # mid: a selected subset, 64 coverage-masked copies
    _, m_sorted = jax.lax.sort(
        (jnp.where(mid, 0, 1).astype(jnp.int32), ids), num_keys=2
    )
    m_ids = m_sorted[:mid_max]
    m_ok = jnp.take(mid, m_ids)
    m_bx0 = jnp.take(bx0, m_ids)
    m_by0 = jnp.take(by0, m_ids)
    m_spx = jnp.take(spanx, m_ids)
    m_spy = jnp.take(spany, m_ids)
    for dx in range(_MID_SPAN):
        for dy in range(_MID_SPAN):
            ok = m_ok & (m_spx >= dx) & (m_spy >= dy)
            keys.append(fused(ok, (m_by0 + dy) * tw + (m_bx0 + dx), m_ids))
    m_over = jnp.sum(mid.astype(jnp.int32)) > mid_max
    # huge: enumerate (tile, candidate) overlap pairs — no span bound
    _, h_sorted = jax.lax.sort(
        (jnp.where(huge, 0, 1).astype(jnp.int32), ids), num_keys=2
    )
    h_ids = h_sorted[:huge_max]
    h_ok = jnp.take(huge, h_ids)
    tcols = jnp.arange(n_tiles, dtype=jnp.int32) % tw
    trows = jnp.arange(n_tiles, dtype=jnp.int32) // tw
    ov = (
        h_ok[None, :]
        & (tcols[:, None] >= jnp.take(bx0, h_ids)[None, :])
        & (tcols[:, None] <= jnp.take(bx1, h_ids)[None, :])
        & (trows[:, None] >= jnp.take(by0, h_ids)[None, :])
        & (trows[:, None] <= jnp.take(by1, h_ids)[None, :])
    )
    cells = jnp.arange(n_tiles, dtype=jnp.int32)
    keys.append(
        fused(
            ov, cells[:, None], jnp.broadcast_to(h_ids[None, :], ov.shape)
        ).reshape(-1)
    )
    h_over = jnp.sum(huge.astype(jnp.int32)) > huge_max

    key_all = jnp.concatenate(keys)
    n_all = key_all.shape[0]
    if cand_cap <= 0:
        # The packed-table row gather costs ~25 ns/row on TPU, so pay
        # for a realistic candidate population (2 covered tiles per
        # onscreen triangle in the worst measured case), not for the
        # sentinel-padded key count (n_all is ~10x the real total at
        # the bench camera). Overflow reports if a scene exceeds it.
        cand_cap = min(n_all, max(131072, 2 * t))
    cand_cap = min(cand_cap, n_all)
    cap_pad = -(-cand_cap // CAND_CHUNK) * CAND_CHUNK

    fused_s = jax.lax.sort(key_all)
    n_real = jnp.searchsorted(fused_s, sent, side="left")
    cap_over = n_real > cand_cap
    starts = jnp.minimum(
        jnp.searchsorted(
            fused_s,
            jnp.arange(n_tiles + 1, dtype=jnp.int32) * (1 << _ID_BITS),
            side="left",
        ),
        cand_cap,
    ).astype(jnp.int32)

    # --- packed candidate table, one row take in segment order ---
    sgn = jnp.where(area >= 0, 1.0, -1.0)
    inv_area = 1.0 / jnp.where(jnp.abs(area) > 1e-12, area, 1.0)
    packed = jnp.concatenate(
        [
            tri_screen.reshape(t, 6),
            tri_depth,
            tri_inv_w,
            sgn[:, None],
            inv_area[:, None],
            ids.astype(jnp.float32)[:, None],   # exact for ids < 2^24
            jnp.zeros((t, 1), jnp.float32),
        ],
        axis=1,
    )
    id_head = (fused_s[:cand_cap] & _ID_MASK).astype(jnp.int32)
    data = jnp.take(packed, id_head, axis=0)
    if cap_pad != cand_cap:
        data = jnp.pad(data, ((0, cap_pad - cand_cap), (0, 0)))
    data = data.T  # (16, cap_pad)

    out_shape2 = (n_tiles * sub, LANES)
    tile_spec = pl.BlockSpec(
        (sub, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    depth_b, tri_b, uw_b, vw_b, iw_b = pl.pallas_call(
        functools.partial(_raster_kernel_body, sub, tw, tile),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[tile_spec] * 5,
        out_shape=[
            jax.ShapeDtypeStruct(out_shape2, jnp.float32),
            jax.ShapeDtypeStruct(out_shape2, jnp.int32),
            jax.ShapeDtypeStruct(out_shape2, jnp.float32),
            jax.ShapeDtypeStruct(out_shape2, jnp.float32),
            jax.ShapeDtypeStruct(out_shape2, jnp.float32),
        ],
        scratch_shapes=[
            pltpu.SMEM((16, CAND_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(starts[None, :], data)

    def untile(arr):
        arr = arr.reshape(th, tw, tile, tile)
        arr = arr.transpose(0, 2, 1, 3).reshape(th * tile, tw * tile)
        return arr[:height, :width].reshape(-1)

    u = untile(uw_b) / jnp.maximum(untile(iw_b), 1e-12)
    v = untile(vw_b) / jnp.maximum(untile(iw_b), 1e-12)
    frag = FragmentBuffer(
        depth=untile(depth_b), tri=untile(tri_b), u=u, v=v
    )
    over = jnp.maximum(
        jnp.maximum(m_over.astype(jnp.float32), h_over.astype(jnp.float32)),
        cap_over.astype(jnp.float32),
    )
    return frag, over
