"""(ray, cluster) work-item expansion intersector.

The stream-tracing answer to incoherent rays (PLAN.md item #1): the
lockstep cluster kernel (ops/cluster.py) pays for the UNION of clusters
any ray in a 1024-ray block touches; with diffuse bounce rays that union
approaches the whole scene. Here the irregularity is converted into a
dense stream instead:

1. per-ray culling emits up to K candidate clusters per ray
   (top-k over the slab-test mask, Morton order preserved);
2. items stay in RAY-MAJOR order: expansion is a dense jnp.repeat and
   the final reduction a reshape+argmin — measured on TPU, a global
   lax.sort of the items plus the gathers/scatters it forces cost ~10x
   the intersection itself, so sorting is deliberately NOT done;
3. a Pallas kernel walks each 1024-item tile: it discovers the tile's
   distinct clusters by an in-tile min-reduction over VALUES (order
   doesn't matter), DMAs each discovered cluster's geometry block
   HBM->SMEM once, and Moller-Trumbore's the whole tile masked to that
   cluster's items. A tile holds ~1024/K rays' candidate lists, so the
   distinct count per tile is the union over a handful of (coherent)
   rays instead of the 1024-ray block union of ops/cluster.py;
4. per-item hits reduce back to per-ray closest hits by reshape+argmin.

Validated against brute force in tests/test_expand.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import Hit, T_MAX, out_struct, varying_like

LANES = 128
ITEM_SUBLANES = 8
ITEM_BLOCK = ITEM_SUBLANES * LANES   # 1024 items per kernel tile
TRI_CHUNK = 128
BIG_CLUSTER = 0x3FFFFFFF  # sentinel: invalid item (Python int:
# jnp constants captured by Pallas kernels must not close over arrays)
_EPS = 1.0e-7
_T_MIN = 1.0e-4


def cull_per_ray(o, d, t_max, cluster_min, cluster_max, k_per_ray: int,
                 row_chunk: int = 16384):
    """Per-ray candidate clusters: (N, K) i32 ids (BIG_CLUSTER padded)
    and the overflow fraction of rays whose list clipped."""
    n = o.shape[0]
    c = cluster_min.shape[0]
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
        count = jnp.sum(hit.astype(jnp.int32), axis=1)
        # first K set bits in Morton order: score = hit * (C - idx)
        score = jnp.where(
            hit, c - jnp.arange(c, dtype=jnp.int32)[None, :], 0
        )
        top, idx = jax.lax.top_k(score, k_per_ray)
        ids = jnp.where(top > 0, idx.astype(jnp.int32), jnp.int32(BIG_CLUSTER))
        return ids, count

    ids, counts = jax.lax.map(per_chunk, (o_c, i_c, t_c))
    ids = ids.reshape(n_pad, k_per_ray)[:n]
    counts = counts.reshape(n_pad)[:n]
    overflow = jnp.mean((counts > k_per_ray).astype(jnp.float32))
    return ids, overflow


def _make_expand_kernel(max_runs: int):
    return functools.partial(_expand_kernel_body, max_runs)


def _expand_kernel_body(
    max_runs,
    ox, oy, oz, dx, dy, dz, tmax,   # VMEM (ITEM_SUBLANES, LANES) item rays
    cid_ref,                        # VMEM (ITEM_SUBLANES, LANES) i32
    tri_hbm,                        # ANY (C, 16, TRI_CHUNK)
    t_out, tri_out, u_out, v_out,
    tri_smem,                       # SMEM (16, TRI_CHUNK)
    sem,
):
    t_out[:] = tmax[:]
    tri_out[:] = jnp.full(t_out.shape, -1, jnp.int32)
    u_out[:] = jnp.zeros(t_out.shape, jnp.float32)
    v_out[:] = jnp.zeros(t_out.shape, jnp.float32)

    rox, roy, roz = ox[:], oy[:], oz[:]
    rdx, rdy, rdz = dx[:], dy[:], dz[:]
    cids = cid_ref[:]

    big = jnp.int32(BIG_CLUSTER)

    def run_body(_, last):
        # next distinct cluster id in this tile
        cand = jnp.where(cids > last, cids, big)
        cid = jnp.min(cand)

        @pl.when(cid < big)
        def _run():
            cp = pltpu.make_async_copy(tri_hbm.at[cid], tri_smem, sem)
            cp.start()
            cp.wait()
            in_run = cids == cid
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

            jax.lax.fori_loop(0, TRI_CHUNK, tri_body, 0)

        return cid

    jax.lax.fori_loop(0, max_runs, run_body, jnp.int32(-1))


@functools.partial(
    jax.jit, static_argnames=("k_per_ray", "max_runs", "interpret")
)
def intersect_expanded(
    o: jnp.ndarray,
    d: jnp.ndarray,
    geometry,
    t_max=None,
    k_per_ray: int = 16,
    max_runs: int = 96,
    interpret: bool = False,
) -> Hit:
    """Closest hit through work-item expansion. `k_per_ray` bounds the
    per-ray candidate list (rays beyond it lose hits — raise it if the
    overflow diagnostic from cull_per_ray fires); `max_runs` bounds
    distinct clusters per 1024-item tile (sorted items keep it small)."""
    n = o.shape[0]
    if t_max is None:
        tm = varying_like(o[:, 0], 0.0) + T_MAX
    else:
        tm = jnp.broadcast_to(t_max, (n,)).astype(jnp.float32)

    ids, _overflow = cull_per_ray(
        o, d, tm, geometry.cluster_min, geometry.cluster_max, k_per_ray
    )

    # Items in RAY-MAJOR order: no sort, no gather, no scatter anywhere.
    # The kernel discovers runs by VALUE (min-reduction over the tile),
    # so item order only affects how many distinct clusters share a
    # 1024-item tile — with ~1024/K coherent rays per tile that stays
    # small, while a global lax.sort of the items measured ~10x slower
    # than the whole intersection on TPU.
    n_items = n * k_per_ray
    item_cid = ids.reshape(-1)
    rays_packed = jnp.concatenate(
        [o, d, tm[:, None], jnp.zeros((n, 1))], axis=1
    )  # (N, 8)
    item_rays = jnp.repeat(rays_packed, k_per_ray, axis=0)  # dense copy

    n_pad = -(-n_items // ITEM_BLOCK) * ITEM_BLOCK
    if n_pad != n_items:
        pad = n_pad - n_items
        item_rays = jnp.pad(item_rays, ((0, pad), (0, 0)),
                            constant_values=1.0)
        item_cid = jnp.pad(item_cid, (0, pad),
                           constant_values=BIG_CLUSTER)
    # invalid items (BIG_CLUSTER) contribute nothing: tmax forced to 0
    item_tmax = jnp.where(
        item_cid < BIG_CLUSTER, item_rays[:, 6], 0.0
    )

    nb = n_pad // ITEM_BLOCK
    shape2 = (n_pad // LANES, LANES)

    def comp(a):
        return a.reshape(shape2)

    ray_in = [
        comp(item_rays[:, 0]), comp(item_rays[:, 1]), comp(item_rays[:, 2]),
        comp(item_rays[:, 3]), comp(item_rays[:, 4]), comp(item_rays[:, 5]),
        comp(item_tmax), comp(item_cid),
    ]
    spec = pl.BlockSpec(
        (ITEM_SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    tri_spec = pl.BlockSpec(memory_space=pl.ANY)
    t_i, tri_i, u_i, v_i = pl.pallas_call(
        _make_expand_kernel(max_runs),
        grid=(nb,),
        in_specs=[spec] * 8 + [tri_spec],
        out_specs=[spec] * 4,
        out_shape=[
            out_struct(shape2, jnp.float32, ray_in[0]),
            out_struct(shape2, jnp.int32, ray_in[0]),
            out_struct(shape2, jnp.float32, ray_in[0]),
            out_struct(shape2, jnp.float32, ray_in[0]),
        ],
        scratch_shapes=[
            pltpu.SMEM((16, TRI_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*ray_in, geometry.tri_packed)

    # Reduce items -> per-ray closest hit: ray-major items make this a
    # reshape + argmin, no scatter. Invalid items were dispatched with
    # tmax=0 (so the kernel does no work for them) — exclude them here
    # or their 0 wins the min.
    valid_item = item_cid[:n_items] < BIG_CLUSTER
    it = jnp.where(
        valid_item, t_i.reshape(-1)[:n_items], T_MAX
    ).reshape(n, k_per_ray)
    itri = jnp.where(
        valid_item, tri_i.reshape(-1)[:n_items], -1
    ).reshape(n, k_per_ray)
    iu = u_i.reshape(-1)[:n_items].reshape(n, k_per_ray)
    iv = v_i.reshape(-1)[:n_items].reshape(n, k_per_ray)

    k_best = jnp.argmin(it, axis=1)
    rows = jnp.arange(n)
    return Hit(
        t=it[rows, k_best],
        tri=itri[rows, k_best],
        u=iu[rows, k_best],
        v=iv[rows, k_best],
    )
