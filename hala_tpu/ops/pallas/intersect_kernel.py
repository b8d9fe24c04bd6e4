"""Pallas ray-triangle intersection kernel.

The TPU replacement for hardware `trace_rays` at the intersection level
(rt_renderer.rs:458-464). Design, per the TPU hardware model:

* rays live in VMEM as (R, 128) f32 tiles, one component per buffer
  (SoA) — every op in the Moller-Trumbore test is then a clean full-width
  VPU op;
* the triangle chunk lives in SMEM as 9 scalar arrays; the kernel loops
  over triangles with `fori_loop`, broadcasting each triangle's scalars
  against the whole ray tile (34-triangle Cornell: one chunk; larger
  scenes: a second grid dimension streams chunks with the output block
  revisited as the accumulator);
* grid = (ray_blocks, tri_chunks); outputs (best t / tri / u / v) are
  indexed by ray block only, so successive chunk steps accumulate into
  the same VMEM block (j == 0 initializes).

The same kernel serves closest-hit and any-hit (shadow) queries: shadow
rays pass t_max = light distance and test `tri >= 0` afterwards.
Validated against ops.intersect.intersect_bruteforce in
tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..intersect import Hit, T_MAX, out_struct

LANES = 128
RAY_SUBLANES = 16          # rays per program = RAY_SUBLANES * LANES = 2048
TRI_CHUNK = 128            # triangles per SMEM-resident chunk
SMEM_BLOCK = 512  # rank-1 SMEM operand block; matches XLA T(512) tiling
_EPS = 1.0e-7
_T_MIN = 1.0e-4


def _make_kernel(num_real: int):
    """Kernel specialized on the real (un-padded) triangle count so the
    inner loop skips the TRI_PAD padding (3.8x waste on Cornell)."""
    return functools.partial(_kernel_body, num_real)


def _kernel_body(
    num_real,
    # SMEM triangle chunk (9 x (TRI_CHUNK,))
    v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
    # VMEM ray tiles ((RAY_SUBLANES, LANES) each)
    ox, oy, oz, dx, dy, dz, tmax,
    # outputs (ray-block indexed; revisited across the chunk dimension)
    t_out, tri_out, u_out, v_out,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        t_out[:] = tmax[:]
        tri_out[:] = jnp.full(t_out.shape, -1, jnp.int32)
        u_out[:] = jnp.zeros(t_out.shape, jnp.float32)
        v_out[:] = jnp.zeros(t_out.shape, jnp.float32)

    rdx, rdy, rdz = dx[:], dy[:], dz[:]
    rox, roy, roz = ox[:], oy[:], oz[:]
    base = j * SMEM_BLOCK

    def body(t, _):
        av0x = v0x[t]
        av0y = v0y[t]
        av0z = v0z[t]
        ae1x = e1x[t]
        ae1y = e1y[t]
        ae1z = e1z[t]
        ae2x = e2x[t]
        ae2y = e2y[t]
        ae2z = e2z[t]

        # pvec = d x e2 (triangle scalars broadcast over the ray tile)
        px = rdy * ae2z - rdz * ae2y
        py = rdz * ae2x - rdx * ae2z
        pz = rdx * ae2y - rdy * ae2x
        det = px * ae1x + py * ae1y + pz * ae1z
        inv_det = jnp.where(jnp.abs(det) > _EPS, 1.0 / det, 0.0)
        tx = rox - av0x
        ty = roy - av0y
        tz = roz - av0z
        u = (tx * px + ty * py + tz * pz) * inv_det
        # qvec = tvec x e1
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

    count = jnp.clip(num_real - base, 0, SMEM_BLOCK)
    jax.lax.fori_loop(0, count, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret", "num_real"))
def intersect_pallas(
    o: jnp.ndarray,
    d: jnp.ndarray,
    tri_v0: jnp.ndarray,
    tri_e1: jnp.ndarray,
    tri_e2: jnp.ndarray,
    t_max=None,
    interpret: bool = False,
    num_real: int | None = None,
) -> Hit:
    """Closest hit over all triangles. o, d: (N, 3); tri_*: (T, 3) with
    T a multiple of TRI_CHUNK (degenerate padding allowed; pass
    `num_real` to skip padded triangles entirely). N is padded
    internally to a ray-block multiple."""
    n = o.shape[0]
    num_tris = tri_v0.shape[0]
    assert num_tris % TRI_CHUNK == 0
    if num_real is None:
        num_real = num_tris
    block = RAY_SUBLANES * LANES
    n_pad = -(-n // block) * block

    def comp(a, i):
        col = a[:, i]
        if n_pad != n:
            col = jnp.pad(col, (0, n_pad - n))
        return col.reshape(n_pad // LANES, LANES)

    rays = [comp(o, 0), comp(o, 1), comp(o, 2),
            comp(d, 0), comp(d, 1), comp(d, 2)]
    if t_max is None:
        tmax = jnp.full((n_pad // LANES, LANES), T_MAX)
    else:
        tm = jnp.broadcast_to(t_max, (n,)).astype(jnp.float32)
        tm = jnp.pad(tm, (0, n_pad - n))
        tmax = tm.reshape(n_pad // LANES, LANES)
    rays.append(tmax)

    # Rank-1 SMEM triangle tables padded to a 512-element multiple:
    # XLA lays out f32[n] with tiling T(512), and Mosaic verifies block
    # tiling T(128) against it — they only agree when n % 512 == 0
    # (observed verifier failure at n=384; n=128 Cornell passed).
    t_pad = -(-num_tris // 512) * 512 - num_tris
    def col(a):
        return jnp.pad(a, (0, t_pad)) if t_pad else a
    tris = [
        col(tri_v0[:, 0]), col(tri_v0[:, 1]), col(tri_v0[:, 2]),
        col(tri_e1[:, 0]), col(tri_e1[:, 1]), col(tri_e1[:, 2]),
        col(tri_e2[:, 0]), col(tri_e2[:, 1]), col(tri_e2[:, 2]),
    ]
    num_tris_pad = num_tris + t_pad

    grid = (n_pad // block, num_tris_pad // SMEM_BLOCK)
    tri_spec = pl.BlockSpec(
        (SMEM_BLOCK,), lambda i, j: (j,), memory_space=pltpu.SMEM
    )
    ray_spec = pl.BlockSpec(
        (RAY_SUBLANES, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (RAY_SUBLANES, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM
    )
    shape2 = (n_pad // LANES, LANES)
    t_best, tri_best, u_best, v_best = pl.pallas_call(
        _make_kernel(num_real),
        grid=grid,
        in_specs=[tri_spec] * 9 + [ray_spec] * 7,
        out_specs=[out_spec] * 4,
        out_shape=[
            out_struct(shape2, jnp.float32, rays[0]),
            out_struct(shape2, jnp.int32, rays[0]),
            out_struct(shape2, jnp.float32, rays[0]),
            out_struct(shape2, jnp.float32, rays[0]),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*tris, *rays)

    return Hit(
        t=t_best.reshape(-1)[:n],
        tri=tri_best.reshape(-1)[:n],
        u=u_best.reshape(-1)[:n],
        v=v_best.reshape(-1)[:n],
    )


def occluded_pallas(
    o, d, t_far, tri_v0, tri_e1, tri_e2, interpret: bool = False,
    num_real: int | None = None,
) -> jnp.ndarray:
    """Any-hit via the closest-hit kernel with a clipped t_max."""
    hit = intersect_pallas(
        o, d, tri_v0, tri_e1, tri_e2,
        t_max=t_far * (1.0 - 1e-4), interpret=interpret, num_real=num_real,
    )
    return hit.tri >= 0
