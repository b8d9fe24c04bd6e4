"""Microbench of the deferred-shade attribute fetch variants (round-5:
the raster stage bisection put ~131 of 155 ms in the attrs fetch —
lighting[attrs] 131.2 vs lighting[nolight] 151.4, raster_stages_s2.log).

Measures, on REAL winner indices from the atrium_big gbuffer at 1080p:
  a) the shipped fetch: 32-wide shade-row take + 3 geometry takes
  b0) the 32-wide shade-row take alone (current table width)
  b1) a 16-wide needed-columns-only take (what _shade actually reads)
  c) one merged 25-wide take (needed cols + v0/e1/e2 packed)
  d) bf16-pair-packed needed-cols take (16 cols -> 8 f32 carriers)
  e) sorted-index variant of (b0): does index locality matter?
  f) width scaling of the take (1/2/4/8 columns)

All variant tables are built INSIDE one jit (eager ops on axon are
one tunnel round trip each; device->host fetches of MB-scale arrays
wedge for minutes — CLAUDE.md invariant).

  python -u tools/probe_shadegather.py
"""
import os
import sys
import time

t00 = time.perf_counter()


def stamp(msg):
    print(f"[{time.perf_counter() - t00:8.1f}s] {msg}", flush=True)


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hala_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from hala_tpu.models.rz_renderer import RasterSettings, gbuffer_pass
from hala_tpu.scene.cpu.scene import Scene
from hala_tpu.scene.loader.uploader import SceneUploader

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
scene = SceneUploader.upload(
    Scene.load(os.path.join(root, "assets", "atrium_big.glb")),
    use_ray_tracing=False,
)
jax.block_until_ready(scene.geometry.tri_v0)
stamp(f"upload done (tris={scene.geometry.num_triangles})")

settings = RasterSettings(
    width=1920, height=1088, binned=True, tile=64, deferred=True,
)
geom = scene.geometry


@jax.jit
def prep(shade, v0, e1, e2, tri):
    tid = jnp.maximum(tri, 0)
    need = jnp.concatenate([shade[:, 0:15], shade[:, 18:19]], axis=1)
    geo25 = jnp.concatenate([need, v0, e1, e2], axis=1)
    u16 = jax.lax.bitcast_convert_type(
        need.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32).reshape(need.shape[0], -1, 2)
    packed = u16[:, :, 0] | (u16[:, :, 1] << 16)
    shade_bf16 = jax.lax.bitcast_convert_type(packed, jnp.float32)
    narrow = tuple(need[:, :w] for w in (1, 2, 4, 8))
    return tid, jnp.sort(tid), need, geo25, shade_bf16, narrow


frag = gbuffer_pass(scene, jnp.int32(0), settings, None)
tid, tid_sorted, need, geo25, shade_bf16, narrow = prep(
    geom.shade_table, geom.tri_v0, geom.tri_e1, geom.tri_e2, frag.tri
)
jax.block_until_ready(tid)
shade = geom.shade_table
stamp(f"tables built (N={tid.shape[0]}, shade {shade.shape})")


def timed(tag, fn, *args, reps=20):
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    stamp(f"{tag}: {dt*1e3:.2f} ms")
    return out


def fetch_shipped(shade, v0, e1, e2, tid):
    rows = jnp.take(shade, tid, axis=0)
    a = jnp.take(v0, tid, axis=0)
    b = jnp.take(e1, tid, axis=0)
    c = jnp.take(e2, tid, axis=0)
    return rows.sum() + a.sum() + b.sum() + c.sum()


def fetch_rows_only(table, tid):
    return jnp.take(table, tid, axis=0).sum()


def fetch_bf16(shade_bf16, tid):
    rows = jnp.take(shade_bf16, tid, axis=0)  # (N, 8) f32 carriers
    u = jax.lax.bitcast_convert_type(rows, jnp.uint32)
    lo = jax.lax.bitcast_convert_type(
        (u & 0xFFFF).astype(jnp.uint16), jnp.bfloat16
    ).astype(jnp.float32)
    hi = jax.lax.bitcast_convert_type(
        (u >> 16).astype(jnp.uint16), jnp.bfloat16
    ).astype(jnp.float32)
    full = jnp.stack([lo, hi], axis=-1).reshape(rows.shape[0], -1)
    return full.sum()


timed("a) shipped: 32-row + 3 geo takes", fetch_shipped,
      shade, geom.tri_v0, geom.tri_e1, geom.tri_e2, tid)
timed("b0) 32-wide shade take (current)", fetch_rows_only, shade, tid)
timed("b1) 16-wide needed-cols take", fetch_rows_only, need, tid)
timed("c) merged 25-wide take", fetch_rows_only, geo25, tid)
timed("d) bf16-packed row take (8)", fetch_bf16, shade_bf16, tid)
timed("e) sorted-index 32-row take", fetch_rows_only, shade, tid_sorted)
for wcut, tbl in zip((1, 2, 4, 8), narrow):
    timed(f"f) {wcut}-wide take", fetch_rows_only, tbl, tid)
