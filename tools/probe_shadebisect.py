"""Bisect the 131 ms lighting[attrs] stage (raster_stages_s2.log) into
its actual ops: the take-variant microbench (shadegather.log) measured
every row take at ~0.02-0.4 ms, so the gathers are NOT the cost and the
round-4 '25 ns/row' note does not apply at this composition. Find what
is: each stage below re-traces the _shade prefix cumulatively as its
own jit over the REAL gbuffer winners and materializes its outputs.

  python -u tools/probe_shadebisect.py
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
from hala_tpu.ops.bsdf import gather_materials
from hala_tpu.ops.gathers import take_rows
from hala_tpu.ops.sampling import normalize
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
frag = gbuffer_pass(scene, jnp.int32(0), settings, None)
jax.block_until_ready(frag.tri)
stamp(f"gbuffer done (N={frag.tri.shape[0]})")


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def timed(tag, fn, *args, reps=10):
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


def s0_rows(scene, frag):
    tid = jnp.maximum(frag.tri, 0)
    return take_rows(scene.geometry.shade_table, tid)


def s1_interp(scene, frag):
    geom = scene.geometry
    tid = jnp.maximum(frag.tri, 0)
    u, v = frag.u, frag.v
    w0 = 1.0 - u - v
    rows = take_rows(geom.shade_table, tid)
    ns = normalize(
        w0[:, None] * rows[:, 0:3]
        + u[:, None] * rows[:, 3:6]
        + v[:, None] * rows[:, 6:9]
    )
    v0 = jnp.take(geom.tri_v0, tid, axis=0)
    e1 = jnp.take(geom.tri_e1, tid, axis=0)
    e2 = jnp.take(geom.tri_e2, tid, axis=0)
    pos = v0 + u[:, None] * e1 + v[:, None] * e2
    uv = (
        w0[:, None] * rows[:, 9:11]
        + u[:, None] * rows[:, 11:13]
        + v[:, None] * rows[:, 13:15]
    )
    return ns, pos, uv


def s2_mat(scene, frag):
    tid = jnp.maximum(frag.tri, 0)
    rows = take_rows(scene.geometry.shade_table, tid)
    mat_idx = rows[:, 18].astype(jnp.int32)
    mp = gather_materials(scene.materials, mat_idx)
    return mp.base_color, mp.base_color_map

def s2b_mat_direct(scene, frag):
    # same gather keyed on tri_mat instead of the shade-row column
    tid = jnp.maximum(frag.tri, 0)
    mat_idx = jnp.take(scene.geometry.tri_mat, tid)
    mp = gather_materials(scene.materials, mat_idx)
    return mp.base_color, mp.base_color_map


def s3_attrs_full(scene, frag, view_pos):
    # verbatim _shade attrs-mode computation
    geom = scene.geometry
    tid = jnp.maximum(frag.tri, 0)
    u, v = frag.u, frag.v
    w0 = 1.0 - u - v
    rows = take_rows(geom.shade_table, tid)
    ns = normalize(
        w0[:, None] * rows[:, 0:3]
        + u[:, None] * rows[:, 3:6]
        + v[:, None] * rows[:, 6:9]
    )
    v0 = jnp.take(geom.tri_v0, tid, axis=0)
    e1 = jnp.take(geom.tri_e1, tid, axis=0)
    e2 = jnp.take(geom.tri_e2, tid, axis=0)
    pos = v0 + u[:, None] * e1 + v[:, None] * e2
    to_view = view_pos[None, :] - pos
    ns = jnp.where(dot(ns, to_view)[:, None] < 0, -ns, ns)
    mat_idx = rows[:, 18].astype(jnp.int32)
    mp = gather_materials(scene.materials, mat_idx)
    return mp.base_color, mp.base_color, ns, pos


cam_pos = scene.cameras.position  # (n_cams, 3); index inside jit


def s3_wrap(scene, frag):
    return s3_attrs_full(scene, frag, scene.cameras.position[0])


timed("s0 row take (N,32) materialized", s0_rows, scene, frag)
timed("s1 + interp ns/pos/uv", s1_interp, scene, frag)
timed("s2 mat gather via shade col", s2_mat, scene, frag)
timed("s2b mat gather via tri_mat", s2b_mat_direct, scene, frag)
timed("s3 attrs-mode verbatim", s3_wrap, scene, frag)
