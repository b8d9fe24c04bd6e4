"""HONEST re-measurement of the shade attribute fetch variants.

probe_shadecum exposed that jax.block_until_ready on the axon backend
does NOT reliably wait for execution: identical cached programs
measured 0.07 ms when the device queue was empty-ish (pass 1, compiles
between stages hid the drain) and 135-155 ms when re-run back-to-back
(pass 2). Every stage here therefore times `reps` dispatches ENDED BY A
SCALAR HOST FETCH (float()), which cannot return before the value
exists; a null stage calibrates the fetch round trip.

Variants (tables built in ONE prep jit, device-side):
  n   null: scalar add               (round-trip floor)
  a   32-wide shade row take          (current _shade fetch)
  b   16-wide needed-cols take
  c   25-wide merged take (needed + v0/e1/e2)
  d   bf16-packed 8-carrier take + unpack
  e   3 separate geo takes (v0/e1/e2)
  f   one-hot materials row fetch
  g   verbatim attrs-mode _shade prefix
  h   full _shade (2 lights, texture)

  python -u tools/probe_gatherhonest.py
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

from hala_tpu.models.rz_renderer import RasterSettings, _shade, gbuffer_pass
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
    return tid, need, geo25, shade_bf16


frag = gbuffer_pass(scene, jnp.int32(0), settings, None)
tid, need, geo25, shade_bf16 = prep(
    geom.shade_table, geom.tri_v0, geom.tri_e1, geom.tri_e2, frag.tri
)
v = float(jax.jit(jnp.sum)(tid))  # force everything so far (jitted:
# an EAGER jnp.sum on axon dispatches op-by-op through the tunnel and
# wedged this probe for >7 min once the compile queue was warm)
stamp(f"tables built (N={tid.shape[0]})")


def timed(tag, fn, *args, reps=10):
    jfn = jax.jit(fn)
    float(jfn(*args))          # compile + drain
    t0 = time.perf_counter()
    for _ in range(reps - 1):
        jfn(*args)
    val = float(jfn(*args))    # scalar host fetch = true completion
    dt = (time.perf_counter() - t0) / reps
    stamp(f"{tag}: {dt*1e3:.2f} ms  (val {val:.3e})")


def n_null(tid):
    return (tid[0] + 1).astype(jnp.float32)


def a_take32(shade, tid):
    return jnp.sum(jnp.take(shade, tid, axis=0))


def d_bf16(shade_bf16, tid):
    rows = jnp.take(shade_bf16, tid, axis=0)
    u = jax.lax.bitcast_convert_type(rows, jnp.uint32)
    lo = jax.lax.bitcast_convert_type(
        (u & 0xFFFF).astype(jnp.uint16), jnp.bfloat16
    ).astype(jnp.float32)
    hi = jax.lax.bitcast_convert_type(
        (u >> 16).astype(jnp.uint16), jnp.bfloat16
    ).astype(jnp.float32)
    return jnp.sum(lo) + jnp.sum(hi)


def e_geo(v0, e1, e2, tid):
    return (
        jnp.sum(jnp.take(v0, tid, axis=0))
        + jnp.sum(jnp.take(e1, tid, axis=0))
        + jnp.sum(jnp.take(e2, tid, axis=0))
    )


def f_mats(scene, shade, tid):
    rows = jnp.take(shade, tid, axis=0)
    mp = gather_materials(scene.materials, rows[:, 18].astype(jnp.int32))
    return jnp.sum(mp.base_color) + jnp.sum(mp.roughness)


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def g_attrs(scene, frag):
    g = scene.geometry
    tid2 = jnp.maximum(frag.tri, 0)
    u, vv = frag.u, frag.v
    w0 = 1.0 - u - vv
    rows = take_rows(g.shade_table, tid2)
    ns = normalize(
        w0[:, None] * rows[:, 0:3]
        + u[:, None] * rows[:, 3:6]
        + vv[:, None] * rows[:, 6:9]
    )
    v0 = jnp.take(g.tri_v0, tid2, axis=0)
    e1 = jnp.take(g.tri_e1, tid2, axis=0)
    e2 = jnp.take(g.tri_e2, tid2, axis=0)
    pos = v0 + u[:, None] * e1 + vv[:, None] * e2
    mp = gather_materials(scene.materials, rows[:, 18].astype(jnp.int32))
    return jnp.sum(mp.base_color) + jnp.sum(ns) + jnp.sum(pos)


def h_shade(scene, frag, cam):
    color, albedo, ns, pos = _shade(
        scene, frag, scene.cameras.position[cam]
    )
    return jnp.sum(color)


cam = jnp.int32(0)
timed("n  null scalar", n_null, tid)
timed("a  32-wide take", a_take32, shade := geom.shade_table, tid)
timed("b  16-wide take", a_take32, need, tid)
timed("c  25-wide merged take", a_take32, geo25, tid)
timed("d  bf16 8-carrier take", d_bf16, shade_bf16, tid)
timed("e  3 geo takes (9 cols)", e_geo, geom.tri_v0, geom.tri_e1,
      geom.tri_e2, tid)
timed("f  take32 + materials one-hot", f_mats, scene, shade, tid)
timed("g  attrs verbatim", g_attrs, scene, frag)
timed("h  full _shade", h_shade, scene, frag, cam)
timed("n  null again", n_null, tid)
