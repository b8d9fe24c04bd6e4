"""Per-dispatch overhead attribution on the axon tunnel.

The honest-timing bench re-baseline (round-5) fits cornell/ggx to
frame_cost ~ F + c*rays with F ~ 28 ms FIXED per frame program. This
probe isolates F's source: dispatch latency vs pytree-arg marshaling
vs program size, by timing 32 back-to-back dispatches (one trailing
scalar fetch) of:

  a) trivial jit, 1 scalar arg
  b) trivial jit, the full DeviceScene pytree as arg (~100 buffers)
  c) trivial jit, 8 array args
  d) the real cornell render_frame (control; should be ~33 ms/frame)
  e) render_frame with reps=1 (is the first dispatch more expensive?)

  python -u tools/probe_dispatch.py
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

from hala_tpu.models.integrator import (
    Film, RenderSettings, Uniforms, render_frame,
)
from hala_tpu.scene.loader.uploader import SceneUploader
from hala_tpu.scene.procedural import cornell_box

scene = SceneUploader.upload(cornell_box(), use_ray_tracing=False)
jax.block_until_ready(scene.geometry.tri_v0)
leaves = jax.tree_util.tree_leaves(scene)
stamp(f"upload done ({len(leaves)} scene leaves)")

settings = RenderSettings(
    width=512, height=512, max_depth=4, rr_depth=2, tile_size=65536,
    intersector="auto",
)
uniforms = Uniforms.default()


def timed(tag, fn, reps=32):
    v = float(fn())           # warm + drain
    t0 = time.perf_counter()
    for _ in range(reps - 1):
        fn()
    v = float(fn())
    dt = (time.perf_counter() - t0) / reps
    stamp(f"{tag}: {dt*1e3:.2f} ms/dispatch")


x = jnp.float32(1.0)
f_scalar = jax.jit(lambda a: a + 1.0)
timed("a) trivial, 1 scalar arg", lambda: f_scalar(x))

f_scene = jax.jit(
    lambda s, a: a + s.geometry.tri_v0[0, 0] * 0.0
)
timed("b) trivial, full scene pytree arg", lambda: f_scene(scene, x))

g = scene.geometry
f_8 = jax.jit(
    lambda v0, e1, e2, nm, tg, uv, tm, a: a + v0[0, 0] * 0.0
)
timed(
    "c) trivial, 7 array args",
    lambda: f_8(
        g.tri_v0, g.tri_e1, g.tri_e2, g.normals, g.tangents, g.uvs,
        g.tri_mat, x,
    ),
)

film = Film.create(settings.width, settings.height)


def frame():
    global film
    film, rays = render_frame(
        scene, None, uniforms, film, 0, settings
    )
    return rays


timed("d) cornell render_frame", frame, reps=16)
timed("e) cornell render_frame reps=4", frame, reps=4)
# f) the same 16 dispatches, but measure the pure dispatch (no fetch)
t0 = time.perf_counter()
for _ in range(16):
    frame()
stamp(f"f) 16 dispatches, host-side only: "
      f"{(time.perf_counter()-t0)/16*1e3:.2f} ms/dispatch")
v = float(frame())
stamp("drained")
