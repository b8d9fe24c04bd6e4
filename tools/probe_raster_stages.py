"""Per-stage decomposition of the 244 ms atrium_big raster frame
(VERDICT round-4 item 4): time bin+visibility (gbuffer_pass), shading
(lighting_pass), post (tonemap), and the fused forward frame, each as
its own dispatch at the bench config (1080p, binned tile=64).

  python -u tools/probe_raster_stages.py
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

from hala_tpu.models.rz_renderer import (
    RasterSettings, gbuffer_pass, lighting_pass, raster_frame,
)
from hala_tpu.ops.tonemap import tonemap_aces_simple
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
fwd_settings = RasterSettings(width=1920, height=1088, binned=True, tile=64)
cam = jnp.int32(0)


def timed(tag, fn, reps=10):
    out = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps
    stamp(f"{tag}: {dt*1e3:.2f} ms")
    return out


frag = timed("gbuffer (bin+visibility)",
             lambda: gbuffer_pass(scene, cam, settings, None))
out = timed("lighting (shade)",
            lambda: lighting_pass(scene, frag, cam, settings, None))
color = out[0]
timed("post (tonemap)", lambda: jax.jit(tonemap_aces_simple)(color))
timed("forward fused frame",
      lambda: raster_frame(scene, cam, fwd_settings, None))

# Shade-stage bisection: _shade reads HALA_SHADE_PROBE at trace time;
# a varied (unused-in-lighting) static field forces a fresh trace per
# mode without reloading the module.
for i, mode in enumerate(("attrs", "notex", "nolight")):
    os.environ["HALA_SHADE_PROBE"] = mode
    s_m = RasterSettings(width=1920, height=1088, binned=True,
                         tile=64, deferred=True, bin_k_max=257 + i)
    timed(f"lighting[{mode}]",
          lambda s_m=s_m: lighting_pass(scene, frag, cam, s_m, None))
os.environ.pop("HALA_SHADE_PROBE", None)
