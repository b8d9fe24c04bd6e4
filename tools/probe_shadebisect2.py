"""Stage-2 bisect: probe_shadebisect measured the verbatim attrs-mode
_shade prefix at 0.09 ms as its own jit, yet probe_raster_stages put
lighting[attrs] at 131 ms. Reproduce lighting_pass in THIS harness and
peel its suffix (full _shade, reshapes, dict) to find the disagreement.

  python -u tools/probe_shadebisect2.py
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
    RasterSettings, _shade, gbuffer_pass, lighting_pass,
)
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
cam = jnp.int32(0)
stamp(f"gbuffer done (N={frag.tri.shape[0]})")


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


# 1) lighting_pass exactly as the stage probe calls it
timed("lighting_pass (probe style)",
      lambda: lighting_pass(scene, frag, cam, settings, None))


# 2) full _shade as its own jit, flat outputs (no reshape, no dict)
@jax.jit
def shade_flat(scene, frag, cam):
    return _shade(scene, frag, scene.cameras.position[cam])


timed("full _shade flat outputs", lambda: shade_flat(scene, frag, cam))


# 3) full _shade + the reshapes (lighting_pass body minus the dict)
@jax.jit
def shade_reshaped(scene, frag, cam):
    h, w = 1088, 1920
    color, albedo, normal, _ = _shade(
        scene, frag, scene.cameras.position[cam]
    )
    return (
        color.reshape(h, w, 3),
        albedo.reshape(h, w, 3),
        normal.reshape(h, w, 3),
        frag.depth.reshape(h, w),
    )


timed("full _shade + reshapes", lambda: shade_reshaped(scene, frag, cam))

# 4) lighting_pass again (order control)
timed("lighting_pass again", lambda: lighting_pass(scene, frag, cam, settings, None))

# 5) lighting_pass with reps=50 (amortize any per-call fixed cost)
timed("lighting_pass reps=50",
      lambda: lighting_pass(scene, frag, cam, settings, None), reps=50)
