"""Compile-variance experiment for the 155 ms vs 2080 ms lighting_pass
discrepancy (shadebisect2 vs raster_stages_s2, identical HLO proven by
probe_lighting_hlo sha256 match).

In ONE process, on a quiet host:
  1. compile + measure lighting_pass (may deserialize from xla_cache);
  2. force a SECOND independent compile of the same math (a traced
     no-op +0.0*k on the camera index changes the cache key, dead after
     optimization) and measure it;
  3. repeat (3 variants total).
If executables from different compiles differ several-x in runtime,
TPU compilation of this program is nondeterministic; if all agree, the
bisect2 2080 ms run was environmental (tunnel/device state).

  python -u tools/probe_lighting_var.py
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
    t_c = time.perf_counter()
    out = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    stamp(f"{tag}: first call {time.perf_counter() - t_c:.1f} s")
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps
    stamp(f"{tag}: {dt*1e3:.2f} ms")
    return out


timed("v0 lighting_pass (cache path)",
      lambda: lighting_pass(scene, frag, cam, settings, None))

for k in (1, 2):
    @jax.jit
    def variant(scene, frag, cam, _k=k):
        # dead +_k-_k on the traced scalar keeps the math identical but
        # forces a distinct pre-optimization HLO -> independent compile
        cam2 = cam + jnp.int32(_k) - jnp.int32(_k)
        return _shade(scene, frag, scene.cameras.position[cam2])

    timed(f"v{k} fresh-compile _shade", lambda v=variant: v(scene, frag, cam))
