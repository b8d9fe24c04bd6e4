"""Cross-process persistent-cache timing for the real _stage_extend.

Compiles the sponza-shape extend stage and prints wall time + the
persistent cache DEBUG hit/miss lines. Run twice in fresh processes:
a HIT makes the second run's compile collapse to cache-read time
(VERDICT round-3 item 7: record the warm-start number).

  python -u tools/probe_cache2.py
"""
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.WARNING, stream=sys.stdout)
logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)

import jax
import jax.numpy as jnp

from hala_tpu.models import integrator as I
from hala_tpu.scene.cpu.scene import Scene
from hala_tpu.scene.loader.uploader import SceneUploader
from hala_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

t00 = time.perf_counter()
path = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets", "atrium_big.glb",
)
scene = SceneUploader.upload(Scene.load(path), use_ray_tracing=False)
jax.block_until_ready(scene.geometry.tri_v0)
print(f"[cache2] upload {time.perf_counter() - t00:.1f}s", flush=True)

settings = I.RenderSettings(
    width=1920, height=1088, max_depth=4, rr_depth=2, tile_size=131072,
    sort_rays=True, intersector="matrix",
)
n = 131072
key = jax.random.PRNGKey(0)
o = jax.random.uniform(key, (n, 3), jnp.float32, -5.0, 5.0)
d = jax.random.normal(jax.random.PRNGKey(1), (n, 3), jnp.float32)
d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
tm = jnp.full((n,), 1e7, jnp.float32)
jax.block_until_ready(tm)

t0 = time.perf_counter()
hit = I._stage_extend(scene, o, d, tm, settings)
jax.block_until_ready(hit.t)
print(f"[cache2] _stage_extend compile+run {time.perf_counter() - t0:.1f}s",
      flush=True)
