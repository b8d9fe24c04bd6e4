"""Diff _stage_extend's lowered StableHLO across fresh processes.

probe_cache.py proved the persistent-cache key components are stable
for an identical computation, yet four distinct jit__stage_extend
entries exist for one config — so the lowered module itself must vary
across processes (a non-deterministic constant or ordering in the
traced scene). This dumps the StableHLO text; run twice and diff.

  python -u tools/probe_cache_hlo.py out/probe_logs/r4/hlo_a.txt
  python -u tools/probe_cache_hlo.py out/probe_logs/r4/hlo_b.txt
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hala_tpu.models import integrator as I
from hala_tpu.scene.cpu.scene import Scene
from hala_tpu.scene.loader.uploader import SceneUploader

out_path = sys.argv[1]
path = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets", "atrium_big.glb",
)
scene = SceneUploader.upload(Scene.load(path), use_ray_tracing=False)
settings = I.RenderSettings(
    width=1920, height=1088, max_depth=4, rr_depth=2, tile_size=131072,
    sort_rays=True, intersector="matrix",
)
n = 131072
o = jax.ShapeDtypeStruct((n, 3), jnp.float32)
d = jax.ShapeDtypeStruct((n, 3), jnp.float32)
tm = jax.ShapeDtypeStruct((n,), jnp.float32)
lowered = I._stage_extend.lower(scene, o, d, tm, settings)
text = lowered.as_text()
with open(out_path, "w") as f:
    f.write(text)
print(f"[probe_cache_hlo] wrote {len(text)} chars to {out_path}",
      flush=True)
