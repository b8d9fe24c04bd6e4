"""Dump the lowered (pre-optimization) HLO of lighting_pass at the
1080p atrium_big shapes to a file, to diff across processes — bisect2
measured the same nominal program at 2080 ms where raster_stages got
155 ms, with a 9x compile-time gap, so either the HLO differs between
harnesses or TPU compilation is nondeterministic.

  python -u tools/probe_lighting_hlo.py out/hlo_A.txt
Lowering is host-side only (jit.lower without compile) — safe to run
without touching the TPU.
"""
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")  # lowering only; keep off the TPU

from hala_tpu.models.rz_renderer import RasterSettings, lighting_pass
from hala_tpu.ops.raster import FragmentBuffer
from hala_tpu.scene.cpu.scene import Scene
from hala_tpu.scene.loader.uploader import SceneUploader

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
scene = SceneUploader.upload(
    Scene.load(os.path.join(root, "assets", "atrium_big.glb")),
    use_ray_tracing=False,
)
settings = RasterSettings(
    width=1920, height=1088, binned=True, tile=64, deferred=True,
)
n = 1920 * 1088
frag = FragmentBuffer(
    depth=jnp.zeros((n,), jnp.float32),
    tri=jnp.zeros((n,), jnp.int32),
    u=jnp.zeros((n,), jnp.float32),
    v=jnp.zeros((n,), jnp.float32),
)
lowered = lighting_pass.lower(scene, frag, jnp.int32(0), settings, None)
text = lowered.as_text()
out = sys.argv[1] if len(sys.argv) > 1 else "out/hlo_lighting.txt"
with open(out, "w") as f:
    f.write(text)
print(f"{out}: {len(text)} chars, sha256 "
      f"{hashlib.sha256(text.encode()).hexdigest()[:16]}")
