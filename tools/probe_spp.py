"""Measure the spp-batching coherence effect on the Sponza-scale frame.

PLAN round-3 item 1b: same-pixel samples are near-identical rays, so a
sample-adjacent spp=S dispatch should shrink the matrix kernel's
per-tile cluster unions (fewer visits) vs S separate 1-spp frames.
Times one frame at each spp and reports honest Mrays/s.

  SPPS=1,4,16 python -u tools/probe_spp.py [atrium_big.glb]
"""
import os
import sys
import time

t00 = time.perf_counter()


def stamp(msg):
    print(f"[{time.perf_counter() - t00:8.1f}s] {msg}", flush=True)


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from hala_tpu.models.integrator import (
    Film, RenderSettings, Uniforms, render_frame,
)
from hala_tpu.scene.cpu.scene import Scene
from hala_tpu.scene.loader.uploader import SceneUploader
from hala_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

asset = sys.argv[1] if len(sys.argv) > 1 else "atrium_big.glb"
path = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets", asset,
)
scene = SceneUploader.upload(Scene.load(path), use_ray_tracing=False)
jax.block_until_ready(scene.geometry.tri_v0)
stamp(f"upload done (clusters={scene.geometry.tri_packed.shape[0]})")

uniforms = Uniforms.default()
spps = [int(s) for s in os.environ.get("SPPS", "1,16").split(",")]
w, hgt = 1920, 1088

for spp in spps:
    settings = RenderSettings(
        width=w, height=hgt, max_depth=4, rr_depth=2,
        tile_size=131072, intersector="auto", sort_rays=True, spp=spp,
    )
    film = Film.create(w, hgt)
    film, rays = render_frame(scene, None, uniforms, film, 0, settings)
    jax.block_until_ready(film.accum)
    stamp(f"spp={spp} compiled")
    t0 = time.perf_counter()
    film, rays = render_frame(scene, None, uniforms, film, 1, settings)
    jax.block_until_ready(film.accum)
    dt = time.perf_counter() - t0
    r = float(rays)
    stamp(
        f"spp={spp}: {dt*1e3:.0f} ms/frame, {r:.0f} rays, "
        f"{r/dt/1e6:.2f} Mrays/s"
    )
