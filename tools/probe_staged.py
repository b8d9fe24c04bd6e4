"""Measure the staged frame dispatcher at Sponza scale on the real TPU.

Three questions, in order of value:
1. Does the wavefront compile INSIDE a staged frame (it never finished
   inside the megakernel frame jit — DESIGN.md round-3 ledger)?
2. Frame time: staged matrix+wavefront-shadows vs staged matrix-only
   vs the megakernel matrix baseline.
3. Cold-compile time of each variant (the megakernel 1080p frame costs
   ~4 min; staged splits it into ~8 small programs).

  MODES=mega_matrix,staged_matrix,staged_wf python -u tools/probe_staged.py
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
    Film, RenderSettings, Uniforms, render_frame, render_frame_staged,
)
from hala_tpu.scene.cpu.scene import Scene
from hala_tpu.scene.loader.uploader import SceneUploader
from hala_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

asset = os.environ.get("ASSET", "atrium_big.glb")
path = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets", asset,
)
scene = SceneUploader.upload(Scene.load(path), use_ray_tracing=False)
jax.block_until_ready(scene.geometry.tri_v0)
stamp(f"upload done (clusters={scene.geometry.tri_packed.shape[0]})")

uniforms = Uniforms.default()
w, hgt = 1920, 1088
spp = int(os.environ.get("SPP", "1"))

base = dict(
    width=w, height=hgt, max_depth=4, rr_depth=2, tile_size=131072,
    sort_rays=True, spp=spp,
)
MODES = {
    "mega_matrix": (render_frame, RenderSettings(**base, intersector="matrix")),
    "staged_matrix": (
        render_frame_staged, RenderSettings(**base, intersector="matrix")
    ),
    "staged_wf": (
        render_frame_staged,
        RenderSettings(
            **base, intersector="matrix", shadow_intersector="wavefront"
        ),
    ),
    "staged_wf_all": (
        render_frame_staged, RenderSettings(**base, intersector="wavefront")
    ),
}

for mode in os.environ.get(
    "MODES", "staged_matrix,staged_wf,mega_matrix"
).split(","):
    fn, settings = MODES[mode]
    film = Film.create(w, hgt)
    t0 = time.perf_counter()
    film, rays = fn(scene, None, uniforms, film, 0, settings)
    jax.block_until_ready(film.accum)
    stamp(f"{mode}: cold (compile+frame) {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    film, rays = fn(scene, None, uniforms, film, 1, settings)
    jax.block_until_ready(film.accum)
    dt = time.perf_counter() - t0
    r = float(rays)
    stamp(
        f"{mode}: {dt*1e3:.0f} ms/frame, {r:.0f} rays, "
        f"{r/dt/1e6:.2f} Mrays/s"
    )
