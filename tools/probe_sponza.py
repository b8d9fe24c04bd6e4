"""Instrumented sponza-config probe: where do the minutes go?

Prints a timestamped line after each stage (load, upload, first-frame
compile+run, steady frames) so a timeout kill still tells us which
stage was live. Run: timeout 5400 python -u tools/probe_sponza.py
"""
import os
import sys
import time

t00 = time.perf_counter()


def stamp(msg):
    print(f"[{time.perf_counter() - t00:8.1f}s] {msg}", flush=True)


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from hala_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from hala_tpu.models.integrator import Film, RenderSettings, Uniforms, render_frame
from hala_tpu.scene.cpu.scene import Scene
from hala_tpu.scene.loader.uploader import SceneUploader

stamp("imports done")

asset = sys.argv[1] if len(sys.argv) > 1 else "atrium_big.glb"
width = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
height = int(sys.argv[3]) if len(sys.argv) > 3 else 1088
intersector = sys.argv[4] if len(sys.argv) > 4 else "auto"

path = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets", asset,
)
cpu_scene = Scene.load(path)
stamp(f"Scene.load done ({len(cpu_scene.meshes)} meshes)")

scene = SceneUploader.upload(cpu_scene, use_ray_tracing=False)
jax.block_until_ready(scene.geometry.tri_v0)
stamp(f"upload done (clusters={scene.geometry.cluster_min.shape[0]})")

settings = RenderSettings(
    width=width, height=height, max_depth=4, rr_depth=2,
    tile_size=131072, intersector=intersector, sort_rays=True,
)
stamp(f"config: {asset} {width}x{height} intersector={intersector}")
uniforms = Uniforms.default()
film = Film.create(settings.width, settings.height)
stamp("film created; starting frame 0 (compile)")

film, rays = render_frame(scene, None, uniforms, film, 0, settings)
jax.block_until_ready(rays)
stamp(f"frame 0 done (compile+run), rays={int(rays)}")

for f in range(1, 4):
    t0 = time.perf_counter()
    film, rays = render_frame(scene, None, uniforms, film, f, settings)
    jax.block_until_ready(film.accum)
    dt = time.perf_counter() - t0
    r = int(rays)
    stamp(f"frame {f}: {dt*1e3:.1f} ms, rays={r}, {r/dt/1e6:.1f} Mrays/s")

import numpy as np

acc = np.asarray(film.accum)
alb = np.asarray(film.albedo)
stamp(
    f"film accum mean={acc.mean():.5f} max={acc.max():.3f} "
    f"albedo mean={alb.mean():.5f} nonzero={float((acc[..., :3] > 0).mean()):.4f}"
)
