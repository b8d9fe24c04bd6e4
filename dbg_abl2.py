import time, jax, jax.numpy as jnp
from hala_tpu.models.integrator import Film, RenderSettings, Uniforms, render_frame
from hala_tpu.scene.loader.uploader import SceneUploader
from hala_tpu.scene.procedural import cornell_box
import dataclasses

scene = SceneUploader.upload(cornell_box(), use_ray_tracing=False)
scene_nolight = dataclasses.replace(scene, lights=dataclasses.replace(scene.lights, num_lights=0))
uni = Uniforms.default()

def run(tag, sc, depth, tile=65536):
    s = RenderSettings(width=512, height=512, rr_depth=2, max_depth=depth,
                       tile_size=tile, intersector="pallas")
    film = Film.create(512, 512)
    film, rays = render_frame(sc, None, uni, film, 0, s)
    jax.block_until_ready(rays)
    t0 = time.perf_counter(); R=0.0
    for f in range(1, 9):
        film, rays = render_frame(sc, None, uni, film, f, s)
        R += float(rays)
    jax.block_until_ready(film.accum)
    dt = (time.perf_counter()-t0)/8
    print(f"FRAME {tag}: {dt*1000:.1f} ms ({R/8/dt/1e6:.1f} Mrays/s)", flush=True)

run("d1", scene, 1)
run("d2", scene, 2)
run("d4", scene, 4)
run("d4 noNEE", scene_nolight, 4)
run("d4 tile262k", scene, 4, tile=262144)
