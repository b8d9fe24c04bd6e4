import time, jax, jax.numpy as jnp
from hala_tpu.models.integrator import Film, RenderSettings, Uniforms, render_frame
from hala_tpu.scene.loader.uploader import SceneUploader
from hala_tpu.scene.procedural import cornell_box

scene = SceneUploader.upload(cornell_box(), use_ray_tracing=False)
uni = Uniforms.default()

def run(tag, depth, sync_each, frames=16):
    s = RenderSettings(width=512, height=512, rr_depth=2, max_depth=depth,
                       tile_size=65536, intersector="pallas")
    film = Film.create(512, 512)
    film, rays = render_frame(scene, None, uni, film, 0, s)
    jax.block_until_ready(rays)
    t0 = time.perf_counter(); R = 0.0; rays_list = []
    for f in range(1, frames+1):
        film, rays = render_frame(scene, None, uni, film, f, s)
        if sync_each:
            R += float(rays)
        else:
            rays_list.append(rays)
    jax.block_until_ready(film.accum)
    if not sync_each:
        R = float(sum(rays_list))
    dt = (time.perf_counter()-t0)/frames
    print(f"FRAME {tag}: {dt*1000:.1f} ms ({R/frames/dt/1e6:.1f} Mrays/s)", flush=True)

run("d4 sync-each", 4, True)
run("d4 async", 4, False)
run("d1 async", 1, False)
