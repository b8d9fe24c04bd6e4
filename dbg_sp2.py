import time, jax, jax.numpy as jnp, numpy as np
from hala_tpu.models.integrator import Film, RenderSettings, Uniforms, render_frame
from hala_tpu.scene.loader.uploader import SceneUploader
from hala_tpu.scene.procedural import sponza_like

scene = SceneUploader.upload(sponza_like(rooms=(8,8), columns_per_room=4, boxes_per_room=20), use_ray_tracing=False)
print(f"UPLOAD {scene.geometry.num_triangles} tris", flush=True)
uni = Uniforms.default()

def run(tag, **kw):
    s = RenderSettings(width=512, height=512, rr_depth=2, max_depth=4,
                       tile_size=65536, intersector="cluster", **kw)
    film = Film.create(512, 512)
    film, rays = render_frame(scene, None, uni, film, 0, s)
    jax.block_until_ready(rays)
    acc = []
    t0 = time.perf_counter()
    for f in range(1, 9):
        film, rays = render_frame(scene, None, uni, film, f, s)
        acc.append(rays)
    jax.block_until_ready(film.accum)
    dt = (time.perf_counter()-t0)/8
    R = float(sum(acc))/8
    print(f"PERF {tag}: {R/dt/1e6:.1f} Mrays/s ({dt*1000:.1f} ms/frame)", flush=True)

run("sponza async")
run("sponza async sorted", sort_rays=True)
