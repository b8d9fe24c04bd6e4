import time, jax, jax.numpy as jnp
from hala_tpu.models.integrator import Film, RenderSettings, Uniforms, render_frame
from hala_tpu.scene.loader.uploader import SceneUploader
from hala_tpu.scene.procedural import cornell_box

scene = SceneUploader.upload(cornell_box(), use_ray_tracing=False)
uni = Uniforms.default()
s = RenderSettings(width=512, height=512, rr_depth=2, max_depth=4,
                   tile_size=65536, intersector="pallas")
film = Film.create(512, 512)
t0 = time.perf_counter()
film, rays = render_frame(scene, None, uni, film, 0, s)
jax.block_until_ready(rays)
print(f"COMPILE {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter(); R = 0.0
for f in range(1, 9):
    film, rays = render_frame(scene, None, uni, film, f, s)
    R += float(rays)
jax.block_until_ready(film.accum)
dt = time.perf_counter() - t0
print(f"PERF cornell d4: {R/dt/1e6:.2f} Mrays/s ({dt/8*1000:.1f} ms/frame)", flush=True)
