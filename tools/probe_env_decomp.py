"""Envmap-config frame decomposition: where do the remaining ms go?

Reruns the exact bench_envmap workload with one env-path stage
replaced by a constant-cost stub, so the delta against `full` prices
that stage. One variant per process (render_frame's jit cache would
otherwise reuse the first trace across monkeypatched variants).

  python -u tools/probe_env_decomp.py full          # as benched
  python -u tools/probe_env_decomp.py cheap_sample  # env_sample -> const
  python -u tools/probe_env_decomp.py cheap_eval    # env_eval -> const
  python -u tools/probe_env_decomp.py no_env_nee    # env NEE candidates off
"""
import os
import sys
import time

t00 = time.perf_counter()


def stamp(msg):
    print(f"[{time.perf_counter() - t00:8.1f}s] {msg}", flush=True)


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

variant = sys.argv[1] if len(sys.argv) > 1 else "full"

from hala_tpu.envmap import EnvMap
from hala_tpu.models import integrator as I
from hala_tpu.scene.loader.uploader import SceneUploader
from hala_tpu.scene.procedural import cornell_box

rs = np.random.RandomState(7)
rgb = rs.uniform(0.05, 0.3, (64, 128, 3)).astype(np.float32)
rgb[20:26, 40:48] = 60.0
env = EnvMap.from_array(rgb)
scene = SceneUploader.upload(
    cornell_box(light_intensity=0.0), use_ray_tracing=False
)
settings = I.RenderSettings(
    width=512, height=512, max_depth=4, rr_depth=2, tile_size=65536,
    env_type=I.ENV_MAP, intersector="auto",
)

if variant == "cheap_sample":
    fixed = jnp.asarray([0.0995, 0.995, 0.0], jnp.float32)

    def env_sample(env_, rnd, rotation, intensity):
        n = rnd.shape[0]
        wi = jnp.broadcast_to(fixed, (n, 3))
        rad = jnp.full((n, 3), 2.0) * intensity
        return wi, rad, jnp.full((n,), 0.25)

    I.env_sample = env_sample
elif variant == "cheap_eval":
    def env_eval(env_, d, rotation, intensity):
        n = d.shape[0]
        return jnp.full((n, 3), 2.0) * intensity, jnp.full((n,), 0.25)

    I.env_eval = env_eval
elif variant == "no_env_nee":
    def env_sample(env_, rnd, rotation, intensity):
        n = rnd.shape[0]
        wi = jnp.broadcast_to(
            jnp.asarray([0.0, 1.0, 0.0], jnp.float32), (n, 3)
        )
        return wi, jnp.zeros((n, 3)), jnp.zeros((n,))  # pdf 0: no cand_e

    I.env_sample = env_sample

stamp(f"variant={variant}; starting frame 0 (compile)")
uniforms = I.Uniforms.default()
film = I.Film.create(settings.width, settings.height)
film, rays = I.render_frame(scene, env, uniforms, film, 0, settings)
jax.block_until_ready(rays)
stamp(f"frame 0 done, rays={int(rays)}")

frames = 16
rays_acc = []
t0 = time.perf_counter()
for f in range(1, 1 + frames):
    film, rays = I.render_frame(scene, env, uniforms, film, f, settings)
    rays_acc.append(rays)
jax.block_until_ready(film.accum)
dt = time.perf_counter() - t0
r = float(sum(rays_acc))
stamp(
    f"{variant}: {dt / frames * 1e3:.2f} ms/frame, "
    f"{r / dt / 1e6:.2f} Mrays/s (rays counter incl. variant skew)"
)
