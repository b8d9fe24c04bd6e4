"""Measure the binned raster paths at the bench config (atrium_big,
1080p, tile=64): exact Pallas segment kernel vs capped scatter table vs
the full-scan reference. Reports ms/frame for the visibility pass alone
(gbuffer_pass) and the full renderer update().

  python -u tools/probe_raster.py [atrium_big.glb]
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

from hala_tpu.ops.raster import (
    _rasterize_tiled_scatter, clip_to_screen, rasterize_tiled,
    transform_vertices,
)
from hala_tpu.ops.raster_kernel import rasterize_tiled_exact
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
geom = scene.geometry
W, H = 1920, 1088

view = scene.cameras.view_matrix[0]
proj = scene.cameras.proj_matrix[0]
vp = proj @ view


@jax.jit
def project():
    v0 = geom.tri_v0
    corners = jnp.stack([v0, v0 + geom.tri_e1, v0 + geom.tri_e2], axis=1)
    clip = transform_vertices(corners.reshape(-1, 3), vp).reshape(-1, 3, 4)
    screen, depth, inv_w = clip_to_screen(clip, W, H)
    valid = (geom.tri_mat >= 0) & jnp.all(clip[..., 3] > 1e-6, axis=-1)
    return screen, depth, inv_w, valid


screen, depth, inv_w, valid = jax.block_until_ready(project())
stamp(f"projected {screen.shape[0]} tris")


def timed(tag, fn, reps=10):
    out = jax.block_until_ready(fn())
    stamp(f"{tag}: compiled")
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    stamp(f"{tag}: {dt:.2f} ms")
    return out


fe, ove = timed(
    "exact segment kernel",
    lambda: rasterize_tiled_exact(
        screen, depth, inv_w, valid, W, H, tile=64
    ),
)
stamp(f"  exact overflow={float(ove)} covered={float((np.asarray(fe.tri) >= 0).mean()):.3f}")

fs, ovs = timed(
    "scatter table (capped)",
    lambda: _rasterize_tiled_scatter(
        screen, depth, inv_w, valid, W, H, 64, 256
    ),
)
stamp(f"  scatter overflow={float(ovs):.3f}")
agree = float((np.asarray(fs.tri) == np.asarray(fe.tri)).mean())
stamp(f"  scatter-vs-exact tri agreement: {agree:.4f}")

# full renderer update (shading included), exact path via auto-routing
from hala_tpu.models.rz_renderer import RasterizationRenderer

r = RasterizationRenderer("probe", W, H, binned=True, tile=64)
r.set_scene(Scene.load(path))
r.commit()
r.update()
jax.block_until_ready(r.color)
stamp("renderer compiled")
t0 = time.perf_counter()
for _ in range(10):
    r.update()
jax.block_until_ready(r.color)
stamp(f"renderer update(): {(time.perf_counter() - t0) / 10 * 1e3:.2f} ms/frame")
