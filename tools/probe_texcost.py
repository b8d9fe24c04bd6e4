"""Is software texture sampling a material share of the shade stages?

Times the integrator's per-shade texture workload — 3 trilinear
sample_texture calls (base/metallic-roughness/emission, 8 row takes
each) + 1 bilinear normal-map fetch (4 takes) = 28 gathered rows per
ray — at the frame-tile population (524288 rays) against an
atrium-shaped stack (2 textures, 128x128, 8 packed mip levels), on the
real TPU. If the measured per-dispatch cost is small vs the ~200 ms
pre-stage share, quad-packing the bilinear corners is not worth its 4x
stack memory; if it is tens of ms, it is the next shading lever.

  timeout 1200 python -u tools/probe_texcost.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hala_tpu.ops.texture import sample_texture
from hala_tpu.scene.gpu.scene import TextureStack
from hala_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

N = int(os.environ.get("N", str(524288)))
ITERS = int(os.environ.get("ITERS", "16"))

rng = np.random.default_rng(0)
data = rng.random((2, 256, 128, 4), np.float32)
stack = TextureStack(
    data=jnp.asarray(data),
    sizes=jnp.asarray(np.array([[128, 128], [128, 128]], np.int32)),
    num_levels=8,
)

uv = jnp.asarray(rng.random((N, 2), np.float32) * 4.0 - 2.0)
# sample_texture adds log2(width)=7 then clamps to num_levels-1=7, so a
# [0,6] draw parked every sample on the top mip (l0==l1, ADVICE r4):
# draw in [-7,0] so the trilinear path lerps distinct bracketing levels.
lod = jnp.asarray(rng.random((N,), np.float32) * 7.0 - 7.0)
idx = jnp.asarray(rng.integers(0, 2, N).astype(np.int32))


@jax.jit
def shade_tex(uv, lod, idx):
    def body(c, _):
        uv2 = uv + c * 1e-6  # new values each iter; same shapes
        acc = sample_texture(stack, idx, uv2, lod)          # base
        acc = acc + sample_texture(stack, idx, uv2, lod)    # mr
        acc = acc + sample_texture(stack, idx, uv2, lod)    # emission
        acc = acc + sample_texture(stack, idx, uv2)         # normal map
        return c + jnp.sum(acc) * 0.0 + 1.0, jnp.sum(acc)
    c, sums = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
    return jnp.sum(sums)


t0 = time.perf_counter()
out = shade_tex(uv, lod, idx)
jax.block_until_ready(out)
print(f"cold (compile+run) {time.perf_counter() - t0:.1f}s", flush=True)

t0 = time.perf_counter()
out = shade_tex(uv, lod, idx)
jax.block_until_ready(out)
dt = time.perf_counter() - t0
per = dt / ITERS * 1e3
print(
    f"warm {dt * 1e3:.1f} ms total, {per:.2f} ms per shade-stage texture "
    f"workload ({N} rays, 28 gathered rows/ray -> "
    f"{N * 28 / (dt / ITERS) / 1e9:.2f} Grows/s)",
    flush=True,
)
