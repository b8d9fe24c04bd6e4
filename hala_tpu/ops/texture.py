"""Manual texture sampling from the padded texture stack.

Role parity: the reference's combined-image-sampler descriptor arrays
with LINEAR/REPEAT samplers (gpu_uploader.rs:334-403). TPUs have no
texture unit, so this is software bilinear with REPEAT wrap over
TextureStack (SURVEY.md section 7 hard-part #4). Mip selection is
deferred to the wavefront stage (primary-visible textures dominate
RMSE; nearest-mip LOD comes with the perf pass).
"""

from __future__ import annotations

import jax.numpy as jnp


def sample_texture(stack, tex_idx: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample: tex_idx (N,) i32 (-1 = none -> white), uv (N,2).

    Returns (N, 4) RGBA. REPEAT addressing on both axes.
    """
    idx = jnp.maximum(tex_idx, 0)
    sizes = jnp.take(stack.sizes, idx, axis=0)  # (N, 2) h, w
    h = sizes[:, 0].astype(jnp.float32)
    w = sizes[:, 1].astype(jnp.float32)
    u = uv[:, 0] - jnp.floor(uv[:, 0])
    v = uv[:, 1] - jnp.floor(uv[:, 1])
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]

    def wrap(c, n):
        return jnp.mod(c.astype(jnp.int32), jnp.maximum(n.astype(jnp.int32), 1))

    x0i, x1i = wrap(x0, w), wrap(x0 + 1, w)
    y0i, y1i = wrap(y0, h), wrap(y0 + 1, h)
    c00 = stack.data[idx, y0i, x0i]
    c01 = stack.data[idx, y0i, x1i]
    c10 = stack.data[idx, y1i, x0i]
    c11 = stack.data[idx, y1i, x1i]
    texel = (
        c00 * (1 - fx) * (1 - fy)
        + c01 * fx * (1 - fy)
        + c10 * (1 - fx) * fy
        + c11 * fx * fy
    )
    return jnp.where((tex_idx >= 0)[:, None], texel, 1.0)
