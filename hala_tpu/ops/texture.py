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


def sample_texture(
    stack, tex_idx: jnp.ndarray, uv: jnp.ndarray, lod_uv=None
) -> jnp.ndarray:
    """Bilinear sample: tex_idx (N,) i32 (-1 = none -> white), uv (N,2).

    Returns (N, 4) RGBA. REPEAT addressing on both axes. `lod_uv` is an
    optional per-ray log2 footprint in UV units; the sampler adds
    log2(texture width) and bilinearly fetches from the nearest packed
    mip level (nearest-level selection; trilinear is a round-2 knob).
    """
    idx = jnp.maximum(tex_idx, 0)
    sizes = jnp.take(stack.sizes, idx, axis=0)  # (N, 2) h, w (level 0)
    h0 = sizes[:, 0].astype(jnp.int32)
    w0 = sizes[:, 1].astype(jnp.int32)
    max_h = stack.data.shape[1] // 2

    if lod_uv is not None and stack.num_levels > 1:
        lod = lod_uv + jnp.log2(jnp.maximum(w0.astype(jnp.float32), 1.0))
        level = jnp.clip(
            jnp.round(lod).astype(jnp.int32), 0, stack.num_levels - 1
        )
    else:
        level = jnp.zeros_like(h0)
    lh = jnp.maximum(h0 >> level, 1)
    lw = jnp.maximum(w0 >> level, 1)
    # packed pyramid row offset: sum_{k<l} max_h >> k = 2*max_h*(1 - 2^-l)
    row_off = 2 * max_h - (jnp.int32(2 * max_h) >> level)

    h = lh.astype(jnp.float32)
    w = lw.astype(jnp.float32)
    u = uv[:, 0] - jnp.floor(uv[:, 0])
    v = uv[:, 1] - jnp.floor(uv[:, 1])
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]

    def wrap(c, n):
        return jnp.mod(c.astype(jnp.int32), jnp.maximum(n, 1))

    x0i, x1i = wrap(x0, lw), wrap(x0 + 1, lw)
    y0i = wrap(y0, lh) + row_off
    y1i = wrap(y0 + 1, lh) + row_off
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
