"""Wavefront ray stream compaction + coherence sorting.

SURVEY.md section 7 stage 5: the reference's SIMT hardware hides ray
divergence per-lane; on TPU the equivalent is reordering the ray stream
so (a) dead rays sink to the end (compaction) and (b) live rays with
similar direction/origin share culling blocks (coherence), which is what
makes the cluster-streaming intersector's block-level candidate lists
tight for bounce rays. One `jax.lax.sort`-backed argsort per bounce,
key = [dead | direction octant | origin Morton cell].
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .morton import morton3d


class RayOrder(NamedTuple):
    order: jnp.ndarray      # (N,) i32 — permutation old->sorted
    inverse: jnp.ndarray    # (N,) i32 — scatter sorted results back
    num_alive: jnp.ndarray  # () i32


def sort_rays(
    o: jnp.ndarray,
    d: jnp.ndarray,
    active: jnp.ndarray,
    scene_min,
    scene_max,
    cell_bits: int = 9,
) -> RayOrder:
    """Coherence key sort. Returns the permutation and its inverse."""
    octant = (
        (d[:, 0] >= 0).astype(jnp.uint32)
        | ((d[:, 1] >= 0).astype(jnp.uint32) << 1)
        | ((d[:, 2] >= 0).astype(jnp.uint32) << 2)
    )
    cell = morton3d(o, scene_min, scene_max) >> jnp.uint32(30 - cell_bits * 3)
    key = (
        ((~active).astype(jnp.uint32) << 31)
        | (octant << 27)
        | (cell & jnp.uint32((1 << 27) - 1))
    )
    order = jnp.argsort(key).astype(jnp.int32)
    n = o.shape[0]
    inverse = (
        jnp.zeros((n,), jnp.int32)
        .at[order]
        .set(jnp.arange(n, dtype=jnp.int32))
    )
    return RayOrder(
        order=order,
        inverse=inverse,
        num_alive=jnp.sum(active.astype(jnp.int32)),
    )


def permute(order: jnp.ndarray, *arrays):
    """Apply a permutation to any number of ray-major arrays."""
    out = tuple(jnp.take(a, order, axis=0) for a in arrays)
    return out if len(out) > 1 else out[0]
