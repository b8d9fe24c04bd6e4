"""Shared probe harness: cached realistic bounce rays for the atrium.

Uses the chunked brute-force intersector to generate the hit points
(compiles in seconds, unlike the matrix kernel whose compile is C- and
shape-dependent) and caches the resulting ray batch on disk so repeated
probes skip generation entirely.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 131072
_CACHE = "/tmp/wf_bounce_cache"


_SUMS = {}


def _force(out):
    """True completion barrier: jax.block_until_ready on axon can
    return BEFORE execution finishes (round-5 shadecum finding:
    identical cached programs 0.07 ms vs 135 ms depending on queue
    state) — only a scalar host fetch is trustworthy. Jitted sum of
    the first leaf (eager ops on axon wedge); compile is cached per
    shape and runs outside the timed region's per-iter path."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    key = (leaf.shape, str(leaf.dtype))
    if key not in _SUMS:
        _SUMS[key] = jax.jit(
            lambda a: jnp.sum(a.astype(jnp.float32))
        )
    return float(_SUMS[key](leaf))


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"PROBE {name}: {dt*1000:.3f} ms", flush=True)
    return out


def load_scene(name="atrium.glb"):
    from hala_tpu.scene.cpu.scene import Scene
    from hala_tpu.scene.loader.uploader import SceneUploader

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene = SceneUploader.upload(
        Scene.load(os.path.join(root, "assets", name)),
        use_ray_tracing=False,
    )
    g = scene.geometry
    print(f"SCENE {name} tris={g.num_triangles} "
          f"clusters={g.tri_packed.shape[0]}", flush=True)
    return scene


def bounce_rays(scene, tag="atrium", n=N):
    """(o, d) for n diffuse bounce rays + (p, sd, st) shadow rays toward
    a fixed point light; cached on disk per tag."""
    os.makedirs(_CACHE, exist_ok=True)
    paths = [os.path.join(_CACHE, f"{tag}_{a}.npy")
             for a in ("o", "d", "p", "sd", "st")]
    if all(os.path.exists(p) for p in paths):
        arrs = [jnp.asarray(np.load(p)) for p in paths]
        print("BOUNCE cache hit", flush=True)
        return arrs

    from hala_tpu.ops import rng
    from hala_tpu.ops.camera import generate_rays
    from hala_tpu.ops.intersect import intersect_bruteforce
    from hala_tpu.ops.sampling import build_basis, normalize

    g = scene.geometry

    @jax.jit
    def make():
        pix = jnp.arange(n, dtype=jnp.int32)
        px = (pix % 512).astype(jnp.float32)
        # spread rows over the whole 1024-row film
        py = (pix // 512).astype(jnp.float32) * (1024.0 / (n / 512))
        r = rng.sample4(pix, jnp.uint32(0), 0, seed=1)
        o, d = generate_rays(
            scene.cameras, jnp.int32(0), px, py, 512, 1024,
            r[:, :2], r[:, 2:],
        )
        # small chunk: the default 2048 materializes (N, chunk, 3)
        # intermediates measured in the GB at 131k rays
        hit = intersect_bruteforce(
            o, d, g.tri_v0, g.tri_e1, g.tri_e2, chunk=128
        )
        tid = jnp.maximum(hit.tri, 0)
        e1 = jnp.take(g.tri_e1, tid, axis=0)
        e2 = jnp.take(g.tri_e2, tid, axis=0)
        nrm = normalize(jnp.cross(e1, e2))
        nrm = jnp.where(jnp.sum(nrm * d, -1, keepdims=True) > 0, -nrm, nrm)
        ok = hit.tri >= 0
        p = o + hit.t[:, None] * d + nrm * 1e-4
        r2 = rng.sample4(pix, jnp.uint32(0), 1, seed=2)
        t_b, b_b = build_basis(nrm)
        phi = 2.0 * jnp.pi * r2[:, 0]
        st_ = jnp.sqrt(r2[:, 1])
        ct = jnp.sqrt(jnp.maximum(1.0 - r2[:, 1], 0.0))
        wi = ((jnp.cos(phi) * st_)[:, None] * t_b
              + (jnp.sin(phi) * st_)[:, None] * b_b + ct[:, None] * nrm)
        o2 = jnp.where(ok[:, None], p, o)
        d2 = jnp.where(ok[:, None], wi, d)
        lp = jnp.asarray([0.0, 8.0, 0.0])
        sd = lp[None, :] - p
        dist = jnp.sqrt(jnp.sum(sd * sd, axis=1))
        sdn = sd / jnp.maximum(dist, 1e-6)[:, None]
        stm = jnp.where(ok, dist * 0.999, 0.0)
        return o2, d2, p, sdn, stm

    arrs = make()
    jax.block_until_ready(arrs)
    for p_, a in zip(paths, arrs):
        np.save(p_, np.asarray(a))
    print("BOUNCE generated", flush=True)
    return list(arrs)
