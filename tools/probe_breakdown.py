"""Per-stage cost breakdown of a Sponza-scale frame on the real TPU.

Replays render_frame_staged's dispatch loop with an HONEST completion
barrier (scalar host fetch) after every stage, so each XLA program's
share of the frame is measured directly (raygen / primary / pre /
extend / occlude / post / accum). block_until_ready is NOT a barrier
on axon (round-5 ledger: identical programs 0.07 vs 135 ms depending
on queue state); the per-stage fetch costs ~4 ms each, bounded by
comparing the sum of shares against the async warm frame. The staged
dispatcher is bit-exact vs the megakernel on lit configs
(tests/test_integrator.py), so the shares decompose the real frame
cost.

  SHADOW=wavefront ASSET=atrium_big.glb timeout 3000 \
      python -u tools/probe_breakdown.py
"""
import os
import sys
import time
from collections import defaultdict

t00 = time.perf_counter()


def stamp(msg):
    print(f"[{time.perf_counter() - t00:8.1f}s] {msg}", flush=True)


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hala_tpu.models import integrator as I
from hala_tpu.scene.cpu.scene import Scene
from hala_tpu.scene.loader.uploader import SceneUploader
from hala_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

asset = os.environ.get("ASSET", "atrium_big.glb")
path = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets", asset,
)
scene = SceneUploader.upload(Scene.load(path), use_ray_tracing=False)
jax.block_until_ready(scene.geometry.tri_v0)
stamp(f"upload done (clusters={scene.geometry.tri_packed.shape[0]})")

w, h = int(os.environ.get("W", "1920")), int(os.environ.get("H", "1088"))
settings = I.RenderSettings(
    width=w, height=h, max_depth=int(os.environ.get("DEPTH", "4")),
    rr_depth=2, tile_size=int(os.environ.get("TILE", "131072")),
    sort_rays=True,
    intersector=os.environ.get("INTERSECTOR", "matrix"),
    shadow_intersector=os.environ.get("SHADOW", "auto"),
    extend_intersector=os.environ.get("EXTEND", "auto"),
    shadow_wavefront_k=int(os.environ.get("SK", "8")),
    extend_wavefront_k=int(os.environ.get("EK", "8")),
    spp=int(os.environ.get("SPP", "1")),
)
uniforms = I.Uniforms.default()

_PICK = {}


def _fetch_scalar(val):
    """HONEST completion barrier: one-element host fetch of the first
    leaf (block_until_ready can return early on axon, round-5 ledger).
    Jitted picker per shape (eager ops on axon wedge)."""
    leaf = jax.tree_util.tree_leaves(val)[0]
    key = (leaf.shape, str(leaf.dtype))
    if key not in _PICK:
        _PICK[key] = jax.jit(
            lambda a: a.ravel()[0].astype(jnp.float32)
        )
    return float(_PICK[key](leaf))


def run_frame(frame_index, times=None):
    """One staged frame; with `times`, blocks after every stage and
    accumulates wall seconds per stage name."""
    film = I.Film.create(w, h)
    spp = max(1, settings.spp)
    n_rays = h * w * spp
    tile = min(settings.tile_size, n_rays)
    tile = max(spp, tile - tile % spp)
    pp = tile // spp
    n_tiles = -(-n_rays // tile)
    n_pad = n_tiles * pp
    swizzle = h % 32 == 0 and w % 32 == 0 and pp % 1024 == 0
    fidx = jnp.asarray(frame_index, jnp.uint32)
    inv_n1 = 1.0 / (jnp.asarray(frame_index, jnp.float32) + 1.0)
    row_offset = jnp.int32(0)

    def tick(name, val):
        if times is None:
            return val
        _fetch_scalar(val)
        now = time.perf_counter()
        times[name] += now - tick.last
        tick.last = now
        return val

    accum, albedo, normal = I._stage_film_prep(film, settings, swizzle, n_pad)
    jax.block_until_ready(accum)
    tick.last = time.perf_counter()
    rays_total = jnp.float32(0.0)
    for t in range(n_tiles):
        start = t * pp
        o, d, gpix, fidx_r = tick("raygen", I._stage_raygen(
            scene, uniforms, None, fidx, row_offset, start,
            settings, h, spp, tile, swizzle, None,
        ))
        hit0 = tick("primary", I._stage_primary(scene, o, d, settings))
        st = tick("init", I._stage_init(
            scene, None, uniforms, gpix, fidx_r, o, d, hit0,
            settings, h, None,
        ))
        for b in range(settings.max_depth):
            bounce = I._bounce_const(b)
            c, sh_o, sh_d, sh_t = tick("pre", I._stage_pre(
                scene, None, uniforms, gpix, fidx_r, bounce, st,
                settings, h, None,
            ))
            qhit = tick("extend", I._stage_extend(
                scene, c["next_o"], c["next_d"], c["ext_tmax"], settings
            ))
            occ = tick("occlude", I._stage_occlude(
                scene, sh_o, sh_d, sh_t, settings
            ))
            st = tick("post", I._stage_post(
                scene, None, uniforms, gpix, fidx_r, bounce, c, qhit,
                occ, settings, h, None,
            ))
        accum, albedo, normal, rays_total = I._stage_accum(
            accum, albedo, normal, rays_total,
            st["radiance"], st["albedo"], st["normal"], st["rays"],
            inv_n1, start, settings, pp, spp, None,
        )
        tick("accum", accum)
    out = I._stage_finalize(accum, albedo, normal, settings, swizzle)
    jax.block_until_ready(out.accum)
    return rays_total


t0 = time.perf_counter()
rays = run_frame(0)
_fetch_scalar(rays)
stamp(f"cold frame (compile+run) {time.perf_counter() - t0:.1f}s")

t0 = time.perf_counter()
rays = run_frame(1)
r_v = _fetch_scalar(rays)
warm = time.perf_counter() - t0
stamp(f"warm frame (async, honest end fetch) {warm:.2f}s "
      f"rays={r_v:.3g}")

times = defaultdict(float)
t0 = time.perf_counter()
run_frame(2, times=times)
total = time.perf_counter() - t0
stamp(f"instrumented frame {total:.2f}s (sync overhead "
      f"{total - warm:+.2f}s vs warm)")
for name, s in sorted(times.items(), key=lambda kv: -kv[1]):
    stamp(f"  {name:8s} {s:7.3f}s  {100 * s / total:5.1f}%")
