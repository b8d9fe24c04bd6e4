"""Cumulative in-one-process decomposition of the lighting stage.

The env-var stage modes gave self-contradictory numbers (notex 122 <
attrs 131 while notex is a superset of attrs — raster_stages_s2.log),
and cross-process runs of the identical HLO differ up to 13x
(shadebisect2 2080 ms vs 155 ms). So: build the shade computation up
in cumulative stages, each its own jit, and time the full set TWICE in
interleaved order (s0 s1 ... sN, then again) — within-process drift
shows up as pass-1 vs pass-2 disagreement, and stage deltas give the
attribution.

Stages:
  s0 attrs fetch + interp (rows, geo takes, normals/uv/pos, materials)
  s1 + base-color texture fetch
  s2 + shading frame (basis, wo_l) + emission
  s3 + ONE light's BSDF loop iteration
  s4 + ALL lights (the full loop)
  s5 full lighting_pass (reshape + gbuffer dict)

  python -u tools/probe_shadecum.py
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

from hala_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from hala_tpu.models.rz_renderer import (
    RasterSettings, gbuffer_pass, lighting_pass,
)
from hala_tpu.ops.bsdf import bsdf_eval, gather_materials
from hala_tpu.ops.gathers import take_rows
from hala_tpu.ops.sampling import build_basis, normalize, to_local
from hala_tpu.ops.texture import sample_texture
from hala_tpu.scene.cpu.scene import Scene
from hala_tpu.scene.loader.uploader import SceneUploader

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
scene = SceneUploader.upload(
    Scene.load(os.path.join(root, "assets", "atrium_big.glb")),
    use_ray_tracing=False,
)
jax.block_until_ready(scene.geometry.tri_v0)
stamp(f"upload done (tris={scene.geometry.num_triangles}, "
      f"lights={scene.lights.num_lights})")

settings = RasterSettings(
    width=1920, height=1088, binned=True, tile=64, deferred=True,
)
frag = gbuffer_pass(scene, jnp.int32(0), settings, None)
jax.block_until_ready(frag.tri)
cam = jnp.int32(0)
stamp(f"gbuffer done (N={frag.tri.shape[0]})")


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _prefix(scene, frag, view_pos, n_lights, with_tex):
    geom = scene.geometry
    tid = jnp.maximum(frag.tri, 0)
    u, v = frag.u, frag.v
    w0 = 1.0 - u - v
    rows = take_rows(geom.shade_table, tid)
    ns = normalize(
        w0[:, None] * rows[:, 0:3]
        + u[:, None] * rows[:, 3:6]
        + v[:, None] * rows[:, 6:9]
    )
    v0 = jnp.take(geom.tri_v0, tid, axis=0)
    e1 = jnp.take(geom.tri_e1, tid, axis=0)
    e2 = jnp.take(geom.tri_e2, tid, axis=0)
    pos = v0 + u[:, None] * e1 + v[:, None] * e2
    to_view = view_pos[None, :] - pos
    ns = jnp.where(dot(ns, to_view)[:, None] < 0, -ns, ns)
    uv = (
        w0[:, None] * rows[:, 9:11]
        + u[:, None] * rows[:, 11:13]
        + v[:, None] * rows[:, 13:15]
    )
    mat_idx = rows[:, 18].astype(jnp.int32)
    mp = gather_materials(scene.materials, mat_idx)
    if with_tex and scene.textures is not None:
        mp = mp._replace(
            base_color=mp.base_color
            * sample_texture(scene.textures, mp.base_color_map, uv)[:, :3]
        )
    if n_lights < 0:
        return mp.base_color, ns, pos
    w_disney = bool(scene.materials.has_disney)
    w_trans = bool(scene.materials.has_transmission)
    t_b, b_b = build_basis(ns)
    wo = normalize(to_view)
    wo_l = to_local(wo, t_b, b_b, ns)
    wo_l = wo_l.at[:, 2].set(jnp.maximum(wo_l[:, 2], 1e-5))
    lights = scene.lights
    color = mp.emission
    for li_i in range(min(n_lights, lights.num_lights)):
        lt = lights.ltype[li_i]
        lpos = lights.position[li_i]
        inten = lights.intensity[li_i]
        lu = lights.u[li_i]
        lv = lights.v[li_i]
        area = lights.area[li_i]
        radius = lights.radius[li_i]
        is_dir = lt == 1
        is_spot = lt == 2
        is_quad = lt == 3
        is_sphere = lt == 4
        lcenter = jnp.where(is_quad, lpos + 0.5 * (lu + lv), lpos)
        to_l = lcenter[None, :] - pos
        d2 = jnp.maximum(jnp.sum(to_l * to_l, -1), 1e-6)
        wi = jnp.where(is_dir, -lu[None, :], to_l / jnp.sqrt(d2)[:, None])
        rad = inten[None, :] / d2[:, None]
        cos_s = -dot(wi, lu[None, :])
        spot_t = jnp.clip(
            (cos_s - lv[1]) / jnp.maximum(lv[0] - lv[1], 1e-6), 0.0, 1.0
        )
        spot_f = spot_t * spot_t * (3.0 - 2.0 * spot_t)
        rad = jnp.where(is_spot, rad * spot_f[:, None], rad)
        rad = jnp.where(is_dir, inten[None, :], rad)
        n_q = normalize(jnp.cross(lu, lv))
        cos_l = jnp.maximum(-dot(wi, n_q[None, :]), 0.0)
        rad = jnp.where(
            is_quad, inten[None, :] * (area * cos_l / d2)[:, None], rad
        )
        rad = jnp.where(
            is_sphere,
            inten[None, :]
            * jnp.minimum(radius * radius / d2, 1.0)[:, None] * jnp.pi,
            rad,
        )
        wi_l = to_local(wi, t_b, b_b, ns)
        f, _ = bsdf_eval(mp, wo_l, wi_l, w_disney, w_trans)
        cos_i = jnp.maximum(wi_l[:, 2], 0.0)
        color = color + f * rad * cos_i[:, None]
    return color, ns, pos


stages = [
    ("s0 attrs+interp+mat", dict(n_lights=-1, with_tex=False)),
    ("s1 +texture", dict(n_lights=-1, with_tex=True)),
    ("s2 +frame/emission", dict(n_lights=0, with_tex=True)),
    ("s3 +1 light", dict(n_lights=1, with_tex=True)),
    ("s4 +all lights", dict(n_lights=10**6, with_tex=True)),
]

fns = []
for tag, kw in stages:
    fn = jax.jit(
        lambda scene, frag, cam, _kw=kw: _prefix(
            scene, frag, scene.cameras.position[cam], **_kw
        )
    )
    fns.append((tag, fn))
fns.append((
    "s5 lighting_pass",
    lambda scene, frag, cam: lighting_pass(scene, frag, cam, settings, None),
))


def run_pass(label, reps=10):
    for tag, fn in fns:
        out = fn(scene, frag, cam)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(scene, frag, cam)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        dt = (time.perf_counter() - t0) / reps
        stamp(f"[{label}] {tag}: {dt*1e3:.2f} ms")


run_pass("pass1")
run_pass("pass2")
