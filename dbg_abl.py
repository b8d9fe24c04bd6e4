"""Fine-grained stage timing on the current integrator pieces."""
import time, jax, jax.numpy as jnp, numpy as np
from hala_tpu.models.integrator import Uniforms
from hala_tpu.ops import rng
from hala_tpu.ops.camera import generate_rays
from hala_tpu.ops.pallas.intersect_kernel import intersect_pallas
from hala_tpu.ops.bsdf import gather_materials, bsdf_eval, bsdf_sample
from hala_tpu.ops.lights import sample_one_light, intersect_lights
from hala_tpu.ops.gathers import take_rows
from hala_tpu.ops.sampling import build_basis, to_local, to_world, normalize, power_heuristic
from hala_tpu.ops.env import sky_radiance
from hala_tpu.scene.loader.uploader import SceneUploader
from hala_tpu.scene.procedural import cornell_box

scene = SceneUploader.upload(cornell_box(), use_ray_tracing=False)
uni = Uniforms.default()
N = 65536
pix = jnp.arange(N, dtype=jnp.int32)
g = scene.geometry

def raygen(f):
    r = rng.sample4(pix, f, 0, seed=1)
    px = (pix % 512).astype(jnp.float32); py = (pix // 512).astype(jnp.float32)
    return generate_rays(scene.cameras, uni.camera_index, px, py, 512, 512, r[:, :2], r[:, 2:])

@jax.jit
def s_raygen(f):
    o, d = raygen(f)
    return o.sum() + d.sum()

@jax.jit
def s_kernel1(f):  # single closest over N rays, 34 tris
    o, d = raygen(f)
    h = intersect_pallas(o, d, g.tri_v0, g.tri_e1, g.tri_e2, num_real=g.num_triangles)
    return h.t.sum()

@jax.jit
def s_kernel2(f):  # batched 2N query (what each bounce does)
    o, d = raygen(f)
    o2 = jnp.concatenate([o, o]); d2 = jnp.concatenate([d, -d])
    h = intersect_pallas(o2, d2, g.tri_v0, g.tri_e1, g.tri_e2, num_real=g.num_triangles)
    return h.t.sum()

@jax.jit
def s_shade_math(f):  # take_rows + frame + material + NEE math + bsdf sample (no kernels)
    o, d = raygen(f)
    tid = (pix % 34).astype(jnp.int32)
    u = rng.sample4(pix, f, 0, seed=2)[:, 0]; v = 0.3 * u; w0 = 1-u-v
    rows = take_rows(g.shade_table, tid)
    ns = normalize(w0[:,None]*rows[:,0:3]+u[:,None]*rows[:,3:6]+v[:,None]*rows[:,6:9])
    t_b, b_b = build_basis(ns)
    wo_l = to_local(-d, t_b, b_b, ns)
    mp = gather_materials(scene.materials, tid % 3)
    hit_p = o + d
    r3 = rng.sample4(pix, f, 0, seed=13)
    ls = sample_one_light(scene.lights, hit_p, r3[:, :3])
    wi_l = to_local(ls.wi, t_b, b_b, ns)
    f_l, pdf_b = bsdf_eval(mp, wo_l, wi_l, False, False)
    r4 = rng.sample4(pix, f, 0, seed=19)
    wi_s, f_s, pdf_s = bsdf_sample(mp, wo_l, r4, False, False)
    wi_w = to_world(wi_s, t_b, b_b, ns)
    return f_l.sum() + pdf_b.sum() + wi_w.sum() + pdf_s.sum() + ls.radiance.sum()

@jax.jit
def s_lights_env(f):
    o, d = raygen(f)
    lh = intersect_lights(scene.lights, o, d)
    env = sky_radiance(d, uni.ground_color[None], uni.sky_color[None])
    return lh.t.sum() + env.sum()

@jax.jit
def s_film(f):  # 4-tile scan of dynamic slice updates on 3 film arrays
    accum = jnp.zeros((262144, 4)); albedo = jnp.zeros((262144, 4)); normal = jnp.zeros((262144, 4))
    def body(carry, t):
        a, al, nr = carry
        start = t * 65536
        val = jnp.full((65536, 4), 0.5) * (t + 1)
        a = jax.lax.dynamic_update_slice_in_dim(a, jax.lax.dynamic_slice_in_dim(a, start, 65536) + val, start, 0)
        al = jax.lax.dynamic_update_slice_in_dim(al, val, start, 0)
        nr = jax.lax.dynamic_update_slice_in_dim(nr, val, start, 0)
        return (a, al, nr), None
    (a, al, nr), _ = jax.lax.scan(body, (accum, albedo, normal), jnp.arange(4))
    return a.sum() + al.sum() + nr.sum()

def timeit(tag, fn, reps=16):
    jax.block_until_ready(fn(jnp.uint32(0)))
    t0 = time.perf_counter()
    for i in range(1, reps+1):
        r = fn(jnp.uint32(i))
    jax.block_until_ready(r)
    print(f"STAGE {tag}: {(time.perf_counter()-t0)/reps*1000:.2f} ms", flush=True)

timeit("raygen 65k", s_raygen)
timeit("kernel 65k closest", s_kernel1)
timeit("kernel 131k batched", s_kernel2)
timeit("shade+NEE math 65k (diffuse-only)", s_shade_math)
timeit("lights+env 65k", s_lights_env)
timeit("film scan 262k", s_film)
