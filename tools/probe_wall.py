"""Bisect the wavefront TPU compile wall (DESIGN.md round-3 ledger).

Facts going in: the cull+wavefront(+matrix-fallback) composition
compiles in minutes at 369 clusters (atrium) but an isolated staged jit
at 1861 clusters (atrium_big) was still compiling when killed at
29 min. Compile time depends on SHAPES only, so this probe slices the
atrium_big geometry to intermediate cluster counts and times
jit-lower-compile of one configuration per process invocation:

  CLUSTERS=1024 K=16 PART=wf python -u tools/probe_wall.py
    PART=cull  — cull_topk alone
    PART=wf    — intersect_wavefront any-hit (full, incl. fallback)
    PART=wfnf  — intersect_wavefront any-hit, fallback branch removed
    PART=mq    — matrix_query any-hit alone (the fallback body)
    PART=wfown — intersect_wavefront called DIRECTLY (its own jit
                 program, no enclosing jit — the way the round-3
                 standalone probes ran it successfully)

Run each under `timeout` from tools/run_wall_sweep.sh; a hang loses
only its own process.
"""
import dataclasses
import os
import sys
import time

t00 = time.perf_counter()


def stamp(msg):
    print(f"[{time.perf_counter() - t00:8.1f}s] {msg}", flush=True)


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hala_tpu.scene.cpu.scene import Scene
from hala_tpu.scene.loader.uploader import SceneUploader
from hala_tpu.utils.compile_cache import enable_compilation_cache

if os.environ.get("CPU"):
    jax.config.update("jax_platforms", "cpu")
else:
    enable_compilation_cache()

C = int(os.environ.get("CLUSTERS", "1861"))
K = int(os.environ.get("K", "16"))
M = int(os.environ.get("M", "32"))
PART = os.environ.get("PART", "wf")
N = int(os.environ.get("N", "131072"))
AH = os.environ.get("AH", "1") != "0"  # any-hit (default) vs closest

path = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets", os.environ.get("ASSET", "atrium_big.glb"),
)
scene = SceneUploader.upload(Scene.load(path), use_ray_tracing=False)
g = scene.geometry
c_full = g.tri_packed.shape[0]
lanes = g.tri_packed.shape[2]
if C < c_full:
    # Compile time is a function of shapes, not values: slicing the
    # cluster tables (and their slot rows) to C clusters produces the
    # exact shape profile of a C-cluster scene.
    t_slots = C * lanes
    g = dataclasses.replace(
        g,
        tri_v0=g.tri_v0[:t_slots], tri_e1=g.tri_e1[:t_slots],
        tri_e2=g.tri_e2[:t_slots], normals=g.normals[:t_slots],
        tangents=g.tangents[:t_slots], uvs=g.uvs[:t_slots],
        tri_mat=g.tri_mat[:t_slots], tri_prim=g.tri_prim[:t_slots],
        shade_table=(
            g.shade_table[:t_slots] if g.shade_table is not None else None
        ),
        cluster_min=g.cluster_min[:C], cluster_max=g.cluster_max[:C],
        tri_packed=g.tri_packed[:C],
        num_triangles=min(g.num_triangles, t_slots),
        prefix_layout=False,
    )
jax.block_until_ready(g.tri_packed)
stamp(f"geometry ready: C={g.tri_packed.shape[0]} PART={PART} K={K} M={M} AH={AH}")

rs_key = jax.random.PRNGKey(0)
o = jax.random.uniform(rs_key, (N, 3), jnp.float32, -5.0, 5.0)
d = jax.random.normal(jax.random.PRNGKey(1), (N, 3), jnp.float32)
d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
tf = jnp.full((N,), 30.0, jnp.float32)

# Geometry must be a jit ARGUMENT, not a closure capture: captured
# device arrays embed as jaxpr constants, and lowering then fetches the
# whole geometry through the tunnel to inline it (~100 MB at
# atrium_big scale — measured 680 s of "lowering" at C=369 before this
# fix, vs 87 s argument-passed). Production passes the scene as an
# argument everywhere, so the argument form is the honest shape.
if PART == "cull":
    from hala_tpu.ops.cull import cull_topk

    def fn(o, d, tf, cmin, cmax):
        return cull_topk(o, d, tf, cmin, cmax, k=K)

    args = (o, d, tf, g.cluster_min, g.cluster_max)
elif PART == "mq":
    from hala_tpu.ops.traverse import matrix_query

    def fn(o, d, tf, g):
        return matrix_query(o, d, g, t_max=tf, any_hit=AH)

    args = (o, d, tf, g)
elif PART in ("wf", "wfnf"):
    from hala_tpu.ops.wavefront import intersect_wavefront

    def fn(o, d, tf, g):
        return intersect_wavefront(
            o, d, g, t_max=tf, any_hit=AH, k_per_ray=K, m_group=M,
            fallback=(PART == "wf"),
        )

    args = (o, d, tf, g)
elif PART == "glue":
    # Everything BEFORE the Pallas walker: cull + signature sort +
    # payload gather + group merge + want mask. If this compiles fast
    # while wfnf is slow, the wall is the walker (or its composition);
    # if THIS is slow, the wall is the XLA glue.
    import functools

    from hala_tpu.ops.cull import INF_KEY, _ID_MASK, cull_topk
    from hala_tpu.ops.wavefront import GROUP, _group_lists

    def fn(o, d, tf, cmin, cmax):
        n = o.shape[0]
        k = K
        m = M
        pk, cnt = cull_topk(o, d, tf, cmin, cmax, k=k)
        id0 = pk[:, 0] & _ID_MASK
        id1 = pk[:, min(1, k - 1)] & _ID_MASK
        id2 = pk[:, min(2, k - 1)] & _ID_MASK
        skey = (id0 << 18) | (id1 << 5) | (id2 >> 8)
        lane = jnp.arange(n, dtype=jnp.int32)
        _, lane_s = jax.lax.sort((skey, lane), num_keys=2)
        bc_f = functools.partial(
            jax.lax.bitcast_convert_type, new_dtype=jnp.float32
        )
        payload = jnp.concatenate(
            [o, d, tf[:, None], bc_f(cnt)[:, None], bc_f(pk)], axis=1
        )
        pay_s = jnp.take(payload, lane_s, axis=0)
        pk_s = jax.lax.bitcast_convert_type(pay_s[:, 8:], jnp.int32)
        g_total = n // GROUP
        tnb, grp_bound = _group_lists(pk_s, g_total, k, m)
        eid = jnp.where(tnb != INF_KEY, tnb & _ID_MASK, -2)
        cand = jnp.where(pk_s != INF_KEY, pk_s & _ID_MASK, -1)
        cand = cand.reshape(g_total, GROUP, k)
        want = jnp.any(
            cand[:, :, :, None] == eid[:, None, None, :], axis=2
        )
        return (tnb.sum(), grp_bound.sum(), want.sum(), pay_s.sum())

    args = (o, d, tf, g.cluster_min, g.cluster_max)
elif PART == "wfown":
    from hala_tpu.ops.wavefront import intersect_wavefront

    t0 = time.perf_counter()
    out = intersect_wavefront(
        o, d, g, t_max=tf, any_hit=AH, k_per_ray=K, m_group=M,
    )
    jax.block_until_ready(out.t)
    stamp(f"OWN-JIT compile+first {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(5):
        out = intersect_wavefront(
            o, d, g, t_max=tf, any_hit=AH, k_per_ray=K, m_group=M,
        )
    jax.block_until_ready(out.t)
    stamp(f"steady {(time.perf_counter() - t0) / 5 * 1e3:.1f} ms")
    raise SystemExit(0)
else:
    raise SystemExit(f"unknown PART {PART}")

jfn = jax.jit(fn)
t0 = time.perf_counter()
lowered = jfn.lower(*args)
stamp(f"lowered in {time.perf_counter() - t0:.1f}s")
t0 = time.perf_counter()
compiled = lowered.compile()
stamp(f"COMPILED in {time.perf_counter() - t0:.1f}s")
t0 = time.perf_counter()
out = compiled(*args)
jax.block_until_ready(out)
stamp(f"first run {time.perf_counter() - t0:.2f}s")
t0 = time.perf_counter()
for _ in range(5):
    out = compiled(*args)
jax.block_until_ready(out)
stamp(f"steady {(time.perf_counter() - t0) / 5 * 1e3:.1f} ms")
