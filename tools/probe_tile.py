"""Sweep the keyless matrix kernel's tile height and MT-group size.

The walk cost model: every cluster visit runs the Moller-Trumbore loop
over each mt_group-sublane slice of the tile that contains ANY wanting
lane. Taller tiles amortize the O(C) fill; narrower groups waste fewer
lockstep lanes per visit but pay more scalar loop overhead. Measures
sorted closest + sorted any-hit per combo on the big asset.

  python -u tools/probe_tile.py [atrium_big.glb] [131072]
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

from hala_tpu.ops.traverse import matrix_query
from hala_tpu.scene.cpu.scene import Scene
from hala_tpu.scene.loader.uploader import SceneUploader

asset = sys.argv[1] if len(sys.argv) > 1 else "atrium_big.glb"
n = int(sys.argv[2]) if len(sys.argv) > 2 else 131072

path = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets", asset,
)
scene = SceneUploader.upload(Scene.load(path), use_ray_tracing=False)
g = scene.geometry
jax.block_until_ready(g.tri_v0)
stamp(f"upload done (clusters={g.tri_packed.shape[0]})")

rs = np.random.RandomState(0)
v0 = np.asarray(g.tri_v0)
e1 = np.asarray(g.tri_e1)
e2 = np.asarray(g.tri_e2)
real = np.where(np.asarray(g.tri_mat) >= 0)[0]
pick = real[rs.randint(0, len(real), n)]
cent = v0[pick] + e1[pick] / 3 + e2[pick] / 3
lo = v0[real].min(0)
hi = v0[real].max(0)
orig = lo + (hi - lo) * rs.uniform(0.2, 0.8, (n, 3))
d = cent - orig
d /= np.linalg.norm(d, axis=1, keepdims=True)
o = jnp.asarray(orig, jnp.float32)
dd = jnp.asarray(d, jnp.float32)
far = jnp.full((n,), 1e7)


_HITSUM = jax.jit(lambda t: jnp.sum(t))


def timed(tag, fn, reps=20):
    h = fn()
    float(_HITSUM(h.t))  # honest completion barrier (round-5 ledger:
    # block_until_ready can return before execution finishes on axon)
    t0 = time.perf_counter()
    for _ in range(reps):
        h = fn()
    float(_HITSUM(h.t))
    dt = (time.perf_counter() - t0) / reps
    hits = int(np.asarray(h.tri >= 0).sum())
    stamp(f"{tag}: {dt*1e3:.2f} ms/{n} rays  (hits {hits})")
    return dt


SWEEPS = {
    # round 1: tile height x fine groups (mg=8 lost ~30% everywhere ->
    # the kernel is per-group-overhead-bound, not MT-lane-bound)
    "1": [(64, 16, True), (64, 8, True), (128, 16, True),
          (128, 8, True), (256, 8, True)],
    # round 2: coarser groups + pretest ablation at the round-1 winner
    "2": [(128, 32, True), (64, 32, True), (256, 16, True),
          (128, 16, False), (128, 64, True)],
    # round 3: worklist engine (packed-nibble drain, single-sync
    # group/span gating) vs the branch engine at the round-2 winners
    "3": [(128, 32, True, True), (128, 32, True, False),
          (128, 16, True, True), (128, 8, True, True),
          (64, 16, True, True)],
    # round 3b: batched (2-cluster) worklist visits — overlapped DMAs +
    # shared selection/bound rounds — vs single-visit at the winners
    "4": [(128, 32, True, True, 2), (128, 32, True, True, 1),
          (128, 64, True, True, 2), (128, 16, True, True, 2)],
    # round 3c: software-pipelined loop (cluster N+1's DMA in flight
    # under cluster N's drain, ping-pong halves) vs batch-2 vs branch
    "5": [(128, 32, True, True, 1, True), (128, 32, True, True, 2),
          (128, 32, True, True, 1), (128, 32, True, False),
          (128, 64, True, True, 1, True),
          # batch-4 visits need n_groups <= 2 (8-nibble worklist cap):
          # only legal at mg >= bs/2 — amortizes 4 selection rounds +
          # overlaps 4 DMAs per drain
          (128, 64, True, True, 4), (128, 64, True, True, 2)],
    # round 4: FINE MT groups under the multi-word worklist (the
    # branch engine was per-group-sync bound at mg=8; the worklist
    # pays one extra scalar sync per 8 groups instead). A wanting
    # mg=8 group runs MT over (8,128)=1024 rays vs (32,128)=4096 —
    # 4x less lockstep waste if the ~42 wanting rays/visit clump.
    "6": [(128, 32, True, True, 1, True),   # shipped champion (control)
          (128, 16, True, True), (128, 8, True, True),
          (64, 8, True, True), (64, 16, True, True),
          (128, 8, True, True, 2)],
    # round 4b: TALLER ray tiles at coarse groups (only mg=8/16 were
    # ever tried at bs=256, before worklist+pipeline existed). Taller
    # tiles cut the number of cluster-union sweeps linearly while the
    # per-tile union grows sublinearly on sorted rays; bs=512 mg=32 is
    # 16 groups = 2 worklist words (legal only since the multi-word
    # drain landed).
    "7": [(256, 32, True, True, 1, True), (256, 64, True, True, 1, True),
          (512, 32, True, True, 1, True), (512, 64, True, True, 1, True),
          (256, 32, True, True, 1, False)],
    # round 4c: candidate-signature ray ordering (the wavefront's
    # grouping key via the Pallas cull) vs origin-Morton at the shipped
    # champion, plus a 1024-sublane tile (fits since nb=1 at 131k rays
    # disables Pallas block double-buffering).
    "8": [(512, 32, True, True, 1, True),            # control (morton)
          (512, 32, True, True, 1, True, "signature"),
          (512, 64, True, True, 1, True, "signature"),
          (1024, 32, True, True, 1, True),
          (1024, 32, True, True, 1, True, "signature")],
    # round 4d: the shipped champion alone — run with SUBS=2 / SUBS=4
    # for the fine-cluster sweep.
    "9": [(512, 32, True, True, 1, True)],
    # round 4e: FLAT SMEM-entry drain (one DMA'd entry table per visit,
    # scalar-domain span drains) vs the two-level nibble scheme.
    "10": [(512, 32, True, True, 1, True),
           (512, 32, True, True, 1, True, "morton", True),
           (512, 16, True, True, 1, True, "morton", True),
           (512, 64, True, True, 1, True, "morton", True)],
    # round 5: SUPERCLUSTER PAGES (union-AABB pages of `page`
    # consecutive SAH-adjacent clusters; one selection/bound/scalar-
    # sync round serves the whole page, fill loop is page-count long).
    # Control = shipped pipelined champion.
    "11": [(512, 32, True, True, 1, True),          # control
           (512, 32, True, True, 1, False, "morton", False, 4),
           (512, 32, True, True, 1, False, "morton", False, 8),
           (512, 32, True, True, 1, False, "morton", False, 16),
           (256, 32, True, True, 1, False, "morton", False, 8)],
    # round 5b: page champion refinement + taller tile at pages
    "12": [(512, 32, True, True, 1, False, "morton", False, 8),
           (1024, 32, True, True, 1, False, "morton", False, 8),
           (512, 64, True, True, 1, False, "morton", False, 8),
           (512, 32, True, True, 1, False, "morton", False, 32)],
}
# round 5c (KERNEL=grouped): the MXU static-grid engine at full sponza
# scale — the matrix kernel measured VPU-bound (~22G pair-tests/s =
# VPU-peak class), so the only 10x lever left is MT-as-matmul. Last
# measured at 447 clusters (round 3, lost 79 vs 62 ms); never at 1861
# with the Pallas cull + signature sort feeding it.
KERNEL = os.environ.get("KERNEL", "matrix")
if KERNEL == "grouped":
    SWEEPS["13"] = [(512, 32, True, True, 1, False, "morton", False, 1),
                    (512, 32, True, True, 1, False, "signature", False, 1)]
# honest-timing control of the shipped champion (round-5): bs=512
# tall tiles, mg=32, pipelined worklist — the frame path's config
SWEEPS["champ"] = [(512, 32, True, True, 1, True),
                   (128, 32, True, True, 1, True)]
sweep = SWEEPS[os.environ.get("SWEEP", "3")]
# SUBS=2/4 splits each 128-tri DMA chunk into finer traversal clusters
# (tighter entry distances, half/quarter MT spans per visit, 2-4x the
# visits). Never swept under the worklist+pipeline engine.
SUBS = int(os.environ.get("SUBS", "1"))

for combo in sweep:
    bs, mg, pre = combo[:3]
    wl = combo[3] if len(combo) > 3 else False
    vb = combo[4] if len(combo) > 4 else 1
    pip = combo[5] if len(combo) > 5 else False
    sk = combo[6] if len(combo) > 6 else "morton"
    fl = combo[7] if len(combo) > 7 else False
    pgz = combo[8] if len(combo) > 8 else 1
    tag = (f"bs={bs} mg={mg} pre={int(pre)} wl={int(wl)} vb={vb} "
           f"pipe={int(pip)} key={sk} flat={int(fl)} page={pgz}")
    timed(
        f"closest {tag}",
        lambda bs=bs, mg=mg, pre=pre, wl=wl, vb=vb, pip=pip, sk=sk,
        fl=fl, pgz=pgz:
        matrix_query(
            o, dd, g, subs=SUBS, sublanes=bs, mt_group=mg, pretest=pre,
            worklist=wl, visit_batch=vb, pipeline=pip, sort_key=sk,
            flat=fl, page=pgz, kernel=KERNEL,
        ),
    )
    timed(
        f"any-hit {tag}",
        lambda bs=bs, mg=mg, pre=pre, wl=wl, vb=vb, pip=pip, sk=sk,
        fl=fl, pgz=pgz:
        matrix_query(
            o, dd, g, t_max=far, any_hit=True, subs=SUBS, sublanes=bs,
            mt_group=mg, pretest=pre, worklist=wl, visit_batch=vb,
            pipeline=pip, sort_key=sk, flat=fl, page=pgz, kernel=KERNEL,
        ),
    )

if os.environ.get("RUNS"):
    # Visit-count statistics: how many while_loop rounds each kernel
    # tile pays on COHERENCE-SORTED rays (the frame path) — per-visit
    # cost = kernel time / total visits.
    from hala_tpu.ops.traverse import _coherence_key, intersect_matrix

    @jax.jit
    def sorted_stats(o, d, tm):
        key = _coherence_key(o, d, tm, g.cluster_min, g.cluster_max)
        _, o0, o1, o2, d0, d1, d2, tms = jax.lax.sort(
            (key, o[:, 0], o[:, 1], o[:, 2],
             d[:, 0], d[:, 1], d[:, 2], tm),
            num_keys=1,
        )
        os_ = jnp.stack([o0, o1, o2], axis=1)
        ds_ = jnp.stack([d0, d1, d2], axis=1)
        _, runs = intersect_matrix(os_, ds_, g, t_max=tms,
                                   with_stats=True)
        _, runs_ah = intersect_matrix(os_, ds_, g, t_max=tms,
                                      with_stats=True, any_hit=True)
        return runs, runs_ah

    runs, runs_ah = sorted_stats(o, dd, far)
    for tag, r in (("closest", np.asarray(runs)),
                   ("any-hit", np.asarray(runs_ah))):
        stamp(f"sorted {tag} visits/tile: mean {r.mean():.0f} "
              f"min {r.min()} max {r.max()} tiles {r.shape[0]}")
