"""Per-ray ordered traversal + matrix traversal vs brute force.

Both kernels replace the reference's hardware BVH role
(/root/reference/src/scene/loader/gpu_uploader.rs:774-967) and must be
EXACT: every test compares t/tri/u/v against the chunked brute force.
Run in interpret mode on CPU.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from hala_tpu.ops.intersect import T_MAX, intersect_bruteforce
from hala_tpu.ops.traverse import (
    cull_ordered,
    intersect_matrix,
    intersect_traversed,
    traverse_query,
)
from hala_tpu.scene.loader.uploader import SceneUploader
from hala_tpu.scene.procedural import sponza_like


@pytest.fixture(scope="module")
def geom():
    scene = sponza_like(rooms=(2, 2), columns_per_room=4, boxes_per_room=2)
    return SceneUploader.upload(scene, use_ray_tracing=False).geometry


def _rays(n, rs):
    o = np.tile(np.asarray([4.0, 1.5, 4.0], np.float32), (n, 1))
    o += rs.uniform(-1, 1, (n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _assert_hits_equal(hit, bf):
    np.testing.assert_allclose(np.asarray(hit.t), np.asarray(bf.t), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(hit.tri), np.asarray(bf.tri))
    m = np.asarray(bf.tri) >= 0
    np.testing.assert_allclose(np.asarray(hit.u)[m], np.asarray(bf.u)[m], atol=1e-5)
    np.testing.assert_allclose(np.asarray(hit.v)[m], np.asarray(bf.v)[m], atol=1e-5)


class TestCullOrdered:
    def test_tn_sorted_and_overflow(self, geom, rs):
        g = geom
        o, d = _rays(256, rs)
        tm = jnp.full((256,), T_MAX)
        ids, tns, ovf = cull_ordered(
            o, d, tm, g.cluster_min, g.cluster_max, 8
        )
        tn_np = np.asarray(tns)
        # tn ascending per ray (padding is INF so stays ascending)
        assert (np.diff(tn_np, axis=1) >= 0).all()
        # overflow flags rays with more than K slab hits
        ids_full, _, ovf_full = cull_ordered(
            o, d, tm, g.cluster_min, g.cluster_max,
            g.cluster_min.shape[0],
        )
        counts = (np.asarray(ids_full) < 0x3FFFFFFF).sum(axis=1)
        np.testing.assert_array_equal(np.asarray(ovf), counts > 8)


class TestCullCandidates:
    """The kernel-cull front end (cull_candidates): unpacked-merge
    superchunking lifts the packed key's 13-bit id cap, serving the
    >MATRIX_MAX_CLUSTERS traverse fallback (PLAN completeness item)."""

    def test_superchunk_merge_matches_single_call(self, geom, rs):
        from hala_tpu.ops.traverse import cull_candidates

        g = geom
        o, d = _rays(256, rs)
        tm = jnp.full((256,), T_MAX)
        ref = cull_candidates(
            o, d, tm, g.cluster_min, g.cluster_max, 8,
            interpret=True, kernel=True,
        )
        got = cull_candidates(
            o, d, tm, g.cluster_min, g.cluster_max, 8,
            interpret=True, kernel=True, superchunk=8,
        )
        for a, b in zip(got, ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # merged tns stay ascending per ray (INF padding last)
        assert (np.diff(np.asarray(got[1]), axis=1) >= 0).all()

    def test_traversal_exact_through_superchunk_merge(self, geom, rs):
        """Full traversal fed by the forced superchunk merge must stay
        exact vs brute force (incl. the truncation fallback at K=4)."""
        from hala_tpu.ops.traverse import _traverse_core, cull_candidates

        g = geom
        o, d = _rays(1024, rs)
        tm = jnp.full((1024,), T_MAX)
        ids, tns, ovf = cull_candidates(
            o, d, tm, g.cluster_min, g.cluster_max, 4,
            interpret=True, kernel=True, superchunk=8,
        )
        hit = _traverse_core(
            o, d, g, tm, ids, tns, ovf, exact=True, interpret=True
        )
        bf = intersect_bruteforce(
            o, d, g.tri_v0, g.tri_e1, g.tri_e2, chunk=128
        )
        _assert_hits_equal(hit, bf)


class TestTraversed:
    @pytest.mark.parametrize("k", [4, 12])
    def test_exact_vs_bruteforce(self, geom, rs, k):
        """K=4 forces heavy candidate overflow, exercising the block-
        kernel fallback; the merged result must still be exact."""
        g = geom
        o, d = _rays(2048, rs)
        bf = intersect_bruteforce(o, d, g.tri_v0, g.tri_e1, g.tri_e2, chunk=128)
        hit = intersect_traversed(o, d, g, k_per_ray=k, interpret=True)
        _assert_hits_equal(hit, bf)

    def test_sorted_query_unsorts_correctly(self, geom, rs):
        g = geom
        o, d = _rays(1024, rs)
        bf = intersect_bruteforce(o, d, g.tri_v0, g.tri_e1, g.tri_e2, chunk=128)
        hit = traverse_query(o, d, g, k_per_ray=8, interpret=True)
        _assert_hits_equal(hit, bf)

    def test_t_max_shadow_semantics(self, geom, rs):
        g = geom
        o, d = _rays(512, rs)
        tmx = jnp.full((512,), 2.5)
        bf = intersect_bruteforce(
            o, d, g.tri_v0, g.tri_e1, g.tri_e2, t_max=2.5, chunk=128
        )
        hit = intersect_traversed(o, d, g, t_max=tmx, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(hit.tri) >= 0, np.asarray(bf.tri) >= 0
        )


class TestMatrix:
    def test_exact_vs_bruteforce(self, geom, rs):
        g = geom
        o, d = _rays(2048, rs)
        bf = intersect_bruteforce(o, d, g.tri_v0, g.tri_e1, g.tri_e2, chunk=128)
        hit = intersect_matrix(o, d, g, interpret=True)
        _assert_hits_equal(hit, bf)

    def test_t_max(self, geom, rs):
        g = geom
        o, d = _rays(512, rs)
        tmx = jnp.full((512,), 2.5)
        bf = intersect_bruteforce(
            o, d, g.tri_v0, g.tri_e1, g.tri_e2, t_max=2.5, chunk=128
        )
        hit = intersect_matrix(o, d, g, t_max=tmx, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(hit.tri) >= 0, np.asarray(bf.tri) >= 0
        )

    def test_dead_rays_zero_tmax(self, geom, rs):
        """tmax=0 lanes (dead/compacted rays) must produce no hits."""
        g = geom
        o, d = _rays(256, rs)
        hit = intersect_matrix(
            o, d, g, t_max=jnp.zeros((256,)), interpret=True
        )
        assert (np.asarray(hit.tri) == -1).all()

    @pytest.mark.parametrize("pretest,vb,pipe,flat", [
        (True, 1, False, False), (False, 1, False, False),
        (True, 2, False, False), (False, 2, False, False),
        (True, 1, True, False), (False, 1, True, False),
        (True, 1, False, True), (True, 1, True, True),
    ])
    def test_worklist_engine_exact(self, geom, rs, pretest, vb, pipe,
                                   flat):
        """The packed-nibble worklist visit engine must be bit-equal to
        the branch engine (identical MT math over the identical visit
        set) for both query classes, with and without the sub-chunk
        pretest spans, with batched (2-cluster) visits, with the
        software-pipelined (ping-pong DMA) loop, and with the flat
        SMEM-entry drain (one DMA'd (group, span-mask) table per
        visit)."""
        g = geom
        o, d = _rays(1024, rs)
        bf = intersect_bruteforce(
            o, d, g.tri_v0, g.tri_e1, g.tri_e2, chunk=128
        )
        hit = intersect_matrix(
            o, d, g, interpret=True, worklist=True, pretest=pretest,
            visit_batch=vb, pipeline=pipe, flat=flat,
        )
        _assert_hits_equal(hit, bf)
        occ = intersect_matrix(
            o, d, g, t_max=jnp.full((1024,), 2.5), interpret=True,
            any_hit=True, worklist=True, pretest=pretest,
            visit_batch=vb, pipeline=pipe, flat=flat,
        )
        bf_t = intersect_bruteforce(
            o, d, g.tri_v0, g.tri_e1, g.tri_e2, t_max=2.5, chunk=128
        )
        np.testing.assert_array_equal(
            np.asarray(occ.tri) >= 0, np.asarray(bf_t.tri) >= 0
        )

    @pytest.mark.parametrize("mg,vb", [(8, 1), (16, 1), (8, 2), (4, 1)])
    def test_worklist_multiword_exact(self, geom, rs, mg, vb):
        """Fine MT groups under the worklist engine spill past the
        8-entry nibble word into extra words (mg=8 at bs=64 -> 8
        groups x vb). The multi-word drain (global entry id =
        word*8 + nibble) must stay bit-equal to the branch engine,
        including the full-word no-sentinel edge."""
        g = geom
        o, d = _rays(1024, rs)
        bf = intersect_bruteforce(
            o, d, g.tri_v0, g.tri_e1, g.tri_e2, chunk=128
        )
        hit = intersect_matrix(
            o, d, g, interpret=True, worklist=True, sublanes=64,
            mt_group=mg, visit_batch=vb,
        )
        _assert_hits_equal(hit, bf)
        occ = intersect_matrix(
            o, d, g, t_max=jnp.full((1024,), 2.5), interpret=True,
            any_hit=True, worklist=True, sublanes=64, mt_group=mg,
            visit_batch=vb,
        )
        bf_t = intersect_bruteforce(
            o, d, g.tri_v0, g.tri_e1, g.tri_e2, t_max=2.5, chunk=128
        )
        np.testing.assert_array_equal(
            np.asarray(occ.tri) >= 0, np.asarray(bf_t.tri) >= 0
        )

    def test_worklist_batch4_exact(self, geom, rs):
        """4-cluster batched visits (legal only when visit_batch *
        n_groups <= 8 worklist nibbles; mg=bs pins n_groups=1). The
        all-8-entry list has no sentinel nibble, so the drain must
        bound its iteration count — this is the case that can hang."""
        g = geom
        o, d = _rays(1024, rs)
        bf = intersect_bruteforce(
            o, d, g.tri_v0, g.tri_e1, g.tri_e2, chunk=128
        )
        hit = intersect_matrix(
            o, d, g, interpret=True, worklist=True, visit_batch=4,
            sublanes=32, mt_group=32,
        )
        _assert_hits_equal(hit, bf)
        occ = intersect_matrix(
            o, d, g, t_max=jnp.full((1024,), 2.5), interpret=True,
            any_hit=True, worklist=True, visit_batch=4,
            sublanes=32, mt_group=32,
        )
        bf_t = intersect_bruteforce(
            o, d, g.tri_v0, g.tri_e1, g.tri_e2, t_max=2.5, chunk=128
        )
        np.testing.assert_array_equal(
            np.asarray(occ.tri) >= 0, np.asarray(bf_t.tri) >= 0
        )

    @pytest.mark.parametrize("bs", [8, 16])
    def test_short_tiles_exact(self, geom, rs, bs):
        """Tile heights BELOW the 16-sublane predication group must
        still test triangles. Scenes past ~1024 clusters shrink the
        adaptive tile to bs=8 (8 MB key-matrix cap), and an unguarded
        range(bs // 16) == range(0) silently skipped the entire
        Moller-Trumbore stage — every ray missed and large-scene
        renders were sky-only (caught on atrium_big, 1861 clusters)."""
        g = geom
        o, d = _rays(1024, rs)
        bf = intersect_bruteforce(
            o, d, g.tri_v0, g.tri_e1, g.tri_e2, chunk=128
        )
        hit = intersect_matrix(o, d, g, interpret=True, sublanes=bs)
        _assert_hits_equal(hit, bf)
        occ = intersect_matrix(
            o, d, g, t_max=jnp.full((1024,), 2.5), interpret=True,
            any_hit=True, sublanes=bs,
        )
        bf_t = intersect_bruteforce(
            o, d, g.tri_v0, g.tri_e1, g.tri_e2, t_max=2.5, chunk=128
        )
        np.testing.assert_array_equal(
            np.asarray(occ.tri) >= 0, np.asarray(bf_t.tri) >= 0
        )


def _assert_hits_close(hit, bf):
    """MXU-matmul parity: the fp32 MXU contraction rounds differently
    from the VPU's sequential Moller-Trumbore, so t matches to ~1e-4
    relative and tri may flip only between EQUAL-t candidates (shared
    edges / coplanar surfaces)."""
    tb = np.asarray(bf.t)
    th = np.asarray(hit.t)
    np.testing.assert_allclose(th, tb, rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(
        np.asarray(hit.tri) >= 0, np.asarray(bf.tri) >= 0
    )
    same = np.asarray(hit.tri) == np.asarray(bf.tri)
    # any tri flip must be a near-tie in t
    assert np.abs(th - tb)[~same].max(initial=0.0) < 2e-3
    m = (np.asarray(bf.tri) >= 0) & same
    np.testing.assert_allclose(np.asarray(hit.u)[m], np.asarray(bf.u)[m], atol=1e-3)
    np.testing.assert_allclose(np.asarray(hit.v)[m], np.asarray(bf.v)[m], atol=1e-3)


class TestGrouped:
    def test_exact_vs_bruteforce(self, geom, rs):
        from hala_tpu.ops.traverse import intersect_grouped

        g = geom
        o, d = _rays(2048, rs)
        bf = intersect_bruteforce(o, d, g.tri_v0, g.tri_e1, g.tri_e2, chunk=128)
        hit = intersect_grouped(o, d, g, interpret=True)
        _assert_hits_close(hit, bf)

    def test_tiny_caps_force_fallback(self, geom, rs):
        """k_cap truncation must stay exact via the intersect_matrix
        fallback (bound = nearest untested entry distance)."""
        from hala_tpu.ops.traverse import intersect_grouped

        g = geom
        o, d = _rays(1024, rs)
        bf = intersect_bruteforce(o, d, g.tri_v0, g.tri_e1, g.tri_e2, chunk=128)
        hit = intersect_grouped(
            o, d, g, interpret=True, k_cap=3
        )
        _assert_hits_close(hit, bf)

    def test_group_composition_bit_identity(self, geom, rs):
        """Round-2 advisor finding: with k_cap truncation firing, which
        engine (MXU kernel vs matrix fallback) resolves a ray depends
        on its GROUP's union; canonical re-eval of both merge
        candidates (ops/intersect.canonical_hit) makes the reported
        bits a pure function of (ray, winning triangle) — so the same
        ray in a different batch order must get identical bits."""
        from hala_tpu.ops.traverse import intersect_grouped

        g = geom
        o, d = _rays(512, rs)
        perm = jnp.asarray(rs.permutation(512))
        hit_a = intersect_grouped(o, d, g, interpret=True, k_cap=2)
        hit_b = intersect_grouped(
            o[perm], d[perm], g, interpret=True, k_cap=2
        )
        pa = np.asarray(perm)
        np.testing.assert_array_equal(
            np.asarray(hit_a.t)[pa], np.asarray(hit_b.t)
        )
        np.testing.assert_array_equal(
            np.asarray(hit_a.tri)[pa], np.asarray(hit_b.tri)
        )
        np.testing.assert_array_equal(
            np.asarray(hit_a.u)[pa], np.asarray(hit_b.u)
        )
        np.testing.assert_array_equal(
            np.asarray(hit_a.v)[pa], np.asarray(hit_b.v)
        )

    def test_any_hit(self, geom, rs):
        from hala_tpu.ops.intersect import occluded_bruteforce
        from hala_tpu.ops.traverse import intersect_grouped

        g = geom
        o, d = _rays(512, rs)
        tf = jnp.full((512,), 3.0)
        bf = occluded_bruteforce(o, d, tf, g.tri_v0, g.tri_e1, g.tri_e2)
        hit = intersect_grouped(
            o, d, g, t_max=tf, interpret=True, any_hit=True
        )
        np.testing.assert_array_equal(np.asarray(hit.tri) >= 0, np.asarray(bf))

    def test_ragged_n_and_dead_rays(self, geom, rs):
        from hala_tpu.ops.traverse import intersect_grouped

        g = geom
        o, d = _rays(300, rs)  # not a multiple of GROUP
        tm = jnp.where(jnp.arange(300) % 3 == 0, 0.0, T_MAX)
        bf = intersect_bruteforce(
            o, d, g.tri_v0, g.tri_e1, g.tri_e2, t_max=tm, chunk=128
        )
        hit = intersect_grouped(o, d, g, t_max=tm, interpret=True)
        _assert_hits_close(hit, bf)
        assert (np.asarray(hit.tri)[::3] == -1).all()


class TestQuarterMillionTris:
    """Capacity coverage above the bench asset: 226k triangles / 2514
    SAH clusters (atrium_big, the largest scene ever measured, is 167k
    tris / 1861 clusters — and its traversal exactness had only ever
    been exercised on real hardware). Exactness at this scale guards
    the adaptive tile-height + keyless-selection paths the small
    fixtures never reach; the round-3 zero-triangle bug (silent
    sky-only frames past ~1024 clusters) is exactly the class of
    regression this would catch."""

    def test_matrix_exact_at_226k_tris(self):
        from hala_tpu.scene.procedural import sponza_like

        dev = SceneUploader.upload(
            sponza_like(rooms=(28, 28), columns_per_room=8,
                        boxes_per_room=14),
            use_ray_tracing=False,
        )
        g = dev.geometry
        assert int(g.num_triangles) > 200_000
        assert g.tri_packed.shape[0] > 2_000  # clusters beyond atrium_big
        rs = np.random.RandomState(5)
        n = 256
        o = np.tile(
            np.asarray([50.0, 1.5, 50.0], np.float32), (n, 1)
        ) + rs.uniform(-20, 20, (n, 3)).astype(np.float32)
        d = rs.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        o, d = jnp.asarray(o), jnp.asarray(d)
        bf = intersect_bruteforce(o, d, g.tri_v0, g.tri_e1, g.tri_e2)
        hit = intersect_matrix(o, d, g, interpret=True)
        _assert_hits_equal(hit, bf)
        assert int((np.asarray(bf.tri) >= 0).sum()) > 100


@pytest.fixture(scope="module")
def big_scene_5680():
    """508k triangles / 5680 SAH clusters — past the old 4096-cluster
    key cap AND the cull kernel's 2560-cluster VMEM cap."""
    from hala_tpu.scene.procedural import sponza_like

    dev = SceneUploader.upload(
        sponza_like(rooms=(42, 42), columns_per_room=8,
                    boxes_per_room=14),
        use_ray_tracing=False,
    )
    assert dev.geometry.tri_packed.shape[0] > 4096
    return dev.geometry


def _big_rays(n, seed):
    rs = np.random.RandomState(seed)
    o = np.tile(
        np.asarray([70.0, 1.5, 70.0], np.float32), (n, 1)
    ) + rs.uniform(-30, 30, (n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.skipif(
    not os.environ.get("HALA_BIG_TESTS"),
    reason="~6 min scene build; opt in with HALA_BIG_TESTS=1",
)
class TestMatrixBeyond4096Clusters:
    """Capacity coverage for the 13-bit cluster-id key (_ID_BITS):
    508k triangles / 5680 SAH clusters exceeds the old 4096-cluster
    cap. Exactness here guards the widened key's rounding interplay
    (fill rounds tn DOWN, the liveness bound rounds t UP) at a scale
    no checked-in asset reaches."""

    def test_matrix_exact_at_508k_tris(self, big_scene_5680):
        g = big_scene_5680
        o, d = _big_rays(128, 7)
        bf = intersect_bruteforce(o, d, g.tri_v0, g.tri_e1, g.tri_e2)
        hit = intersect_matrix(o, d, g, interpret=True)
        _assert_hits_equal(hit, bf)
        # sanity: a meaningful share of rays actually hit (48 measured)
        assert int((np.asarray(bf.tri) >= 0).sum()) > 40

    def test_wavefront_anyhit_beyond_cull_vmem_cap(self, big_scene_5680):
        """5680 clusters exceed CULL_VMEM_CLUSTER_CAP (2560): the cull
        runs its chunked per-cluster-chunk merge inside the wavefront's
        any-hit shadow path; occlusion must match brute force."""
        from hala_tpu.ops.cull import CULL_VMEM_CLUSTER_CAP
        from hala_tpu.ops.intersect import occluded_bruteforce
        from hala_tpu.ops.wavefront import intersect_wavefront

        g = big_scene_5680
        assert g.tri_packed.shape[0] > CULL_VMEM_CLUSTER_CAP
        o, d = _big_rays(128, 11)
        t_far = jnp.full((128,), 25.0)
        ref = occluded_bruteforce(
            o, d, t_far, g.tri_v0, g.tri_e1, g.tri_e2
        )
        hit = intersect_wavefront(
            o, d, g, t_max=t_far, any_hit=True, interpret=True
        )
        np.testing.assert_array_equal(
            np.asarray(hit.tri >= 0), np.asarray(ref)
        )


@pytest.mark.skipif(
    not os.environ.get("HALA_BIG_TESTS"),
    reason="~15 min scene build; opt in with HALA_BIG_TESTS=1",
)
class TestTraverseBeyondKeyWidth:
    """The >MATRIX_MAX_CLUSTERS (8191) fallback end-to-end: ~930k
    triangles / >8192 SAH clusters exceed the 13-bit packed-key width
    of every other large-scene engine, so _backend routes to
    intersect_traversed, whose kernel cull must run the unpacked
    superchunk merge (cull_candidates) for real. Exactness vs brute
    force at a scale no packed-key engine can address."""

    def test_traversed_exact_past_8192_clusters(self):
        from hala_tpu.ops.traverse import MATRIX_MAX_CLUSTERS
        from hala_tpu.scene.procedural import sponza_like

        g = SceneUploader.upload(
            sponza_like(rooms=(56, 56), columns_per_room=8,
                        boxes_per_room=16),
            use_ray_tracing=False,
        ).geometry
        assert g.tri_packed.shape[0] > MATRIX_MAX_CLUSTERS
        o, d = _big_rays(128, 13)
        bf = intersect_bruteforce(o, d, g.tri_v0, g.tri_e1, g.tri_e2)
        hit = intersect_traversed(o, d, g, k_per_ray=8, interpret=True)
        _assert_hits_equal(hit, bf)
        assert int((np.asarray(bf.tri) >= 0).sum()) > 40


@pytest.fixture(scope="module")
def geom_page():
    """63 clusters — enough that supercluster pages (2..16) are real
    and the tail page is ragged for every size."""
    from hala_tpu.scene.procedural import sponza_like

    scene = sponza_like(rooms=(6, 6), columns_per_room=8,
                        boxes_per_room=4)
    return SceneUploader.upload(scene, use_ray_tracing=False).geometry


class TestMatrixPages:
    """Supercluster page selection (VERDICT round-4 item 1): selection
    runs over union-AABB pages of consecutive SAH-adjacent clusters and
    each drain round serves a whole page through one merged worklist.
    Must stay bit-equal to brute force for every page size, both query
    classes, and ragged tail pages (63 % page != 0 for all sizes)."""

    @pytest.mark.parametrize("page", [2, 4, 8, 16])
    def test_page_exact(self, geom_page, rs, page):
        g = geom_page
        o, d = _rays(1024, rs)
        bf = intersect_bruteforce(
            o, d, g.tri_v0, g.tri_e1, g.tri_e2, chunk=128
        )
        hit = intersect_matrix(
            o, d, g, interpret=True, worklist=True, page=page,
            sublanes=32,
        )
        _assert_hits_equal(hit, bf)
        occ = intersect_matrix(
            o, d, g, t_max=jnp.full((1024,), 2.5), interpret=True,
            any_hit=True, worklist=True, page=page, sublanes=32,
        )
        bf_t = intersect_bruteforce(
            o, d, g.tri_v0, g.tri_e1, g.tri_e2, t_max=2.5, chunk=128
        )
        np.testing.assert_array_equal(
            np.asarray(occ.tri) >= 0, np.asarray(bf_t.tri) >= 0
        )

    def test_page_sorted_query(self, geom_page, rs):
        """matrix_query passes `page` through the fused sort path."""
        from hala_tpu.ops.traverse import matrix_query

        g = geom_page
        o, d = _rays(512, rs)
        bf = intersect_bruteforce(
            o, d, g.tri_v0, g.tri_e1, g.tri_e2, chunk=128
        )
        hit = matrix_query(
            o, d, g, interpret=True, page=8, sublanes=32,
        )
        _assert_hits_equal(hit, bf)

    def test_page_gates_off_small_scene(self, geom, rs):
        """c <= page degrades to the flat (page=1) path, still exact."""
        g = geom
        o, d = _rays(256, rs)
        bf = intersect_bruteforce(
            o, d, g.tri_v0, g.tri_e1, g.tri_e2, chunk=128
        )
        hit = intersect_matrix(
            o, d, g, interpret=True, worklist=True, page=8, sublanes=32,
        )
        _assert_hits_equal(hit, bf)
