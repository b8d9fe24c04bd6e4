"""Rank-iteration wavefront traversal + Pallas cull vs brute force.

The wavefront replaces the reference's hardware BVH role
(/root/reference/src/scene/loader/gpu_uploader.rs:774-967) for large
scenes and must be EXACT up to winner-identity ties on coincident
geometry (the canonical re-evaluation makes t/u/v match the brute-force
arithmetic wherever the winning triangle agrees). Run in interpret mode
on CPU.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hala_tpu.ops.cull import INF_KEY, _ID_MASK, cull_topk
from hala_tpu.ops.intersect import (
    T_MAX,
    intersect_bruteforce,
    occluded_bruteforce,
)
from hala_tpu.ops.traverse import cull_ordered, matrix_query
from hala_tpu.ops.wavefront import intersect_wavefront
from hala_tpu.scene.loader.uploader import SceneUploader
from hala_tpu.scene.procedural import sponza_like


@pytest.fixture(scope="module")
def geom():
    scene = sponza_like(rooms=(2, 2), columns_per_room=4, boxes_per_room=2)
    return SceneUploader.upload(scene, use_ray_tracing=False).geometry


@pytest.fixture(scope="module")
def geom_sah():
    """A >4096-triangle scene so the uploader picks the binned-SAH
    layout (interior padding slots — the large-scene case the wavefront
    is built for)."""
    scene = sponza_like(rooms=(4, 4), columns_per_room=4, boxes_per_room=16)
    g = SceneUploader.upload(scene, use_ray_tracing=False).geometry
    assert not g.prefix_layout
    return g


def _rays(n, rs, center=(4.0, 1.5, 4.0)):
    o = np.tile(np.asarray(center, np.float32), (n, 1))
    o += rs.uniform(-1, 1, (n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _assert_canonical_equal(hit, bf):
    """Canonical re-evaluation uses the brute-force formulas, so t/u/v
    agree tightly wherever the winning triangle agrees; winner identity
    may flip only between (near-)equal-t candidates (shared edges /
    coplanar surfaces)."""
    th, tb = np.asarray(hit.t), np.asarray(bf.t)
    trih, trib = np.asarray(hit.tri), np.asarray(bf.tri)
    np.testing.assert_array_equal(trih >= 0, trib >= 0)
    same = trih == trib
    # any winner flip must be a near-tie in t
    assert np.abs(th - tb)[~same].max(initial=0.0) < 1e-4
    m = (trib >= 0) & same
    np.testing.assert_allclose(th[m], tb[m], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(hit.u)[m], np.asarray(bf.u)[m],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(hit.v)[m], np.asarray(bf.v)[m],
                               atol=1e-6)


class TestCullTopk:
    def test_matches_cull_ordered(self, geom, rs):
        g = geom
        o, d = _rays(512, rs)
        tm = jnp.full((512,), T_MAX)
        k = 6
        pk, cnt = cull_topk(
            o, d, tm, g.cluster_min, g.cluster_max, k=k, interpret=True
        )
        ids_r, tns_r, ovf_r = cull_ordered(
            o, d, tm, g.cluster_min, g.cluster_max, k
        )
        pk, cnt = np.asarray(pk), np.asarray(cnt)
        ids_r = np.asarray(ids_r)
        ids_k = np.where(pk != INF_KEY, pk & _ID_MASK, -1)
        ids_ref = np.where(ids_r < 0x3FFFFFFF, ids_r, -1)
        for i in range(512):
            assert set(ids_k[i][ids_k[i] >= 0]) == set(
                ids_ref[i][ids_ref[i] >= 0]
            ), i
        # packed keys strictly ascending (ids break rounded-tn ties)
        for i in range(512):
            v = pk[i][pk[i] != INF_KEY].astype(np.int64)
            assert (np.diff(v) > 0).all()
        np.testing.assert_array_equal(cnt > k, np.asarray(ovf_r))

    def test_dead_rays_have_no_candidates(self, geom, rs):
        g = geom
        o, d = _rays(256, rs)
        tm = jnp.zeros((256,))
        pk, cnt = cull_topk(
            o, d, tm, g.cluster_min, g.cluster_max, k=4, interpret=True
        )
        assert (np.asarray(cnt) == 0).all()
        assert (np.asarray(pk) == INF_KEY).all()

    def test_shadow_tmax_prunes(self, geom, rs):
        """Candidates beyond t_max must not appear (shadow queries)."""
        g = geom
        o, d = _rays(256, rs)
        tm_near = jnp.full((256,), 0.5)
        tm_far = jnp.full((256,), T_MAX)
        _, cnt_near = cull_topk(
            o, d, tm_near, g.cluster_min, g.cluster_max, k=8, interpret=True
        )
        _, cnt_far = cull_topk(
            o, d, tm_far, g.cluster_min, g.cluster_max, k=8, interpret=True
        )
        assert (np.asarray(cnt_near) <= np.asarray(cnt_far)).all()
        assert np.asarray(cnt_near).sum() < np.asarray(cnt_far).sum()

    @pytest.mark.parametrize("chunk", [16, 8, 3])
    def test_chunked_merge_matches_single(self, geom_sah, rs, chunk):
        """The >VMEM-cap path: per-cluster-chunk kernel calls + row-sort
        merge must be bit-equal to the single-call kernel (exact merge:
        a candidate outside its chunk's top-K is farther than K
        same-chunk candidates, so it can never make the global top-K)."""
        g = geom_sah
        o, d = _rays(512, rs, center=(8.0, 1.5, 8.0))
        tm = jnp.full((512,), T_MAX)
        pk0, cnt0 = cull_topk(
            o, d, tm, g.cluster_min, g.cluster_max, k=8, interpret=True
        )
        pk1, cnt1 = cull_topk(
            o, d, tm, g.cluster_min, g.cluster_max, k=8, interpret=True,
            chunk=chunk,
        )
        assert g.cluster_min.shape[0] > chunk  # the merge path ran
        np.testing.assert_array_equal(np.asarray(pk0), np.asarray(pk1))
        np.testing.assert_array_equal(np.asarray(cnt0), np.asarray(cnt1))


class TestWavefront:
    @pytest.mark.parametrize(
        "kw",
        [dict(), dict(k_per_ray=2), dict(k_per_ray=3, m_group=8)],
        ids=["default", "ray-overflow", "tiny-caps"],
    )
    def test_exact_vs_bruteforce(self, geom, rs, kw):
        """Tiny caps force per-ray cull overflow and group M-cap
        truncation; the matrix fallback must keep the result exact."""
        g = geom
        o, d = _rays(2048, rs)
        bf = intersect_bruteforce(o, d, g.tri_v0, g.tri_e1, g.tri_e2,
                                  chunk=128)
        hit = intersect_wavefront(o, d, g, interpret=True, **kw)
        _assert_canonical_equal(hit, bf)

    def test_exact_on_sah_layout(self, geom_sah, rs):
        g = geom_sah
        o, d = _rays(1024, rs, center=(8.0, 1.5, 8.0))
        bf = intersect_bruteforce(o, d, g.tri_v0, g.tri_e1, g.tri_e2,
                                  chunk=128)
        hit = intersect_wavefront(
            o, d, g, interpret=True, k_per_ray=8, m_group=16
        )
        _assert_canonical_equal(hit, bf)

    def test_any_hit(self, geom, rs):
        g = geom
        o, d = _rays(512, rs)
        tf = jnp.full((512,), 3.0)
        bf = occluded_bruteforce(o, d, tf, g.tri_v0, g.tri_e1, g.tri_e2)
        hit = intersect_wavefront(
            o, d, g, t_max=tf, interpret=True, any_hit=True
        )
        np.testing.assert_array_equal(np.asarray(hit.tri) >= 0,
                                      np.asarray(bf))

    def test_any_hit_truncated(self, geom, rs):
        g = geom
        o, d = _rays(512, rs)
        tf = jnp.full((512,), 3.0)
        bf = occluded_bruteforce(o, d, tf, g.tri_v0, g.tri_e1, g.tri_e2)
        hit = intersect_wavefront(
            o, d, g, t_max=tf, interpret=True, any_hit=True,
            k_per_ray=2, m_group=8,
        )
        np.testing.assert_array_equal(np.asarray(hit.tri) >= 0,
                                      np.asarray(bf))

    def test_ragged_n_and_dead_rays(self, geom, rs):
        g = geom
        o, d = _rays(300, rs)  # not a multiple of GROUP
        tm = jnp.where(jnp.arange(300) % 3 == 0, 0.0, T_MAX)
        bf = intersect_bruteforce(
            o, d, g.tri_v0, g.tri_e1, g.tri_e2, t_max=tm, chunk=128
        )
        hit = intersect_wavefront(o, d, g, t_max=tm, interpret=True)
        _assert_canonical_equal(hit, bf)
        assert (np.asarray(hit.tri)[::3] == -1).all()

    def test_sorted_query_unsorts_correctly(self, geom, rs):
        g = geom
        o, d = _rays(1024, rs)
        bf = intersect_bruteforce(o, d, g.tri_v0, g.tri_e1, g.tri_e2,
                                  chunk=128)
        hit = matrix_query(o, d, g, interpret=True, kernel="wavefront")
        _assert_canonical_equal(hit, bf)

    @pytest.mark.parametrize("any_hit", [False, True])
    def test_signature_sort_key_exact(self, geom, rs, any_hit):
        """matrix_query(sort_key="signature") — rays ordered by their
        cull candidate signature instead of origin-Morton — must return
        bit-identical hits (the ordering only changes kernel tile
        grouping; the matrix kernel is exact under any permutation)."""
        g = geom
        o, d = _rays(1024, rs)
        tmx = jnp.full((1024,), 2.5) if any_hit else None
        base = matrix_query(
            o, d, g, t_max=tmx, interpret=True, any_hit=any_hit
        )
        sig = matrix_query(
            o, d, g, t_max=tmx, interpret=True, any_hit=any_hit,
            sort_key="signature",
        )
        if any_hit:
            np.testing.assert_array_equal(
                np.asarray(sig.tri) >= 0, np.asarray(base.tri) >= 0
            )
        else:
            np.testing.assert_array_equal(
                np.asarray(sig.tri), np.asarray(base.tri)
            )
            np.testing.assert_allclose(
                np.asarray(sig.t), np.asarray(base.t), rtol=1e-6
            )
