"""Dense gather-MT intersector (ops/dense.py) vs brute force.

The dense path replaces the hardware-BVH trace role
(/root/reference/src/scene/loader/gpu_uploader.rs:774-967) with
per-ray candidate lists + XLA-vectorized Moller-Trumbore. It must be
EXACT: canonical winners match brute-force bits; the truncation
fallback must keep tiny-K results correct; per-ray bits must be
independent of batch composition (multi-chip invariant).
Interpret mode on CPU.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hala_tpu.ops.dense import intersect_dense, occluded_dense
from hala_tpu.ops.intersect import (
    T_MAX,
    intersect_bruteforce,
    occluded_bruteforce,
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


def _assert_canonical_equal(hit, bf):
    """Canonical winners: t bit-equal to brute force wherever the
    winning triangle agrees; tri may flip only between near-tie t."""
    bt, ht = np.asarray(bf.t), np.asarray(hit.t)
    np.testing.assert_array_equal(
        np.asarray(hit.tri) >= 0, np.asarray(bf.tri) >= 0
    )
    same = np.asarray(hit.tri) == np.asarray(bf.tri)
    np.testing.assert_array_equal(ht[same], bt[same])
    assert np.abs(ht - bt)[~same].max(initial=0.0) < 1e-3
    m = (np.asarray(bf.tri) >= 0) & same
    np.testing.assert_array_equal(np.asarray(hit.u)[m], np.asarray(bf.u)[m])
    np.testing.assert_array_equal(np.asarray(hit.v)[m], np.asarray(bf.v)[m])


class TestDense:
    def test_exact_vs_bruteforce(self, geom, rs):
        g = geom
        o, d = _rays(1024, rs)
        bf = intersect_bruteforce(
            o, d, g.tri_v0, g.tri_e1, g.tri_e2, chunk=128
        )
        hit = intersect_dense(o, d, g, k=8, interpret=True)
        _assert_canonical_equal(hit, bf)

    def test_tiny_k_forces_fallback(self, geom, rs):
        """k=1 truncates nearly every ray's candidate list: the matrix
        fallback (bound = K-th kept entry distance) must keep the
        result exact."""
        g = geom
        o, d = _rays(512, rs)
        bf = intersect_bruteforce(
            o, d, g.tri_v0, g.tri_e1, g.tri_e2, chunk=128
        )
        hit = intersect_dense(o, d, g, k=1, interpret=True)
        _assert_canonical_equal(hit, bf)

    def test_any_hit(self, geom, rs):
        g = geom
        o, d = _rays(512, rs)
        tf = jnp.full((512,), 3.0)
        bf = occluded_bruteforce(o, d, tf, g.tri_v0, g.tri_e1, g.tri_e2)
        # occluded_bruteforce shrinks t_far by 1e-4 internally; match it
        # (the integrator's _occluded applies the same shrink).
        occ = occluded_dense(
            o, d, tf * (1.0 - 1e-4), g, k=8, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(occ), np.asarray(bf))

    def test_dead_rays_and_t_max(self, geom, rs):
        g = geom
        n = 300  # not a lane multiple
        o, d = _rays(n, rs)
        tm = jnp.where(jnp.arange(n) % 3 == 0, 0.0, jnp.float32(T_MAX))
        bf = intersect_bruteforce(
            o, d, g.tri_v0, g.tri_e1, g.tri_e2, t_max=tm, chunk=128
        )
        hit = intersect_dense(o, d, g, t_max=tm, k=6, interpret=True)
        _assert_canonical_equal(hit, bf)
        assert (np.asarray(hit.tri)[::3] == -1).all()

    def test_frame_with_dense_shadows_matches_matrix(self, geom, rs):
        """shadow_dense_k routes the split shadow-class dispatch through
        occluded_dense; both engines are exact, so the rendered frame
        must match the matrix-shadow frame (same NEE visibility)."""
        from hala_tpu.models.integrator import (
            Film,
            RenderSettings,
            Uniforms,
            render_frame,
        )
        from hala_tpu.scene.loader.uploader import SceneUploader
        from hala_tpu.scene.procedural import sponza_like

        dev = SceneUploader.upload(
            sponza_like(rooms=(2, 2), columns_per_room=3,
                        boxes_per_room=4),
            use_ray_tracing=False,
        )
        base = dict(
            width=16, height=16, max_depth=2, tile_size=256,
            intersector="matrix", interpret_pallas=True, sort_rays=True,
        )
        uni = Uniforms.default()
        fa, _ = render_frame(
            dev, None, uni, Film.create(16, 16), 0,
            RenderSettings(**base, shadow_dense_k=4),
        )
        fb, _ = render_frame(
            dev, None, uni, Film.create(16, 16), 0,
            RenderSettings(**base),
        )
        np.testing.assert_allclose(
            np.asarray(fa.accum), np.asarray(fb.accum), atol=1e-5
        )

    def test_batch_composition_bit_identity(self, geom, rs):
        """Per-ray results are a pure function of the ray: the same
        rays permuted into a different batch order (different fallback
        cond outcomes per sub-batch) get identical bits — the
        multi-chip sharding invariant."""
        g = geom
        o, d = _rays(512, rs)
        perm = jnp.asarray(rs.permutation(512))
        hit_a = intersect_dense(o, d, g, k=2, interpret=True)
        hit_b = intersect_dense(o[perm], d[perm], g, k=2, interpret=True)
        pa = np.asarray(perm)
        for f in ("t", "tri", "u", "v"):
            np.testing.assert_array_equal(
                np.asarray(getattr(hit_a, f))[pa],
                np.asarray(getattr(hit_b, f)),
            )
