"""Work-item expansion intersector tests (interpret mode) vs brute force."""

import jax.numpy as jnp
import numpy as np
import pytest

from hala_tpu.ops.expand import cull_per_ray, intersect_expanded
from hala_tpu.ops.intersect import T_MAX, intersect_bruteforce
from hala_tpu.scene.loader.uploader import SceneUploader
from hala_tpu.scene.procedural import cornell_box, sponza_like


@pytest.fixture(scope="module")
def sponza_geom():
    scene = sponza_like(rooms=(2, 2), columns_per_room=4, boxes_per_room=2)
    return SceneUploader.upload(scene, use_ray_tracing=False).geometry


def _rays(n, rs, origin=(4.0, 1.5, 4.0)):
    o = np.tile(np.asarray(origin, np.float32), (n, 1))
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


class TestCullPerRay:
    def test_no_overflow_with_enough_k(self, sponza_geom, rs):
        g = sponza_geom
        o, d = _rays(512, rs)
        tm = jnp.full((512,), T_MAX)
        ids, overflow = cull_per_ray(
            o, d, tm, g.cluster_min, g.cluster_max,
            k_per_ray=g.cluster_min.shape[0],
        )
        assert float(overflow) == 0.0
        # hit cluster of brute force is among the candidates
        bf = intersect_bruteforce(o, d, g.tri_v0, g.tri_e1, g.tri_e2, chunk=128)
        tri = np.asarray(bf.tri)
        idn = np.asarray(ids)
        for r in np.nonzero(tri >= 0)[0][:100]:
            assert (tri[r] // 128) in idn[r]


class TestExpandedIntersect:
    def test_matches_bruteforce(self, sponza_geom, rs):
        g = sponza_geom
        o, d = _rays(1024, rs)
        bf = intersect_bruteforce(o, d, g.tri_v0, g.tri_e1, g.tri_e2, chunk=128)
        hit = intersect_expanded(
            o, d, g, k_per_ray=g.cluster_min.shape[0],
            max_runs=g.cluster_min.shape[0] + 1, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(hit.t), np.asarray(bf.t), rtol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(hit.tri), np.asarray(bf.tri))
        m = np.asarray(bf.tri) >= 0
        np.testing.assert_allclose(
            np.asarray(hit.u)[m], np.asarray(bf.u)[m], atol=1e-5
        )

    def test_t_max_respected(self, sponza_geom, rs):
        g = sponza_geom
        o, d = _rays(300, rs)
        t_far = jnp.full((300,), 2.0)
        hit = intersect_expanded(
            o, d, g, t_max=t_far, k_per_ray=g.cluster_min.shape[0],
            max_runs=g.cluster_min.shape[0] + 1, interpret=True,
        )
        valid = np.asarray(hit.tri) >= 0
        assert (np.asarray(hit.t)[valid] < 2.0).all()

    def test_cornell(self, cornell_device_scene, rs):
        g = cornell_device_scene.geometry
        o = jnp.asarray(rs.uniform(-0.9, 0.9, (256, 3)).astype(np.float32))
        dn = rs.normal(size=(256, 3)).astype(np.float32)
        dn /= np.linalg.norm(dn, axis=1, keepdims=True)
        d = jnp.asarray(dn)
        bf = intersect_bruteforce(o, d, g.tri_v0, g.tri_e1, g.tri_e2, chunk=128)
        hit = intersect_expanded(
            o, d, g, k_per_ray=1, max_runs=4, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(hit.tri), np.asarray(bf.tri))


class TestIntegratorExpandPath:
    def test_render_matches_bruteforce(self):
        from hala_tpu.models.integrator import (
            Film,
            RenderSettings,
            Uniforms,
            render_frame,
        )

        scene = SceneUploader.upload(
            sponza_like(rooms=(2, 2), boxes_per_room=2),
            use_ray_tracing=False,
        )
        k = scene.geometry.cluster_min.shape[0]
        uni = Uniforms.default()
        sA = RenderSettings(
            width=16, height=16, max_depth=2, tile_size=256,
            intersector="expand", interpret_pallas=True,
            cluster_k_max=k,
        )
        sB = RenderSettings(
            width=16, height=16, max_depth=2, tile_size=256,
            intersector="bruteforce",
        )
        fa, _ = render_frame(scene, None, uni, Film.create(16, 16), 0, sA)
        fb, _ = render_frame(scene, None, uni, Film.create(16, 16), 0, sB)
        np.testing.assert_allclose(
            np.asarray(fa.accum), np.asarray(fb.accum), atol=1e-3
        )
