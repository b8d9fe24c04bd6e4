"""Intersection + BVH tests: brute force is the ground truth; the BVH
traversal must agree exactly (SURVEY.md section 7 stage 4 validation)."""

import jax.numpy as jnp
import numpy as np

from hala_tpu.ops.bvh import build_bvh, intersect_bvh, occluded_bvh
from hala_tpu.ops.intersect import (
    T_MAX,
    intersect_bruteforce,
    occluded_bruteforce,
    ray_quad,
    ray_sphere,
)
from hala_tpu.scene.loader.uploader import SceneUploader
from hala_tpu.scene.procedural import random_triangle_soup


def _soup_geometry(n_tris=300, seed=1):
    scene = random_triangle_soup(n_tris, seed=seed)
    return SceneUploader._upload_geometry(scene)


def _random_rays(n, rs):
    o = rs.uniform(-2, 2, (n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


class TestBruteForce:
    def test_single_triangle_hit(self):
        v0 = jnp.asarray([[-1.0, -1.0, 0.0]])
        e1 = jnp.asarray([[2.0, 0.0, 0.0]])
        e2 = jnp.asarray([[0.0, 2.0, 0.0]])
        o = jnp.asarray([[0.0, -0.5, -3.0], [5.0, 5.0, -3.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        hit = intersect_bruteforce(o, d, v0, e1, e2, chunk=1)
        assert float(hit.t[0]) == np.float32(3.0)
        assert int(hit.tri[0]) == 0
        assert float(hit.t[1]) == float(T_MAX)
        assert int(hit.tri[1]) == -1

    def test_closest_of_two(self):
        v0 = jnp.asarray([[-1.0, -1.0, 2.0], [-1.0, -1.0, 1.0]])
        e1 = jnp.asarray([[2.0, 0.0, 0.0]] * 2)
        e2 = jnp.asarray([[0.0, 2.0, 0.0]] * 2)
        o = jnp.asarray([[0.0, -0.5, 0.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        hit = intersect_bruteforce(o, d, v0, e1, e2, chunk=2)
        assert int(hit.tri[0]) == 1
        assert float(hit.t[0]) == np.float32(1.0)


class TestBVH:
    def test_matches_bruteforce(self, rs):
        geom = _soup_geometry(300)
        bvh = build_bvh(geom)
        o, d = _random_rays(512, rs)
        bf = intersect_bruteforce(
            o, d, geom.tri_v0, geom.tri_e1, geom.tri_e2, chunk=128
        )
        bv = intersect_bvh(bvh, geom, o, d)
        np.testing.assert_allclose(
            np.asarray(bv.t), np.asarray(bf.t), rtol=1e-5
        )
        # same triangle wherever there's a hit (ties broken equally since
        # t values are identical floats)
        hit_mask = np.asarray(bf.tri) >= 0
        assert (np.asarray(bv.tri) >= 0).tolist() == hit_mask.tolist()

    def test_occlusion_matches(self, rs):
        geom = _soup_geometry(200, seed=7)
        bvh = build_bvh(geom)
        o, d = _random_rays(256, rs)
        t_far = jnp.full((256,), 2.5)
        a = occluded_bruteforce(
            o, d, t_far, geom.tri_v0, geom.tri_e1, geom.tri_e2, chunk=128
        )
        b = occluded_bvh(bvh, geom, o, d, t_far)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_skip_links_cover_all_leaves(self):
        geom = _soup_geometry(100, seed=3)
        bvh = build_bvh(geom)
        first = np.asarray(bvh.first_tri)
        count = np.asarray(bvh.tri_count)
        total = count[first >= 0].sum()
        assert total == geom.num_triangles
        skip = np.asarray(bvh.skip)
        assert (skip > np.arange(len(skip))).all()
        assert (skip <= len(skip)).all()


class TestAnalyticLights:
    def test_ray_sphere(self):
        o = jnp.asarray([[0.0, 0.0, -5.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        c = jnp.asarray([[0.0, 0.0, 0.0]])
        r = jnp.asarray([1.0])
        t = ray_sphere(o, d, c, r)
        assert float(t[0, 0]) == np.float32(4.0)

    def test_ray_quad(self):
        corner = jnp.asarray([[-1.0, -1.0, 0.0]])
        eu = jnp.asarray([[2.0, 0.0, 0.0]])
        ev = jnp.asarray([[0.0, 2.0, 0.0]])
        o = jnp.asarray([[0.5, 0.5, -2.0], [3.0, 0.0, -2.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0]] * 2)
        t = ray_quad(o, d, corner, eu, ev)
        assert float(t[0, 0]) == np.float32(2.0)
        assert float(t[1, 0]) == float(T_MAX)
