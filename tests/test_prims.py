"""Procedural (non-triangle) primitive tests: analytic spheres traced
next to triangles through the standard visibility dispatch.

Role parity: the reference's AABB-geometry + intersection-shader path
(/root/reference/src/scene/loader/gpu_uploader.rs:818-840) and the
PROCEDURAL hit-group class (/root/reference/src/rt_renderer.rs:1016-
1112): custom primitives intersect, shade with the full material
system, and block shadow rays.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hala_tpu.models.integrator import RenderSettings, trace_paths
from hala_tpu.models.rt_renderer import RayTracingRenderer
from hala_tpu.ops.intersect import Hit, T_MAX
from hala_tpu.ops.prims import (
    PROC_BASE, DeviceProcedural, intersect_spheres, merge_procedural,
    occluded_spheres,
)
from hala_tpu.scene.cpu.prims import ProceduralSphere
from hala_tpu.scene.procedural import cornell_box
from hala_tpu.scene.loader.uploader import SceneUploader


def _table(centers, radii, mats):
    centers = jnp.asarray(np.array(centers, np.float32).reshape(-1, 3))
    radii = jnp.asarray(np.array(radii, np.float32))
    mats = jnp.asarray(np.array(mats, np.int32))
    packed = np.zeros((centers.shape[0], 8), np.float32)
    packed[:, 0:3] = np.asarray(centers)
    packed[:, 3] = np.asarray(radii)
    packed[:, 4] = np.asarray(mats)
    return DeviceProcedural(
        center=centers, radius=radii, mat=mats,
        packed=jnp.asarray(packed), num_prims=centers.shape[0],
    )


class TestSphereIntersection:
    def test_closed_form(self):
        # ray down +Z at a unit sphere 5 away: hits at t=4 (front face)
        proc = _table([[0.0, 0.0, 5.0]], [1.0], [0])
        o = jnp.asarray([[0.0, 0.0, 0.0], [3.0, 0.0, 0.0]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]], jnp.float32)
        hit = jax.jit(intersect_spheres)(proc, o, d)
        assert np.allclose(hit.t[0], 4.0, atol=1e-5)
        assert int(hit.tri[0]) == PROC_BASE
        assert int(hit.tri[1]) == -1 and float(hit.t[1]) == float(T_MAX)

    def test_inside_hits_far_side(self):
        proc = _table([[0.0, 0.0, 0.0]], [2.0], [0])
        o = jnp.zeros((1, 3), jnp.float32)
        d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
        hit = jax.jit(intersect_spheres)(proc, o, d)
        assert np.allclose(hit.t[0], 2.0, atol=1e-5)

    def test_closest_of_two(self):
        proc = _table(
            [[0.0, 0.0, 5.0], [0.0, 0.0, 3.0]], [0.5, 0.5], [0, 1]
        )
        o = jnp.zeros((1, 3), jnp.float32)
        d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        hit = jax.jit(intersect_spheres)(proc, o, d)
        assert int(hit.tri[0]) == PROC_BASE + 1
        assert np.allclose(hit.t[0], 2.5, atol=1e-5)

    def test_t_max_excludes(self):
        proc = _table([[0.0, 0.0, 5.0]], [1.0], [0])
        o = jnp.zeros((1, 3), jnp.float32)
        d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        hit = jax.jit(
            lambda p, o, d: intersect_spheres(p, o, d, t_max=3.0)
        )(proc, o, d)
        assert int(hit.tri[0]) == -1

    def test_occluded_window(self):
        proc = _table([[0.0, 0.0, 5.0]], [1.0], [0])
        o = jnp.zeros((2, 3), jnp.float32)
        d = jnp.asarray(
            [[0.0, 0.0, 1.0], [0.0, 1.0, 0.0]], jnp.float32
        )
        occ = jax.jit(
            lambda p, o, d: occluded_spheres(p, o, d, jnp.float32(10.0))
        )(proc, o, d)
        assert bool(occ[0]) and not bool(occ[1])
        occ2 = jax.jit(
            lambda p, o, d: occluded_spheres(p, o, d, jnp.float32(3.0))
        )(proc, o, d)
        assert not bool(occ2[0])

    def test_merge_prefers_closer_triangle(self):
        proc = _table([[0.0, 0.0, 5.0]], [1.0], [0])
        o = jnp.zeros((1, 3), jnp.float32)
        d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        tri_hit = Hit(
            t=jnp.asarray([2.0], jnp.float32),
            tri=jnp.asarray([7], jnp.int32),
            u=jnp.asarray([0.1], jnp.float32),
            v=jnp.asarray([0.2], jnp.float32),
        )
        m = jax.jit(merge_procedural)(proc, o, d, tri_hit)
        assert int(m.tri[0]) == 7
        tri_far = tri_hit._replace(t=jnp.asarray([9.0], jnp.float32))
        m2 = jax.jit(merge_procedural)(proc, o, d, tri_far)
        assert int(m2.tri[0]) == PROC_BASE
        assert np.allclose(m2.t[0], 4.0, atol=1e-5)


def _cornell_with_sphere(radius=0.35, emissive=False):
    """Cornell box + a procedural sphere floating in the middle."""
    scene = cornell_box()
    from hala_tpu.scene.cpu.material import Material

    mat = Material()
    mat.base_color = np.array([0.2, 0.4, 0.9], np.float32)
    if emissive:
        mat.emission = np.array([4.0, 4.0, 4.0], np.float32)
    scene.materials.append(mat)
    scene.procedurals.append(
        ProceduralSphere(
            center=(0.0, 0.0, 0.0), radius=radius,
            material=len(scene.materials) - 1,
        )
    )
    return scene


class TestProceduralRender:
    def _render(self, scene, frames=2, size=48):
        r = RayTracingRenderer(
            "prim", size, size, max_frames=frames, tile_size=size * size
        )
        r.set_scene(scene)
        r.commit()
        r.render_loop(frames)
        return r

    def test_sphere_visible_in_albedo(self):
        r = self._render(_cornell_with_sphere())
        alb = np.asarray(r.film.albedo)[:, :, :3]
        h, w = alb.shape[:2]
        center = alb[h // 2 - 2 : h // 2 + 2, w // 2 - 2 : w // 2 + 2]
        # center pixels see the blue sphere, not the white back wall
        assert center[..., 2].mean() > 1.5 * center[..., 0].mean(), (
            center.mean(axis=(0, 1))
        )

    def test_sphere_casts_shadow(self):
        base = self._render(cornell_box(), frames=2)
        with_s = self._render(_cornell_with_sphere(), frames=2)
        img0 = np.asarray(base.get_final_image())
        img1 = np.asarray(with_s.get_final_image())
        h, w = img0.shape[:2]
        # floor below the sphere darkens (NEE shadow ray blocked)
        floor0 = img0[int(h * 0.88) :, w // 2 - 4 : w // 2 + 4].mean()
        floor1 = img1[int(h * 0.88) :, w // 2 - 4 : w // 2 + 4].mean()
        assert floor1 < floor0 * 0.9, (floor0, floor1)

    def test_emissive_sphere_lights_scene(self):
        lit = self._render(_cornell_with_sphere(emissive=True), frames=2)
        img = np.asarray(lit.get_final_image())
        h, w = img.shape[:2]
        center = img[h // 2 - 2 : h // 2 + 2, w // 2 - 2 : w // 2 + 2]
        assert center.mean() > 0.5  # emission visible on hit

    def test_no_procedural_bit_identical(self):
        # a scene WITHOUT procedurals must compile to the same program
        # as before the feature existed: compare against the golden-run
        # path by asserting scene.procedural is None end-to-end
        scene = SceneUploader.upload(cornell_box())
        assert scene.procedural is None


class TestProceduralStaged:
    def test_staged_bit_equal_to_megakernel(self):
        """The staged dispatcher must trace procedural prims identically
        to the megakernel (the sphere merge rides _intersect/_occluded
        in both paths; bit-equality is the staged contract)."""
        scene = _cornell_with_sphere()
        r1 = RayTracingRenderer(
            "mk", 32, 32, max_frames=1, tile_size=512, max_depth=3
        )
        r1.set_scene(scene)
        r1.commit()
        r1.render_loop(1)
        r2 = RayTracingRenderer(
            "st", 32, 32, max_frames=1, tile_size=512, max_depth=3,
            staged=True,
        )
        r2.set_scene(scene)
        r2.commit()
        r2.render_loop(1)
        np.testing.assert_array_equal(
            np.asarray(r1.film.accum), np.asarray(r2.film.accum)
        )


class TestProceduralTiling:
    def test_film_tiling_bit_identity(self):
        """Sphere hits are pure functions of (o, d): film-tiled render
        must stay bit-identical with procedural prims present."""
        scene = _cornell_with_sphere()
        r1 = RayTracingRenderer(
            "full", 32, 32, max_frames=1, tile_size=1024
        )
        r1.set_scene(scene)
        r1.commit()
        r1.render_loop(1)
        r2 = RayTracingRenderer(
            "tiled", 32, 32, max_frames=1, tile_size=256
        )
        r2.set_scene(scene)
        r2.commit()
        r2.render_loop(1)
        a = np.asarray(r1.film.accum)
        b = np.asarray(r2.film.accum)
        np.testing.assert_array_equal(a, b)
