"""Pallas kernel tests (interpret mode on CPU) against the jnp
reference implementations."""

import jax.numpy as jnp
import numpy as np

from hala_tpu.ops.intersect import intersect_bruteforce
from hala_tpu.ops.pallas.intersect_kernel import (
    intersect_pallas,
    occluded_pallas,
)
from hala_tpu.scene.loader.uploader import SceneUploader
from hala_tpu.scene.procedural import cornell_box, random_triangle_soup


def _rays(n, rs):
    o = rs.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


class TestPallasIntersect:
    def test_matches_bruteforce_cornell(self, rs):
        geom = SceneUploader.upload(cornell_box(), use_ray_tracing=False).geometry
        o, d = _rays(300, rs)  # non-multiple of the ray block: pad path
        ref = intersect_bruteforce(
            o, d, geom.tri_v0, geom.tri_e1, geom.tri_e2, chunk=128
        )
        out = intersect_pallas(
            o, d, geom.tri_v0, geom.tri_e1, geom.tri_e2, interpret=True
        )
        np.testing.assert_allclose(np.asarray(out.t), np.asarray(ref.t), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(out.tri), np.asarray(ref.tri))
        hit = np.asarray(ref.tri) >= 0
        np.testing.assert_allclose(
            np.asarray(out.u)[hit], np.asarray(ref.u)[hit], atol=1e-5
        )

    def test_multi_chunk_soup(self, rs):
        """More than one TRI_CHUNK: exercises the grid-j accumulation."""
        scene = random_triangle_soup(300, seed=5)
        geom = SceneUploader._upload_geometry(scene)
        assert geom.tri_v0.shape[0] == 384  # 3 chunks of 128
        o, d = _rays(256, rs)
        ref = intersect_bruteforce(
            o, d, geom.tri_v0, geom.tri_e1, geom.tri_e2, chunk=128
        )
        out = intersect_pallas(
            o, d, geom.tri_v0, geom.tri_e1, geom.tri_e2, interpret=True
        )
        np.testing.assert_allclose(np.asarray(out.t), np.asarray(ref.t), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(out.tri), np.asarray(ref.tri))

    def test_occlusion(self, rs):
        geom = SceneUploader.upload(cornell_box(), use_ray_tracing=False).geometry
        o, d = _rays(128, rs)
        t_far = jnp.full((128,), 1.5)
        from hala_tpu.ops.intersect import occluded_bruteforce

        ref = occluded_bruteforce(
            o, d, t_far, geom.tri_v0, geom.tri_e1, geom.tri_e2, chunk=128
        )
        out = occluded_pallas(
            o, d, t_far, geom.tri_v0, geom.tri_e1, geom.tri_e2, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_t_max_respected(self, rs):
        geom = SceneUploader.upload(cornell_box(), use_ray_tracing=False).geometry
        o = jnp.asarray([[0.0, 0.0, 3.0]])
        d = jnp.asarray([[0.0, 0.0, -1.0]])
        near = intersect_pallas(
            o, d, geom.tri_v0, geom.tri_e1, geom.tri_e2,
            t_max=jnp.asarray([0.5]), interpret=True,
        )
        assert int(near.tri[0]) == -1  # wall is beyond t_max


class TestIntegratorPallasPath:
    def test_render_frame_with_pallas_intersector(self, cornell_device_scene):
        from hala_tpu.models.integrator import (
            Film,
            RenderSettings,
            Uniforms,
            render_frame,
        )

        s = RenderSettings(
            width=16, height=16, max_depth=2, tile_size=256,
            intersector="pallas", interpret_pallas=True,
        )
        s_ref = RenderSettings(
            width=16, height=16, max_depth=2, tile_size=256,
            intersector="bruteforce",
        )
        uni = Uniforms.default()
        fa, _ = render_frame(
            cornell_device_scene, None, uni, Film.create(16, 16), 0, s
        )
        fb, _ = render_frame(
            cornell_device_scene, None, uni, Film.create(16, 16), 0, s_ref
        )
        np.testing.assert_allclose(
            np.asarray(fa.accum), np.asarray(fb.accum), atol=1e-3
        )
