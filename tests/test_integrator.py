"""Integrator tests: energy conservation, Cornell Box smoke + statistics,
determinism, AOVs, tonemap parity, PFM roundtrip."""

import jax.numpy as jnp
import numpy as np
import pytest

from hala_tpu.models.integrator import (
    ENV_SKY,
    Film,
    RenderSettings,
    Uniforms,
    render_frame,
)
from hala_tpu.models.rt_renderer import RayTracingRenderer
from hala_tpu.ops.tonemap import (
    apply_tonemap,
    tonemap_aces_fitted,
    tonemap_aces_simple,
    tonemap_reinhard_lum,
)
from hala_tpu.scene.procedural import cornell_box
from hala_tpu.utils.pfm import read_pfm, write_pfm


def _render(scene_dev, frames=2, size=32, env=None, env_type=ENV_SKY,
            uniforms=None, max_depth=3, use_bvh=True):
    settings = RenderSettings(
        width=size, height=size, max_depth=max_depth, rr_depth=2,
        env_type=env_type, tile_size=size * size,
        use_bvh=use_bvh and scene_dev.bvh is not None,
    )
    uniforms = uniforms or Uniforms.default()
    film = Film.create(size, size)
    total_rays = 0.0
    for f in range(frames):
        film, rays = render_frame(scene_dev, env, uniforms, film, f, settings)
        total_rays += float(rays)
    return film, total_rays


class TestSppBatch:
    def test_spp_frame_equals_sequential_frames(self, cornell_device_scene):
        """A spp=S frame must converge identically to S sequential 1-spp
        frames: sample s runs as virtual RNG frame f*S+s, so the only
        difference is accumulation summation order."""
        size = 32
        base = dict(width=size, height=size, max_depth=3, rr_depth=2,
                    tile_size=size * size * 4)
        seq = RenderSettings(**base)
        film_a = Film.create(size, size)
        rays_a = 0.0
        for f in range(4):
            film_a, r = render_frame(
                cornell_device_scene, None, Uniforms.default(), film_a,
                f, seq,
            )
            rays_a += float(r)
        batched = RenderSettings(**base, spp=4)
        film_b, rays_b = render_frame(
            cornell_device_scene, None, Uniforms.default(),
            Film.create(size, size), 0, batched,
        )
        assert float(rays_b) == rays_a  # identical ray population
        np.testing.assert_allclose(
            np.asarray(film_b.accum), np.asarray(film_a.accum),
            rtol=2e-5, atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(film_b.normal), np.asarray(film_a.normal),
            rtol=2e-5, atol=2e-5,
        )

    def test_render_frames_bit_equal_to_sequential(
        self, cornell_device_scene
    ):
        """render_frames(k) fuses K progressive frames into ONE XLA
        program and must be BIT-identical to K render_frame dispatches
        (same RNG streams, same accumulation order — round-5 dispatch
        fusing for the per-program tunnel overhead)."""
        from hala_tpu.models.integrator import render_frames

        size = 32
        s = RenderSettings(width=size, height=size, max_depth=3,
                           rr_depth=2, tile_size=size * size)
        film_a = Film.create(size, size)
        rays_a = 0.0
        for f in range(3):
            film_a, r = render_frame(
                cornell_device_scene, None, Uniforms.default(), film_a,
                f, s,
            )
            rays_a += float(r)
        film_b, rays_b = render_frames(
            cornell_device_scene, None, Uniforms.default(),
            Film.create(size, size), 0, 3, s,
        )
        assert float(rays_b) == rays_a
        np.testing.assert_array_equal(
            np.asarray(film_a.accum), np.asarray(film_b.accum)
        )
        np.testing.assert_array_equal(
            np.asarray(film_a.albedo), np.asarray(film_b.albedo)
        )
        np.testing.assert_array_equal(
            np.asarray(film_a.normal), np.asarray(film_b.normal)
        )

    def test_spp_tiling_matches_single_tile(self, cornell_device_scene):
        """spp batching must be tiling-invariant (pixel ids and virtual
        frames are global, tiles only partition the dispatch)."""
        size = 32
        a = RenderSettings(width=size, height=size, max_depth=2,
                           rr_depth=2, tile_size=size * size * 2, spp=2)
        b = RenderSettings(width=size, height=size, max_depth=2,
                           rr_depth=2, tile_size=256, spp=2)
        fa, ra = render_frame(
            cornell_device_scene, None, Uniforms.default(),
            Film.create(size, size), 3, a,
        )
        fb, rb = render_frame(
            cornell_device_scene, None, Uniforms.default(),
            Film.create(size, size), 3, b,
        )
        assert float(ra) == float(rb)
        np.testing.assert_array_equal(
            np.asarray(fa.accum), np.asarray(fb.accum)
        )


class TestCornell:
    def test_render_is_finite_and_lit(self, cornell_device_scene):
        film, rays = _render(cornell_device_scene, frames=2, size=32)
        accum = np.asarray(film.accum)
        assert np.isfinite(accum).all()
        assert accum[..., :3].max() > 0.01  # something is lit
        assert rays > 32 * 32 * 2  # primary + shadow rays counted

    def test_deterministic(self, cornell_device_scene):
        f1, _ = _render(cornell_device_scene, frames=2, size=16)
        f2, _ = _render(cornell_device_scene, frames=2, size=16)
        np.testing.assert_array_equal(
            np.asarray(f1.accum), np.asarray(f2.accum)
        )

    def test_bvh_matches_bruteforce_image(self, cornell_device_scene):
        """Same RNG streams -> identical paths -> near-identical images."""
        fb, _ = _render(cornell_device_scene, frames=1, size=16, use_bvh=True)
        ff, _ = _render(cornell_device_scene, frames=1, size=16, use_bvh=False)
        np.testing.assert_allclose(
            np.asarray(fb.accum), np.asarray(ff.accum), atol=1e-3
        )

    def test_aovs(self, cornell_device_scene):
        film, _ = _render(cornell_device_scene, frames=1, size=32)
        albedo = np.asarray(film.albedo)
        normal = np.asarray(film.normal)
        # back wall albedo is the white material
        assert albedo[..., :3].max() > 0.5
        # normals are unit-ish where a surface was hit
        lens = np.linalg.norm(normal[..., :3], axis=-1)
        hit = lens > 0.1
        assert hit.mean() > 0.9
        np.testing.assert_allclose(lens[hit], 1.0, atol=1e-3)

    def test_red_and_green_bleed(self, cornell_device_scene):
        """Left wall red, right wall green must show up in the render."""
        film, _ = _render(cornell_device_scene, frames=4, size=48)
        img = np.asarray(film.accum)[..., :3]
        left = img[:, :8].mean(axis=(0, 1))
        right = img[:, -8:].mean(axis=(0, 1))
        assert left[0] > left[1]   # red dominates on the left
        assert right[1] > right[0]  # green dominates on the right


class TestFurnace:
    def test_white_furnace(self):
        """A fully-white diffuse closed box under unit sky must converge
        to radiance 1 (energy conservation of the Oren-Nayar/NEE/RR
        pipeline)."""
        from hala_tpu.scene.cpu.material import Material, MaterialType
        from hala_tpu.scene.procedural import make_quad
        from hala_tpu.scene.cpu.mesh import Mesh
        from hala_tpu.scene.cpu.node import Node
        from hala_tpu.scene.cpu.scene import Scene
        from hala_tpu.scene.cpu.camera import PerspectiveCamera
        from hala_tpu.scene.loader.uploader import SceneUploader

        scene = Scene()
        scene.materials = [
            Material(
                type=MaterialType.DIFFUSE,
                base_color=np.ones(3, np.float32),
                roughness=0.0,
            )
        ]
        # one white floor quad seen from above, unit sky everywhere
        scene.meshes = [
            Mesh([make_quad([-50, 0, -50], [100, 0, 0], [0, 0, 100], 0)])
        ]
        n = Node(name="m")
        n.mesh_index = 0
        scene.nodes.append(n)
        cam = Node(name="c")
        m = np.eye(4, dtype=np.float32)
        # look straight down: forward = -y  => node z = +y
        m[:3, 0] = [1, 0, 0]
        m[:3, 1] = [0, 0, -1]
        m[:3, 2] = [0, 1, 0]
        m[:3, 3] = [0, 5, 0]
        cam.local_transform = m
        cam.camera_index = 0
        scene.nodes.append(cam)
        scene.cameras = [PerspectiveCamera(aspect=1.0, yfov=0.5)]
        scene.update_node_hierarchies()
        dev = SceneUploader.upload(scene, use_ray_tracing=True)

        uni = Uniforms.default()
        uni.ground_color = jnp.ones(3)
        uni.sky_color = jnp.ones(3)
        film, _ = _render(
            dev, frames=32, size=16, uniforms=uni, max_depth=6
        )
        mean = np.asarray(film.accum)[..., :3].mean()
        # lambertian floor under uniform unit environment -> L = 1
        assert mean == pytest.approx(1.0, rel=0.03)


class TestRendererAPI:
    def test_progressive_budget_and_save(self, tmp_path, cornell_scene):
        r = RayTracingRenderer(
            "t", 32, 32, max_depth=3, rr_depth=2, max_frames=2,
            tile_size=1024,
        )
        r.set_scene(cornell_scene)
        r.commit()
        for _ in range(4):
            r.update()
            r.render()
        assert r._frame_index == 2  # max_frames budget (rt_renderer.rs:393)
        out = tmp_path / "img.png"
        r.save_images(str(out))
        color = read_pfm(str(tmp_path / "img_color.pfm"))
        assert color.shape == (32, 32, 3)
        assert np.isfinite(color).all()
        assert (tmp_path / "img_albedo.pfm").exists()
        assert (tmp_path / "img_normal.pfm").exists()

    def test_render_loop_frames_per_dispatch(self, cornell_scene):
        """render_loop(frames_per_dispatch=K) fuses K frames per XLA
        program (round-5 dispatch-overhead fix) and must stay
        bit-identical to the per-frame loop, including the max_frames
        budget clamp."""
        r1 = RayTracingRenderer(
            "a", 16, 16, max_frames=8, tile_size=256, max_depth=2
        )
        r1.set_scene(cornell_scene)
        r1.commit()
        r1.render_loop(6)
        r2 = RayTracingRenderer(
            "b", 16, 16, max_frames=8, tile_size=256, max_depth=2
        )
        r2.set_scene(cornell_scene)
        r2.commit()
        r2.render_loop(6, frames_per_dispatch=4)
        np.testing.assert_array_equal(
            np.asarray(r1.film.accum), np.asarray(r2.film.accum)
        )
        assert r1.total_rays == r2.total_rays
        r2.render_loop(6, frames_per_dispatch=4)  # clamps at budget
        assert r2._frame_index == 8

    def test_env_knobs(self, cornell_scene):
        r = RayTracingRenderer("t", 16, 16, tile_size=256)
        r.set_scene(cornell_scene)
        r.set_ground_color([0.1, 0.2, 0.3])
        r.set_sky_color([0.4, 0.5, 0.6])
        r.set_env_intensity(2.0)
        r.set_exposure_value(1.5)
        r.commit()
        r.update()
        r.render()
        img = r.get_final_image()
        assert img.shape == (16, 16, 3)
        assert np.isfinite(img).all()


class TestTonemap:
    def test_selection_parity(self):
        """Operator choice flags exactly as rt_renderer.rs:1303-1313."""
        c = jnp.asarray([[0.5, 1.0, 2.0]])
        np.testing.assert_allclose(
            apply_tonemap(c, False, True, True), c
        )
        np.testing.assert_allclose(
            apply_tonemap(c, True, False, False), tonemap_reinhard_lum(c)
        )
        np.testing.assert_allclose(
            apply_tonemap(c, True, True, True), tonemap_aces_simple(c)
        )
        np.testing.assert_allclose(
            apply_tonemap(c, True, True, False), tonemap_aces_fitted(c)
        )

    def test_aces_simple_known_values(self):
        # Narkowicz fit: f(0) = 0, monotone, f(10) ~ 1
        c = jnp.asarray([[0.0, 0.18, 10.0]])
        out = np.asarray(tonemap_aces_simple(c))[0]
        assert out[0] == 0.0
        assert 0.1 < out[1] < 0.3
        assert out[2] > 0.98

    def test_reinhard_luminance_limit(self):
        c = jnp.asarray([[1.5, 1.5, 1.5]])
        out = np.asarray(tonemap_reinhard_lum(c, 1.5))
        assert (out < 1.0).all()


class TestPFM:
    def test_roundtrip(self, tmp_path, rs):
        img = rs.uniform(0, 4, (8, 6, 3)).astype(np.float32)
        p = tmp_path / "x.pfm"
        write_pfm(str(p), img)
        back = read_pfm(str(p))
        np.testing.assert_allclose(back, img, rtol=1e-6)

    def test_header_layout(self, tmp_path):
        img = np.zeros((4, 4, 3), np.float32)
        p = tmp_path / "h.pfm"
        write_pfm(str(p), img)
        raw = p.read_bytes()
        assert raw.startswith(b"PF\n4 4\n-1.0\n")


class TestStagedFrame:
    """render_frame_staged: the multi-dispatch frame (every traversal
    kernel in its own jit — the TPU wavefront compile-wall workaround)
    must be BIT-identical to the megakernel render_frame: both compose
    the same _path_context closures and _tile_raygen, so any divergence
    is a seam bug."""

    def _pair(self, scene_dev, settings, env=None, frames=2, ulp=False):
        from hala_tpu.models.integrator import render_frame_staged

        size = settings.width
        f1 = Film.create(size, size)
        f2 = Film.create(size, size)
        r1 = r2 = 0.0
        for fr in range(frames):
            f1, r = render_frame(
                scene_dev, env, Uniforms.default(), f1, fr, settings
            )
            r1 += float(r)
        for fr in range(frames):
            f2, r = render_frame_staged(
                scene_dev, env, Uniforms.default(), f2, fr, settings
            )
            r2 += float(r)
        assert r1 == r2
        if ulp:
            # XLA fuses (FMA/reassociates) differently across jit
            # boundaries; the env radiance sums show <= 1 ULP drift
            # (measured 11/4096 elements at 1.2e-7). Identical RNG and
            # ray population is still asserted by the ray count above.
            np.testing.assert_allclose(
                np.asarray(f1.accum), np.asarray(f2.accum),
                rtol=3e-7, atol=3e-7,
            )
        else:
            np.testing.assert_array_equal(
                np.asarray(f1.accum), np.asarray(f2.accum)
            )
        np.testing.assert_array_equal(
            np.asarray(f1.normal), np.asarray(f2.normal)
        )
        np.testing.assert_array_equal(
            np.asarray(f1.albedo), np.asarray(f2.albedo)
        )

    def test_matrix_backend_bit_identical(self, cornell_device_scene):
        size = 32
        self._pair(
            cornell_device_scene,
            RenderSettings(
                width=size, height=size, max_depth=3, rr_depth=2,
                tile_size=256, intersector="matrix",
                interpret_pallas=True, spp=2,
            ),
        )

    def test_wavefront_backend_bit_identical(self):
        """The actual target: wavefront kernels inside a full frame via
        staged dispatch (inline comparison also runs wavefront — on CPU
        interpret both compile; on TPU only the staged form does)."""
        from hala_tpu.scene.loader.uploader import SceneUploader
        from hala_tpu.scene.procedural import sponza_like

        dev = SceneUploader.upload(
            sponza_like(rooms=(3, 3), columns_per_room=3,
                        boxes_per_room=6),
            use_ray_tracing=False,
        )
        size = 32
        self._pair(
            dev,
            RenderSettings(
                width=size, height=size, max_depth=2, rr_depth=2,
                tile_size=512, intersector="wavefront", sort_rays=True,
                interpret_pallas=True, wavefront_k=3, wavefront_m=8,
            ),
            frames=1,
        )

    def test_mixed_engines_bit_identical(self):
        """The production large-scene mix: matrix closest-hit + FORCED
        wavefront any-hit shadows (settings.shadow_intersector). All
        exact any-hit engines agree on occlusion bits, so the film must
        stay bit-identical to the megakernel's matrix-shadow frames."""
        from hala_tpu.scene.loader.uploader import SceneUploader
        from hala_tpu.scene.procedural import sponza_like

        dev = SceneUploader.upload(
            sponza_like(rooms=(3, 3), columns_per_room=3,
                        boxes_per_room=6),
            use_ray_tracing=False,
        )
        size = 32
        self._pair(
            dev,
            RenderSettings(
                width=size, height=size, max_depth=2, rr_depth=2,
                tile_size=512, intersector="matrix", sort_rays=True,
                interpret_pallas=True, shadow_intersector="wavefront",
                wavefront_k=3, shadow_wavefront_k=3, wavefront_m=8,
            ),
            frames=1,
        )

    def test_extend_wavefront_staged_bit_identical(self):
        """EXTEND-class own-program wavefront (settings.
        extend_intersector="wavefront" routes bounce closest-hit rays
        through _dispatch_extend_staged's own-jit wavefront while the
        megakernel comparison frame runs matrix closest): exactness is
        engine-independent (canonical re-eval + lexicographic ties), so
        the films must stay bit-identical."""
        from hala_tpu.scene.loader.uploader import SceneUploader
        from hala_tpu.scene.procedural import sponza_like

        dev = SceneUploader.upload(
            sponza_like(rooms=(3, 3), columns_per_room=3,
                        boxes_per_room=6),
            use_ray_tracing=False,
        )
        size = 32
        self._pair(
            dev,
            RenderSettings(
                width=size, height=size, max_depth=2, rr_depth=2,
                tile_size=512, intersector="matrix", sort_rays=True,
                interpret_pallas=True, extend_intersector="wavefront",
                extend_wavefront_k=3, wavefront_m=8,
            ),
            frames=1,
        )

    def test_envmap_bit_identical(self, cornell_device_scene):
        """Env NEE doubles the any-hit batch (nee + env shadow rays in
        one occ dispatch); the staged occ split must match."""
        from hala_tpu.envmap import EnvMap
        from hala_tpu.models.integrator import ENV_MAP

        rs = np.random.RandomState(11)
        env = EnvMap.from_array(
            rs.uniform(0.05, 1.5, (16, 32, 3)).astype(np.float32)
        )
        size = 32
        self._pair(
            cornell_device_scene,
            RenderSettings(
                width=size, height=size, max_depth=2, rr_depth=2,
                tile_size=512, intersector="matrix",
                interpret_pallas=True, env_type=ENV_MAP,
            ),
            env=env,
            frames=1,
            ulp=True,
        )

    def test_rejects_small_scene_backend(self, cornell_device_scene):
        from hala_tpu.error import HalaRendererError
        from hala_tpu.models.integrator import render_frame_staged

        settings = RenderSettings(
            width=16, height=16, max_depth=2, rr_depth=2, tile_size=256,
            intersector="bruteforce",
        )
        try:
            render_frame_staged(
                cornell_device_scene, None, Uniforms.default(),
                Film.create(16, 16), 0, settings,
            )
            raise AssertionError("expected HalaRendererError")
        except HalaRendererError:
            pass


class TestStagedRendererFallback:
    def test_small_scene_degrades_to_megakernel(self, caplog):
        """RayTracingRenderer(staged=True) on a scene the staged
        dispatcher cannot drive (small-scene backend) must warn and
        render via the megakernel, not raise mid-frame-loop (the
        reference's warn-and-fall-back posture for unsupported modes,
        gpu_uploader.rs:99-104)."""
        import logging

        import numpy as np

        from hala_tpu.models.rt_renderer import RayTracingRenderer
        from hala_tpu.scene.procedural import cornell_box

        r = RayTracingRenderer(
            "st", 16, 16, max_frames=1, tile_size=256, staged=True,
        )
        r.set_scene(cornell_box())
        with caplog.at_level(logging.WARNING, logger="hala_tpu.rt"):
            r.commit()
        assert any("staged" in m for m in caplog.messages)
        assert r._staged is False
        r.render_loop(1)
        assert np.isfinite(np.asarray(r.film.accum)).all()
