"""Program façade + kernel cache tests (reference section 2.10 parity),
plus checkpoint/resume and RenderConfig round-trips."""

import jax.numpy as jnp
import numpy as np
import pytest

from hala_tpu.error import HalaRendererError
from hala_tpu.models.integrator import Film
from hala_tpu.programs import (
    ComputeProgram,
    ComputeProgramDesc,
    GraphicsProgram,
    GraphicsProgramDesc,
    KernelCache,
    RayTracingProgram,
    RayTracingProgramDesc,
)
from hala_tpu.utils.checkpoint import load_render_state, save_render_state
from hala_tpu.utils.config import RenderConfig


class TestKernelCache:
    def test_singleton(self):
        assert KernelCache.get_instance() is KernelCache.get_instance()

    def test_from_memory_and_get(self):
        cache = KernelCache.get_instance()
        fn = lambda x: x + 1
        cache.from_memory("my_kernel", fn)
        assert cache.get("my_kernel") is fn
        cache.remove("my_kernel")
        assert cache.get("my_kernel") is None

    def test_load_import_path(self):
        cache = KernelCache.get_instance()
        fn = cache.load("hala_tpu.ops.tonemap:tonemap_aces_simple")
        out = np.asarray(fn(jnp.asarray([[10.0, 10.0, 10.0]])))
        assert out.max() <= 1.0

    def test_load_bad_path(self):
        with pytest.raises(HalaRendererError):
            KernelCache.get_instance().load("no_such_module:fn")
        with pytest.raises(HalaRendererError):
            KernelCache.get_instance().load("not-a-kernel-path")


class TestComputeProgram:
    def test_dispatch_jitted_kernel(self):
        desc = ComputeProgramDesc(
            shader_file_path="hala_tpu.ops.tonemap:tonemap_reinhard_lum"
        )
        prog = ComputeProgram(desc)
        out = prog.dispatch(jnp.asarray([[1.5, 1.5, 1.5]]))
        assert np.asarray(out).max() < 1.0

    def test_desc_json_roundtrip(self):
        desc = ComputeProgramDesc(
            shader_file_path="m:f", push_constant_size=8, bindings=["a", "b"]
        )
        back = ComputeProgramDesc.from_json(desc.to_json())
        assert back == desc

    def test_dispatch_indirect_masks_by_device_count(self):
        """compute_program.rs:144-168 dispatch_indirect role: the work
        count is a DEVICE value; the kernel masks its static-shape work
        by it with no host sync."""
        cache = KernelCache.get_instance()
        cache.from_memory(
            "test.masked_double",
            lambda count, buf: jnp.where(
                jnp.arange(buf.shape[0], dtype=jnp.int32) < count,
                buf * 2.0, buf,
            ),
        )
        try:
            prog = ComputeProgram(
                ComputeProgramDesc(shader_file_path="test.masked_double")
            )
            buf = jnp.arange(8, dtype=jnp.float32)
            count = jnp.int32(3) + jnp.int32(2)  # device-computed count
            out = np.asarray(prog.dispatch_indirect(count, buf))
            np.testing.assert_allclose(out[:5], np.arange(5) * 2.0)
            np.testing.assert_allclose(out[5:], np.arange(5, 8))
        finally:
            cache.remove("test.masked_double")


class TestRayTracingProgram:
    def test_desc_defaults(self):
        """serde defaults parity: recursion depth 1."""
        d = RayTracingProgramDesc.from_json("{}")
        assert d.ray_recursion_depth == 1
        assert d.ray_gen_shader_file_path == "builtin:raygen"

    def test_trace_rays(self, cornell_device_scene):
        desc = RayTracingProgramDesc(ray_recursion_depth=2)
        prog = RayTracingProgram(desc, cornell_device_scene)
        film = Film.create(16, 16)
        film, rays = prog.trace_rays(film, 16, 16, frame_index=0)
        assert np.isfinite(np.asarray(film.accum)).all()
        assert float(rays) > 0

    def test_trace_rays_indirect_masks_pixels(self, cornell_device_scene):
        """raytracing_program.rs:330-340 trace_rays_indirect role: a
        device-computed pixel count bounds the committed trace region;
        the prefix matches trace_rays, the suffix keeps the old film."""
        desc = RayTracingProgramDesc(ray_recursion_depth=2)
        prog = RayTracingProgram(desc, cornell_device_scene)
        base = Film.create(16, 16)
        full, _ = prog.trace_rays(Film.create(16, 16), 16, 16, frame_index=0)
        count = jnp.int32(16 * 8)  # top half of the film
        part, _ = prog.trace_rays_indirect(base, count, 16, 16, frame_index=0)
        np.testing.assert_array_equal(
            np.asarray(part.accum)[:8], np.asarray(full.accum)[:8]
        )
        np.testing.assert_array_equal(
            np.asarray(part.accum)[8:], np.asarray(base.accum)[8:]
        )


class TestGraphicsProgram:
    def test_draw(self, cornell_device_scene):
        desc = GraphicsProgramDesc()
        prog = GraphicsProgram(desc, cornell_device_scene)
        color, gbuffer = prog.draw(24, 24)
        assert color.shape == (24, 24, 3)
        assert np.isfinite(np.asarray(color)).all()

    def test_draw_indirect_masks_primitives(self, cornell_device_scene):
        """graphics_program.rs:469-643 draw_indirect role: the primitive
        count is a device value masking primitive validity. Full count
        == draw(); zero count == background only."""
        desc = GraphicsProgramDesc()
        prog = GraphicsProgram(desc, cornell_device_scene)
        color_full, _ = prog.draw(24, 24)
        n_prims = cornell_device_scene.geometry.tri_mat.shape[0]
        color_all, _ = prog.draw_indirect(jnp.int32(n_prims), 24, 24)
        np.testing.assert_array_equal(
            np.asarray(color_full), np.asarray(color_all)
        )
        color_none, _ = prog.draw_indirect(jnp.int32(0), 24, 24)
        assert not np.array_equal(
            np.asarray(color_none), np.asarray(color_full)
        )

    def test_mesh_shader_flag(self):
        d = GraphicsProgramDesc(mesh_shader_file_path="builtin:meshlet")
        assert d.uses_mesh_shader
        assert not GraphicsProgramDesc().uses_mesh_shader


class TestCheckpoint:
    def test_roundtrip(self, tmp_path, rs):
        film = Film(
            accum=jnp.asarray(rs.rand(8, 8, 4).astype(np.float32)),
            albedo=jnp.asarray(rs.rand(8, 8, 4).astype(np.float32)),
            normal=jnp.asarray(rs.rand(8, 8, 4).astype(np.float32)),
        )
        p = str(tmp_path / "state.npz")
        save_render_state(p, film, frame_index=42, seed=7, extra={"spp": 4})
        film2, fidx, seed, extra = load_render_state(p)
        np.testing.assert_array_equal(np.asarray(film.accum), np.asarray(film2.accum))
        assert fidx == 42 and seed == 7
        assert int(extra["spp"]) == 4

    def test_resume_continues_progressive(self, tmp_path, cornell_device_scene):
        """Render 2 frames, checkpoint, resume, render 2 more == 4 straight."""
        from hala_tpu.models.integrator import (
            RenderSettings,
            Uniforms,
            render_frame,
        )

        settings = RenderSettings(width=16, height=16, max_depth=2, tile_size=256)
        uni = Uniforms.default()

        film_a = Film.create(16, 16)
        for f in range(4):
            film_a, _ = render_frame(
                cornell_device_scene, None, uni, film_a, f, settings
            )

        film_b = Film.create(16, 16)
        for f in range(2):
            film_b, _ = render_frame(
                cornell_device_scene, None, uni, film_b, f, settings
            )
        p = str(tmp_path / "ck.npz")
        save_render_state(p, film_b, frame_index=2)
        film_c, fidx, _, _ = load_render_state(p)
        for f in range(fidx, 4):
            film_c, _ = render_frame(
                cornell_device_scene, None, uni, film_c, f, settings
            )
        np.testing.assert_allclose(
            np.asarray(film_a.accum), np.asarray(film_c.accum), atol=1e-6
        )


class TestRenderConfig:
    def test_json_roundtrip(self):
        cfg = RenderConfig(width=256, max_depth=6, env_type="map",
                           sky_color=(0.1, 0.2, 0.3))
        back = RenderConfig.from_json(cfg.to_json())
        assert back == cfg

    def test_build_renderer(self, cornell_scene):
        cfg = RenderConfig(width=16, height=16, max_frames=1, tile_size=256)
        r = cfg.build_renderer()
        r.set_scene(cornell_scene)
        r.commit()
        r.update()
        r.render()
        assert r._frame_index == 1

    def test_unknown_keys_ignored(self):
        cfg = RenderConfig.from_json('{"width": 64, "bogus_key": 1}')
        assert cfg.width == 64


class TestBlueNoise:
    def test_blue_noise_jitter_changes_image(self, cornell_device_scene):
        from hala_tpu.models.integrator import (
            RenderSettings,
            Uniforms,
            render_frame,
        )

        settings = RenderSettings(width=16, height=16, max_depth=2, tile_size=256)
        uni = Uniforms.default()
        bn = jnp.asarray(
            np.random.RandomState(0).rand(32, 32, 4).astype(np.float32)
        )
        f1, _ = render_frame(
            cornell_device_scene, None, uni, Film.create(16, 16), 0, settings
        )
        f2, _ = render_frame(
            cornell_device_scene, None, uni, Film.create(16, 16), 0, settings,
            blue_noise=bn,
        )
        a, b = np.asarray(f1.accum), np.asarray(f2.accum)
        assert np.isfinite(b).all()
        assert np.abs(a - b).max() > 0  # different jitter stream


class TestKernelHookDispatch:
    """Pushed kernels must actually be exercised by render_frame
    (round-2 verdict: the registry was registration-only)."""

    def _render(self, scene, hooks=None, size=16):
        from hala_tpu.models.integrator import (
            Film, RenderSettings, Uniforms, render_frame,
        )

        settings = RenderSettings(
            width=size, height=size, max_depth=2, rr_depth=2,
            tile_size=size * size, use_bvh=True,
        )
        film = Film.create(size, size)
        film, _ = render_frame(
            scene, None, Uniforms.default(), film, 0, settings,
            hooks=hooks,
        )
        return np.asarray(film.accum)

    def test_miss_hook_changes_image(self, cornell_device_scene):
        from hala_tpu.models.integrator import KernelHooks

        def red_miss(d, uniforms, default):
            return jnp.broadcast_to(
                jnp.asarray([5.0, 0.0, 0.0]), default.shape
            )

        base = self._render(cornell_device_scene)
        hooked = self._render(
            cornell_device_scene, KernelHooks(miss=red_miss)
        )
        assert not np.allclose(base, hooked)
        # the escape radiance is red, so red energy must rise
        assert hooked[..., 0].mean() > base[..., 0].mean()

    def test_raygen_and_post_shade_hooks(self, cornell_device_scene):
        from hala_tpu.models.integrator import KernelHooks

        def center_jitter(gpix, fidx, r_jit):
            return r_jit.at[:, :2].set(0.5)  # pin samples to centers

        def half_bright(L, alb, nrm):
            return L * 0.5, alb, nrm

        base = self._render(cornell_device_scene)
        jittered = self._render(
            cornell_device_scene, KernelHooks(raygen=center_jitter)
        )
        halved = self._render(
            cornell_device_scene,
            KernelHooks(raygen=center_jitter, post_shade=half_bright),
        )
        assert not np.allclose(base, jittered)
        np.testing.assert_allclose(
            halved[..., :3], jittered[..., :3] * 0.5, atol=1e-6
        )

    def test_renderer_push_is_dispatched(self, cornell_scene):
        """RayTracingRenderer.push_general_kernel -> commit -> render:
        the pushed miss kernel must change the image."""
        from hala_tpu.models.rt_renderer import RayTracingRenderer
        from hala_tpu.programs import KernelCache

        def green_miss(d, uniforms, default):
            return jnp.broadcast_to(
                jnp.asarray([0.0, 4.0, 0.0]), default.shape
            )

        cache = KernelCache.get_instance()
        try:
            r = RayTracingRenderer("plain", 16, 16, max_frames=1,
                                   tile_size=256)
            r.set_scene(cornell_scene)
            r.commit()
            r.render_loop(1)
            base = np.asarray(r.film.accum)

            r2 = RayTracingRenderer("hooked", 16, 16, max_frames=1,
                                    tile_size=256)
            r2.set_scene(cornell_scene)
            r2.push_general_kernel("miss", green_miss)
            r2.commit()
            assert r2.hooks is not None and r2.hooks.miss is green_miss
            r2.render_loop(1)
            hooked = np.asarray(r2.film.accum)
            assert not np.allclose(base, hooked)
            assert hooked[..., 1].mean() > base[..., 1].mean()
        finally:
            cache.remove("rt.miss")

    def test_program_desc_path_resolves(self, cornell_device_scene):
        """A non-builtin desc path is loaded from the KernelCache and
        dispatched by trace_rays."""
        from hala_tpu.models.integrator import Film
        from hala_tpu.programs import (
            RayTracingProgram, RayTracingProgramDesc,
        )

        desc = RayTracingProgramDesc(ray_recursion_depth=2)
        prog = RayTracingProgram(desc, cornell_device_scene)
        film = Film.create(16, 16)
        film, _ = prog.trace_rays(film, 16, 16)
        base = np.asarray(film.accum)

        desc2 = RayTracingProgramDesc(
            ray_recursion_depth=2,
            miss_shader_file_paths=["tests.test_programs:blue_miss"],
        )
        prog2 = RayTracingProgram(desc2, cornell_device_scene)
        film2 = Film.create(16, 16)
        film2, _ = prog2.trace_rays(film2, 16, 16)
        hooked = np.asarray(film2.accum)
        assert not np.allclose(base, hooked)
        assert hooked[..., 2].mean() > base[..., 2].mean()


def blue_miss(d, uniforms, default):
    """Importable miss kernel for the desc-path test."""
    return jnp.broadcast_to(jnp.asarray([0.0, 0.0, 6.0]), default.shape)
