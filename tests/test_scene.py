"""Scene-core unit tests: bounds math, material precompute, light/camera
record construction (parity anchors: reference bounds.rs,
gpu/material.rs:53-69, gpu_uploader.rs:157-274, gpu/camera.rs:28-61)."""

import numpy as np
import pytest

from hala_tpu.scene.bounds import Bounds
from hala_tpu.scene.cpu.material import Material, MaterialType
from hala_tpu.scene.cpu.light import Light, LightType
from hala_tpu.scene.cpu.node import Node
from hala_tpu.scene.cpu.scene import Scene
from hala_tpu.scene.loader.uploader import SceneUploader, _material_precompute
from hala_tpu.scene.procedural import cornell_box


class TestBounds:
    def test_min_max_roundtrip(self):
        b = Bounds.from_min_max([-1, -2, -3], [1, 2, 3])
        np.testing.assert_allclose(b.min, [-1, -2, -3])
        np.testing.assert_allclose(b.max, [1, 2, 3])
        np.testing.assert_allclose(b.center, [0, 0, 0])

    def test_encapsulate(self):
        b = Bounds.from_min_max([0, 0, 0], [1, 1, 1])
        b.encapsulate_point([2, 0.5, 0.5])
        np.testing.assert_allclose(b.max, [2, 1, 1])

    def test_intersects(self):
        a = Bounds.from_min_max([0, 0, 0], [1, 1, 1])
        b = Bounds.from_min_max([0.5, 0.5, 0.5], [2, 2, 2])
        c = Bounds.from_min_max([3, 3, 3], [4, 4, 4])
        assert a.intersects(b)
        assert not a.intersects(c)

    def test_expand(self):
        b = Bounds.from_min_max([0, 0, 0], [1, 1, 1])
        b.expand(1.0)  # grows total size by `amount` (bounds.rs:127-132)
        np.testing.assert_allclose(b.size, [2, 2, 2])


class TestMaterialPrecompute:
    def test_diffuse_oren_nayar(self):
        """gpu/material.rs:53-60: sigma = roughness * pi/4."""
        m = Material(type=MaterialType.DIFFUSE, roughness=0.8)
        rough, a, b = _material_precompute(m)
        sigma = 0.8 * 0.5 * np.pi / 2
        sigma2 = sigma * sigma
        assert rough == pytest.approx(0.8)
        assert a == pytest.approx(1.0 - sigma2 / (2 * (sigma2 + 0.33)))
        assert b == pytest.approx(0.45 * sigma2 / (sigma2 + 0.09))

    def test_diffuse_smooth_is_lambert(self):
        m = Material(type=MaterialType.DIFFUSE, roughness=0.0)
        _, a, b = _material_precompute(m)
        assert a == pytest.approx(1.0)
        assert b == pytest.approx(0.0)

    def test_disney_isotropic(self):
        """gpu/material.rs:61-69: alpha = roughness^2, clamp 0.001."""
        m = Material(type=MaterialType.DISNEY, roughness=0.5, anisotropic=0.0)
        rough, ax, ay = _material_precompute(m)
        assert rough == pytest.approx(0.25)
        assert ax == pytest.approx(0.25)
        assert ay == pytest.approx(0.25)

    def test_disney_anisotropic(self):
        m = Material(type=MaterialType.DISNEY, roughness=0.5, anisotropic=1.0)
        _, ax, ay = _material_precompute(m)
        aspect = np.sqrt(1.0 - 0.9)
        assert ax == pytest.approx(max(0.001, 0.25 / aspect))
        assert ay == pytest.approx(max(0.001, 0.25 * aspect))

    def test_disney_clamp(self):
        m = Material(type=MaterialType.DISNEY, roughness=0.0)
        _, ax, ay = _material_precompute(m)
        assert ax == 0.001 and ay == 0.001


class TestLightRecords:
    def _upload_single(self, light, transform=None):
        scene = Scene()
        scene.lights = [light]
        node = Node(name="l")
        if transform is not None:
            node.local_transform = transform
        node.light_index = 0
        scene.nodes = [node]
        scene.update_node_hierarchies()
        return SceneUploader._upload_lights(scene)

    def test_point(self):
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = [1, 2, 3]
        dl = self._upload_single(
            Light(color=np.array([1.0, 0.5, 0.25], np.float32), intensity=2.0),
            m,
        )
        assert dl.num_lights == 1
        np.testing.assert_allclose(dl.intensity[0], [2.0, 1.0, 0.5])
        np.testing.assert_allclose(dl.position[0], [1, 2, 3])
        assert int(dl.ltype[0]) == 0

    def test_quad_record(self):
        """gpu_uploader.rs:225-247: corner/u/v/area construction."""
        m = np.eye(4, dtype=np.float32)  # z axis +Z: emits toward +Z
        m[:3, 3] = [0, 5, 0]
        dl = self._upload_single(
            Light(light_type=LightType.QUAD, params=(2.0, 4.0), intensity=1.0),
            m,
        )
        np.testing.assert_allclose(dl.position[0], [-1, 3, 0])
        np.testing.assert_allclose(dl.u[0], [2, 0, 0])
        np.testing.assert_allclose(dl.v[0], [0, 4, 0])
        assert float(dl.area[0]) == pytest.approx(8.0)
        assert int(dl.ltype[0]) == 3

    def test_sphere_record(self):
        dl = self._upload_single(
            Light(light_type=LightType.SPHERE, params=(2.0, 0.0))
        )
        assert float(dl.radius[0]) == pytest.approx(2.0)
        assert float(dl.area[0]) == pytest.approx(4 * np.pi * 4.0)
        np.testing.assert_allclose(
            dl.aabb_min[0], [-2, -2, -2], atol=1e-6
        )

    def test_directional_record(self):
        """u = -z_axis, v.x = cos(half angle) (gpu_uploader.rs:183-198)."""
        dl = self._upload_single(
            Light(light_type=LightType.DIRECTIONAL, params=(0.2, 0.0))
        )
        np.testing.assert_allclose(dl.u[0], [0, 0, -1], atol=1e-6)
        assert float(dl.v[0, 0]) == pytest.approx(np.cos(0.1))

    def test_truncation_cap(self):
        scene = Scene()
        scene.lights = [Light() for _ in range(40)]
        for i in range(40):
            n = Node(name=f"l{i}")
            n.light_index = i
            scene.nodes.append(n)
        scene.update_node_hierarchies()
        dl = SceneUploader._upload_lights(scene)
        assert dl.num_lights == 32  # MAX_LIGHT_COUNT parity


class TestCameraRecords:
    def test_axes_from_world_transform(self):
        """gpu/camera.rs:28-32: forward = -Z axis."""
        scene = cornell_box()
        cams = SceneUploader._upload_cameras(scene)
        assert cams.num_cameras == 1
        np.testing.assert_allclose(cams.position[0], [0, 0, 3.9])
        np.testing.assert_allclose(cams.forward[0], [0, 0, -1])
        np.testing.assert_allclose(cams.right[0], [1, 0, 0])
        np.testing.assert_allclose(cams.up[0], [0, 1, 0])
        assert int(cams.ctype[0]) == 0

    def test_view_is_world_inverse(self):
        scene = cornell_box()
        cams = SceneUploader._upload_cameras(scene)
        w = scene.nodes[2].world_transform
        np.testing.assert_allclose(
            np.asarray(cams.view_matrix[0]) @ w, np.eye(4), atol=1e-5
        )


class TestNodeHierarchy:
    def test_world_transform_propagation(self):
        """cpu/scene.rs:99-114 single forward pass over BFS order."""
        scene = Scene()
        a = Node(name="a")
        a.local_transform = np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)
        b = Node(name="b", parent=0)
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = [1, 0, 0]
        b.local_transform = m
        scene.nodes = [a, b]
        scene.update_node_hierarchies()
        np.testing.assert_allclose(scene.nodes[1].world_transform[:3, 3], [2, 0, 0])


class TestGeometryUpload:
    def test_cornell_geometry(self, cornell_device_scene):
        g = cornell_device_scene.geometry
        assert g.num_triangles == 5 * 2 + 6 * 2 + 6 * 2  # walls + 2 boxes
        assert g.tri_v0.shape[0] % 128 == 0
        # padding is unhittable
        pad_mats = np.asarray(g.tri_mat[g.num_triangles:])
        assert (pad_mats == -1).all()

    def test_world_transform_applied(self):
        scene = cornell_box()
        # scale the root node and re-upload
        scene.nodes[0].local_transform = np.diag(
            [2.0, 2.0, 2.0, 1.0]
        ).astype(np.float32)
        scene.update_node_hierarchies()
        g = SceneUploader._upload_geometry(scene)
        v0 = np.asarray(g.tri_v0[: g.num_triangles])
        assert np.abs(v0).max() == pytest.approx(2.0, abs=1e-5)
