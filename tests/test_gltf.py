"""glTF loader tests on tiny in-memory fixtures (gltf_loader.rs parity:
extras parsing, light fixups, camera DOF extras, BFS node order)."""

import base64
import json

import numpy as np
import pytest

from hala_tpu.scene.cpu.light import LightType
from hala_tpu.scene.cpu.material import MaterialType, MediumType
from hala_tpu.scene.cpu.scene import Scene


def _b64(arr):
    return "data:application/octet-stream;base64," + base64.b64encode(
        arr.tobytes()
    ).decode()


def _write_tri_gltf(tmp_path, extras_mat=None, light=None, cam_extras=None):
    positions = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32
    )
    normals = np.array([[0, 0, 1]] * 3, np.float32)
    uvs = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    indices = np.array([0, 1, 2], np.uint16)
    blob = (
        positions.tobytes() + normals.tobytes() + uvs.tobytes()
        + indices.tobytes()
    )
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1, 2]}],
        "nodes": [
            {"name": "mesh", "mesh": 0},
            {"name": "cam", "camera": 0, "translation": [0, 0, 5]},
            {"name": "parent", "children": [3]},
            {"name": "child", "translation": [1, 0, 0]},
        ],
        "cameras": [
            {
                "type": "perspective",
                "perspective": {"yfov": 0.7, "znear": 0.1, "aspectRatio": 1.5},
                **({"extras": cam_extras} if cam_extras else {}),
            }
        ],
        "meshes": [
            {
                "primitives": [
                    {
                        "attributes": {
                            "POSITION": 0,
                            "NORMAL": 1,
                            "TEXCOORD_0": 2,
                        },
                        "indices": 3,
                        "material": 0,
                    }
                ]
            }
        ],
        "materials": [
            {
                "name": "m0",
                "pbrMetallicRoughness": {
                    "baseColorFactor": [0.5, 0.25, 0.125, 1.0],
                    "metallicFactor": 0.75,
                    "roughnessFactor": 0.3,
                },
                "emissiveFactor": [1, 1, 1],
                "extensions": {
                    "KHR_materials_emissive_strength": {
                        "emissiveStrength": 2.0
                    },
                    "KHR_materials_ior": {"ior": 1.33},
                    "KHR_materials_transmission": {"transmissionFactor": 0.5},
                },
                **({"extras": extras_mat} if extras_mat else {}),
            }
        ],
        "buffers": [{"uri": _b64(np.frombuffer(blob, np.uint8)), "byteLength": len(blob)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 36},
            {"buffer": 0, "byteOffset": 72, "byteLength": 24},
            {"buffer": 0, "byteOffset": 96, "byteLength": 6},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 3, "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
    }
    if light is not None:
        doc["extensions"] = {"KHR_lights_punctual": {"lights": [light]}}
        doc["nodes"].append(
            {
                "name": "light",
                "extensions": {"KHR_lights_punctual": {"light": 0}},
            }
        )
        doc["scenes"][0]["nodes"].append(4)
    path = tmp_path / "scene.gltf"
    path.write_text(json.dumps(doc))
    return str(path)


class TestLoader:
    def test_basic_mesh(self, tmp_path):
        scene = Scene.load(_write_tri_gltf(tmp_path))
        prim = scene.meshes[0].primitives[0]
        assert prim.triangle_count == 1
        np.testing.assert_allclose(prim.positions[1], [1, 0, 0])
        np.testing.assert_allclose(prim.normals[0], [0, 0, 1])
        # tangents generated from UV deltas
        assert np.isfinite(prim.tangents).all()

    def test_bfs_node_order(self, tmp_path):
        scene = Scene.load(_write_tri_gltf(tmp_path))
        names = [n.name for n in scene.nodes]
        # BFS: all roots first, then children
        assert names == ["mesh", "cam", "parent", "child"]
        child = scene.nodes[3]
        assert scene.nodes[child.parent].name == "parent"
        np.testing.assert_allclose(child.world_transform[:3, 3], [1, 0, 0])

    def test_material_gltf_params(self, tmp_path):
        scene = Scene.load(_write_tri_gltf(tmp_path))
        m = scene.materials[0]
        np.testing.assert_allclose(m.base_color, [0.5, 0.25, 0.125])
        assert m.metallic == pytest.approx(0.75)
        assert m.roughness == pytest.approx(0.3)
        np.testing.assert_allclose(m.emission, [2, 2, 2])  # strength applied
        assert m.ior == pytest.approx(1.33)
        assert m.specular_transmission == pytest.approx(0.5)
        assert m.type == MaterialType.DIFFUSE  # no extras -> default 0

    def test_material_extras(self, tmp_path):
        extras = {
            "type": 1,
            "opacity": 0.8,
            "anisotropic": 0.4,
            "sheen": 0.6,
            "medium_type": 2,
            "medium_color": [1, 0, 0],
            "medium_density": 0.5,
        }
        scene = Scene.load(_write_tri_gltf(tmp_path, extras_mat=extras))
        m = scene.materials[0]
        assert m.type == MaterialType.DISNEY
        assert m.opacity == pytest.approx(0.8)
        assert m.anisotropic == pytest.approx(0.4)
        assert m.sheen == pytest.approx(0.6)
        assert m.medium.type == MediumType.SCATTER
        np.testing.assert_allclose(m.medium.color, [1, 0, 0])

    def test_quad_light_intensity_fixup(self, tmp_path):
        """gltf_loader.rs:474-478: intensity /= 0.5 * w * h."""
        light = {
            "type": "point",
            "color": [1, 1, 1],
            "intensity": 10.0,
            "extras": {"type": 1, "param0": 2.0, "param1": 1.0},
        }
        scene = Scene.load(_write_tri_gltf(tmp_path, light=light))
        l = scene.lights[0]
        assert l.light_type == LightType.QUAD
        assert l.intensity == pytest.approx(10.0 / (0.5 * 2.0 * 1.0))

    def test_spot_angle_swap_sort(self, tmp_path):
        light = {
            "type": "spot",
            "intensity": 1.0,
            "spot": {"innerConeAngle": 0.5, "outerConeAngle": 0.3},
            "extras": {"type": 0, "param0": 80.0, "param1": 20.0},
        }
        scene = Scene.load(_write_tri_gltf(tmp_path, light=light))
        l = scene.lights[0]
        assert l.light_type == LightType.SPOT
        assert l.params[0] <= l.params[1]  # swap-sorted

    def test_camera_dof_extras(self, tmp_path):
        scene = Scene.load(
            _write_tri_gltf(
                tmp_path, cam_extras={"focal_dist": 3.5, "aperture": 0.2}
            )
        )
        cam = scene.cameras[0]
        assert cam.focal_distance == pytest.approx(3.5)
        assert cam.aperture == pytest.approx(0.2)
        assert cam.yfov == pytest.approx(0.7)

    def test_camera_defaults(self, tmp_path):
        """focal_dist default 10, aperture default 0 (gltf_loader.rs:527)."""
        scene = Scene.load(_write_tri_gltf(tmp_path))
        cam = scene.cameras[0]
        assert cam.focal_distance == pytest.approx(10.0)
        assert cam.aperture == pytest.approx(0.0)

    def test_reverse_z_projection(self, tmp_path):
        """Infinite reverse-Z: depth -> 1 at znear, -> 0 at infinity."""
        scene = Scene.load(_write_tri_gltf(tmp_path))
        proj = scene.cameras[0].projection

        def project_depth(z_view):
            clip = proj @ np.array([0, 0, z_view, 1.0], np.float32)
            return clip[2] / clip[3]

        assert project_depth(-0.1) == pytest.approx(1.0, abs=1e-5)
        assert project_depth(-1e6) == pytest.approx(0.0, abs=1e-3)


class TestGLB:
    def test_glb_container_roundtrip(self, tmp_path):
        """GLB binary container: JSON chunk + BIN chunk buffers."""
        import struct

        # build the same triangle scene as a .glb with a BIN chunk
        positions = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        normals = np.array([[0, 0, 1]] * 3, np.float32)
        uvs = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
        indices = np.array([0, 1, 2], np.uint16)
        blob = (
            positions.tobytes() + normals.tobytes() + uvs.tobytes()
            + indices.tobytes()
        )
        blob += b"\0" * (-len(blob) % 4)
        doc = {
            "asset": {"version": "2.0"},
            "scene": 0,
            "scenes": [{"nodes": [0, 1]}],
            "nodes": [
                {"mesh": 0},
                {"camera": 0, "translation": [0, 0, 5]},
            ],
            "cameras": [
                {"type": "perspective",
                 "perspective": {"yfov": 0.7, "znear": 0.1}}
            ],
            "meshes": [{"primitives": [{
                "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
                "indices": 3,
            }]}],
            "buffers": [{"byteLength": len(blob)}],  # no uri -> GLB chunk
            "bufferViews": [
                {"buffer": 0, "byteOffset": 0, "byteLength": 36},
                {"buffer": 0, "byteOffset": 36, "byteLength": 36},
                {"buffer": 0, "byteOffset": 72, "byteLength": 24},
                {"buffer": 0, "byteOffset": 96, "byteLength": 6},
            ],
            "accessors": [
                {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
                {"bufferView": 1, "componentType": 5126, "count": 3, "type": "VEC3"},
                {"bufferView": 2, "componentType": 5126, "count": 3, "type": "VEC2"},
                {"bufferView": 3, "componentType": 5123, "count": 3, "type": "SCALAR"},
            ],
        }
        jchunk = json.dumps(doc).encode()
        jchunk += b" " * (-len(jchunk) % 4)
        glb = struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(jchunk) + 8 + len(blob))
        glb += struct.pack("<II", len(jchunk), 0x4E4F534A) + jchunk
        glb += struct.pack("<II", len(blob), 0x004E4942) + blob
        path = tmp_path / "scene.glb"
        path.write_bytes(glb)

        scene = Scene.load(str(path))
        prim = scene.meshes[0].primitives[0]
        assert prim.triangle_count == 1
        np.testing.assert_allclose(prim.positions[1], [1, 0, 0])
        assert scene.cameras[0].yfov == pytest.approx(0.7)
