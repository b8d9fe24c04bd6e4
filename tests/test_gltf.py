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


class TestVertexColorsAndTexTransform:
    def _scene_with_colors(self, tmp_path, colors):
        positions = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        normals = np.array([[0, 0, 1]] * 3, np.float32)
        cols = np.asarray(colors, np.float32)
        indices = np.array([0, 1, 2], np.uint16)
        doc = {
            "asset": {"version": "2.0"},
            "scene": 0,
            "scenes": [{"nodes": [0, 1]}],
            "nodes": [
                {"mesh": 0},
                {"camera": 0, "translation": [0.3, 0.3, 2.0]},
            ],
            "cameras": [{
                "type": "perspective",
                "perspective": {"yfov": 0.8, "znear": 0.1},
            }],
            "meshes": [{"primitives": [{
                "attributes": {"POSITION": 0, "NORMAL": 1, "COLOR_0": 2},
                "indices": 3,
            }]}],
            "accessors": [
                {"bufferView": 0, "componentType": 5126, "count": 3,
                 "type": "VEC3", "min": [0, 0, 0], "max": [1, 1, 0]},
                {"bufferView": 1, "componentType": 5126, "count": 3,
                 "type": "VEC3"},
                {"bufferView": 2, "componentType": 5126, "count": 3,
                 "type": "VEC3"},
                {"bufferView": 3, "componentType": 5123, "count": 3,
                 "type": "SCALAR"},
            ],
            "bufferViews": [
                {"buffer": 0, "byteOffset": 0, "byteLength": 36},
                {"buffer": 0, "byteOffset": 36, "byteLength": 36},
                {"buffer": 0, "byteOffset": 72, "byteLength": 36},
                {"buffer": 0, "byteOffset": 108, "byteLength": 6},
            ],
            "buffers": [{
                "byteLength": 114,
                "uri": _b64(np.concatenate([
                    positions.reshape(-1), normals.reshape(-1),
                    cols.reshape(-1),
                ]).astype(np.float32)) if False else None,
            }],
        }
        blob = (positions.tobytes() + normals.tobytes() + cols.tobytes()
                + indices.tobytes())
        import base64
        doc["buffers"] = [{
            "byteLength": len(blob),
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(blob).decode(),
        }]
        path = tmp_path / "vc.gltf"
        path.write_text(json.dumps(doc))
        return Scene.load(str(path))

    def test_color0_loaded_and_packed(self, tmp_path):
        scene = self._scene_with_colors(
            tmp_path, [[1, 0, 0], [0, 1, 0], [0, 0, 1]]
        )
        prim = scene.meshes[0].primitives[0]
        assert prim.colors is not None
        np.testing.assert_allclose(prim.colors, np.eye(3), atol=1e-6)

        from hala_tpu.scene.loader.uploader import SceneUploader

        dev = SceneUploader.upload(scene, use_ray_tracing=False)
        # widened shade row carries the per-corner colors
        assert dev.geometry.shade_table.shape[1] == 48
        row = np.asarray(dev.geometry.shade_table)[0]
        np.testing.assert_allclose(
            np.sort(row[32:41].reshape(3, 3).sum(1)), [1, 1, 1], atol=1e-6
        )

    def test_no_colors_keeps_narrow_table(self, tmp_path):
        scene = self._scene_with_colors(tmp_path, [[1, 1, 1]] * 3)
        scene.meshes[0].primitives[0].colors = None
        from hala_tpu.scene.loader.uploader import SceneUploader

        dev = SceneUploader.upload(scene, use_ray_tracing=False)
        assert dev.geometry.shade_table.shape[1] == 32

    def test_khr_texture_transform_parsed(self, tmp_path):
        path = _write_tri_gltf(tmp_path)
        doc = json.loads((tmp_path / "scene.gltf").read_text())
        doc["materials"][0]["pbrMetallicRoughness"]["baseColorTexture"] = {
            "index": 0,
            "extensions": {"KHR_texture_transform": {
                "offset": [0.25, 0.5], "rotation": 0.3, "scale": [2, 3],
            }},
        }
        # minimal image/texture so the binding resolves
        px = np.ones((1, 1, 4), np.float32)
        import base64 as b64mod
        from PIL import Image
        import io as iomod
        buf = iomod.BytesIO()
        Image.fromarray((px * 255).astype(np.uint8), "RGBA").save(buf, "PNG")
        doc["images"] = [{"uri": "data:image/png;base64,"
                          + b64mod.b64encode(buf.getvalue()).decode()}]
        doc["textures"] = [{"source": 0}]
        (tmp_path / "scene.gltf").write_text(json.dumps(doc))
        scene = Scene.load(str(tmp_path / "scene.gltf"))
        np.testing.assert_allclose(
            scene.materials[0].uv_transform, (0.25, 0.5, 0.3, 2.0, 3.0)
        )
        from hala_tpu.scene.loader.uploader import SceneUploader

        dev = SceneUploader.upload(scene, use_ray_tracing=False)
        assert dev.materials.has_uv_transform
        np.testing.assert_allclose(
            np.asarray(dev.materials.uv_transform[0]),
            [0.25, 0.5, 0.3, 2.0, 3.0],
        )

    def test_vertex_colors_tint_render(self, tmp_path):
        """COLOR_0 must multiply into base color in the integrator:
        the albedo AOV of a red-tinted triangle turns red."""
        scene = self._scene_with_colors(
            tmp_path, [[1, 0, 0], [1, 0, 0], [1, 0, 0]]
        )
        from hala_tpu.models.integrator import (
            Film, RenderSettings, Uniforms, render_frame,
        )
        from hala_tpu.scene.loader.uploader import SceneUploader
        import jax.numpy as jnp

        dev = SceneUploader.upload(scene, use_ray_tracing=False)
        settings = RenderSettings(
            width=16, height=16, max_depth=1, tile_size=256,
            intersector="bruteforce",
        )
        film = Film.create(16, 16)
        film, _ = render_frame(dev, None, Uniforms.default(), film, 0, settings)
        alb = np.asarray(film.albedo)
        hitpx = alb[..., 0] > 0.3
        assert hitpx.any()
        # red tint: green/blue channels collapse where the tri is visible
        assert float(alb[hitpx][:, 1].max()) < 0.05
