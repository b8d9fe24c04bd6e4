"""Procedural test scenes (Cornell Box and friends).

The reference ships no assets (scenes come from downstream app repos);
these builders produce host Scenes through the same CPU scene graph the
glTF loader fills, so every downstream stage is exercised identically.
Used by tests and bench configs (BASELINE configs[0-2]).
"""

from __future__ import annotations

import numpy as np

from .cpu.camera import PerspectiveCamera
from .cpu.light import Light, LightType
from .cpu.material import Material, MaterialType
from .cpu.mesh import Mesh, Primitive
from .cpu.node import Node
from .cpu.scene import Scene


def make_quad(
    corner, edge_u, edge_v, material_index: int, flip: bool = False
) -> Primitive:
    """Two-triangle quad; normal = cross(edge_u, edge_v) (or flipped)."""
    corner = np.asarray(corner, np.float32)
    eu = np.asarray(edge_u, np.float32)
    ev = np.asarray(edge_v, np.float32)
    positions = np.stack([corner, corner + eu, corner + eu + ev, corner + ev])
    n = np.cross(eu, ev)
    n = n / np.linalg.norm(n)
    if flip:
        n = -n
        indices = np.array([0, 2, 1, 0, 3, 2], np.uint32)
    else:
        indices = np.array([0, 1, 2, 0, 2, 3], np.uint32)
    normals = np.tile(n.astype(np.float32), (4, 1))
    t = eu / np.linalg.norm(eu)
    tangents = np.tile(t.astype(np.float32), (4, 1))
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    return Primitive(
        indices=indices,
        positions=positions,
        normals=normals,
        tangents=tangents,
        tex_coords=uvs,
        material_index=material_index,
    )


def make_box(center, size, material_index: int) -> list[Primitive]:
    """Axis-aligned box as 6 inward-or-outward quads (outward normals)."""
    c = np.asarray(center, np.float32)
    s = np.asarray(size, np.float32) * 0.5
    quads = []
    x, y, z = s
    # +X, -X, +Y, -Y, +Z, -Z faces with outward normals
    quads.append(make_quad(c + [x, -y, -z], [0, 0, 2 * z], [0, 2 * y, 0], material_index))
    quads.append(make_quad(c + [-x, -y, z], [0, 0, -2 * z], [0, 2 * y, 0], material_index))
    quads.append(make_quad(c + [-x, y, -z], [2 * x, 0, 0], [0, 0, 2 * z], material_index))
    quads.append(make_quad(c + [-x, -y, z], [2 * x, 0, 0], [0, 0, -2 * z], material_index))
    quads.append(make_quad(c + [-x, -y, z], [2 * x, 0, 0], [0, 2 * y, 0], material_index))
    quads.append(make_quad(c + [x, -y, -z], [-2 * x, 0, 0], [0, 2 * y, 0], material_index))
    return quads


def _diffuse(color, roughness=0.0) -> Material:
    return Material(
        type=MaterialType.DIFFUSE,
        base_color=np.asarray(color, np.float32),
        roughness=roughness,
    )


def cornell_box(
    light_intensity: float = 18.0,
    tall_box_material: Material | None = None,
    short_box_material: Material | None = None,
) -> Scene:
    """Classic Cornell Box in [-1, 1]^3 with a ceiling quad light.

    Walls are DIFFUSE (Oren-Nayar with sigma=0); the two boxes default to
    white diffuse but can be overridden (e.g. DISNEY metal for the GGX
    bench config).
    """
    scene = Scene()
    white = _diffuse([0.73, 0.73, 0.73])
    red = _diffuse([0.63, 0.065, 0.05])
    green = _diffuse([0.14, 0.45, 0.091])
    mats = [white, red, green]
    mat_tall = 0
    if tall_box_material is not None:
        mats.append(tall_box_material)
        mat_tall = len(mats) - 1
    mat_short = 0
    if short_box_material is not None:
        mats.append(short_box_material)
        mat_short = len(mats) - 1
    scene.materials = mats

    # Inward-facing normals (normal = cross(edge_u, edge_v)).
    prims = [
        make_quad([-1, -1, -1], [0, 0, 2], [2, 0, 0], 0),   # floor, +Y
        make_quad([-1, 1, -1], [2, 0, 0], [0, 0, 2], 0),    # ceiling, -Y
        make_quad([-1, -1, -1], [2, 0, 0], [0, 2, 0], 0),   # back wall, +Z
        make_quad([-1, -1, -1], [0, 2, 0], [0, 0, 2], 1),   # left wall red, +X
        make_quad([1, -1, -1], [0, 0, 2], [0, 2, 0], 2),    # right wall green, -X
    ]
    prims += make_box([-0.35, -0.4, -0.35], [0.6, 1.2, 0.6], mat_tall)
    prims += make_box([0.4, -0.7, 0.35], [0.6, 0.6, 0.6], mat_short)
    scene.meshes = [Mesh(primitives=prims)]

    root = Node(name="root")
    root.mesh_index = 0
    scene.nodes.append(root)

    # Ceiling quad light: node z-axis points down (-Y) so the single-sided
    # quad emits into the box (cross(u, v) = node z-axis).
    light_node = Node(name="light")
    m = np.eye(4, dtype=np.float32)
    m[:3, 0] = [1, 0, 0]   # x axis
    m[:3, 1] = [0, 0, 1]   # y axis
    m[:3, 2] = [0, -1, 0]  # z axis (emission direction)
    m[:3, 3] = [0, 0.998, 0]
    light_node.local_transform = m
    light_node.light_index = 0
    scene.nodes.append(light_node)
    scene.lights = [
        Light(
            color=np.array([1.0, 0.84, 0.67], np.float32),
            intensity=light_intensity,
            light_type=LightType.QUAD,
            params=(0.66, 0.66),
        )
    ]

    cam_node = Node(name="camera")
    cm = np.eye(4, dtype=np.float32)
    cm[:3, 3] = [0, 0, 3.9]
    cam_node.local_transform = cm
    cam_node.camera_index = 0
    scene.nodes.append(cam_node)
    scene.cameras = [
        PerspectiveCamera(aspect=1.0, yfov=0.547, znear=0.1, focal_distance=3.9)
    ]

    scene.update_node_hierarchies()
    return scene


def sponza_like(
    rooms: tuple[int, int] = (4, 4),
    columns_per_room: int = 4,
    boxes_per_room: int = 3,
    seed: int = 0,
) -> Scene:
    """Structured architectural scene (Sponza stand-in for BASELINE
    config[4]): a grid of rooms with floors, walls, columns and clutter
    boxes — high spatial coherence, tens of thousands of triangles when
    scaled up. Column/box counts scale triangle count."""
    rs = np.random.RandomState(seed)
    scene = Scene()
    scene.materials = [
        _diffuse([0.7, 0.65, 0.6]),   # masonry
        _diffuse([0.45, 0.3, 0.2]),   # wood
        _diffuse([0.3, 0.35, 0.45]),  # stone
    ]
    prims: list = []
    rx, rz = rooms
    room = 4.0
    for ix in range(rx):
        for iz in range(rz):
            x0, z0 = ix * room, iz * room
            cx, cz = x0 + room / 2, z0 + room / 2
            # floor + ceiling slabs
            prims += make_box([cx, -0.1, cz], [room, 0.2, room], 0)
            prims += make_box([cx, 3.1, cz], [room, 0.2, room], 0)
            # columns
            for c in range(columns_per_room):
                px = x0 + 0.6 + 2.8 * ((c % 2))
                pz = z0 + 0.6 + 2.8 * ((c // 2) % 2)
                prims += make_box([px, 1.5, pz], [0.3, 3.0, 0.3], 2)
            # clutter
            for _ in range(boxes_per_room):
                bx = x0 + rs.uniform(0.8, room - 0.8)
                bz = z0 + rs.uniform(0.8, room - 0.8)
                s = rs.uniform(0.2, 0.7)
                prims += make_box([bx, s / 2, bz], [s, s, s], 1)
    scene.meshes = [Mesh(primitives=prims)]
    root = Node(name="root")
    root.mesh_index = 0
    scene.nodes.append(root)

    light_node = Node(name="sun")
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = [rx * room / 2, 2.9, rz * room / 2]
    m[:3, 0] = [1, 0, 0]
    m[:3, 1] = [0, 0, 1]
    m[:3, 2] = [0, -1, 0]
    light_node.local_transform = m
    light_node.light_index = 0
    scene.nodes.append(light_node)
    scene.lights = [
        Light(
            color=np.ones(3, np.float32),
            intensity=40.0,
            light_type=LightType.QUAD,
            params=(1.5, 1.5),
        )
    ]

    cam_node = Node(name="camera")
    cm = np.eye(4, dtype=np.float32)
    # stand in the first room looking down the +x corridor: forward = -Z
    # axis of the node, so orient z toward -x.
    cm[:3, 0] = [0, 0, -1]
    cm[:3, 1] = [0, 1, 0]
    cm[:3, 2] = [-1, 0, 0]
    cm[:3, 3] = [0.5, 1.5, rz * room / 2]
    cam_node.local_transform = cm
    cam_node.camera_index = 0
    scene.nodes.append(cam_node)
    scene.cameras = [PerspectiveCamera(aspect=16 / 9, yfov=0.8, znear=0.05)]
    scene.update_node_hierarchies()
    return scene


def random_triangle_soup(n_tris: int, seed: int = 0) -> Scene:
    """Random triangles in [-1,1]^3 for BVH stress tests + LBVH bench."""
    rs = np.random.RandomState(seed)
    centers = rs.uniform(-1, 1, (n_tris, 3)).astype(np.float32)
    offs = rs.uniform(-0.08, 0.08, (n_tris, 2, 3)).astype(np.float32)
    v0 = centers
    v1 = centers + offs[:, 0]
    v2 = centers + offs[:, 1]
    positions = np.concatenate([v0, v1, v2]).astype(np.float32)
    indices = (
        np.arange(3 * n_tris, dtype=np.uint32)
        .reshape(3, n_tris)
        .T.reshape(-1)
    )
    n = np.cross(v1 - v0, v2 - v0)
    ln = np.linalg.norm(n, axis=1, keepdims=True)
    n = np.where(ln > 0, n / ln, [0, 0, 1]).astype(np.float32)
    normals = np.concatenate([n, n, n])
    tangents = np.zeros_like(positions)
    tangents[:, 0] = 1
    uvs = np.zeros((3 * n_tris, 2), np.float32)

    scene = Scene()
    scene.materials = [_diffuse([0.7, 0.7, 0.7])]
    scene.meshes = [
        Mesh(
            primitives=[
                Primitive(
                    indices=indices,
                    positions=positions,
                    normals=normals,
                    tangents=tangents,
                    tex_coords=uvs,
                    material_index=0,
                )
            ]
        )
    ]
    root = Node(name="root")
    root.mesh_index = 0
    scene.nodes.append(root)
    cam_node = Node(name="camera")
    cm = np.eye(4, dtype=np.float32)
    cm[:3, 3] = [0, 0, 4.0]
    cam_node.local_transform = cm
    cam_node.camera_index = 0
    scene.nodes.append(cam_node)
    scene.cameras = [PerspectiveCamera(aspect=1.0, yfov=0.6, znear=0.1)]
    scene.update_node_hierarchies()
    return scene
