"""Meshlet clustering tests: capacity invariants, packing, and
native-C++ vs Python agreement (gpu_uploader.rs:577-608 parity:
max_vertices=64, max_triangles=124)."""

import numpy as np
import pytest

from hala_tpu.ops.meshlets import build_meshlets, build_scene_meshlets
from hala_tpu.scene.meshlet import MESHLET_MAX_PRIMITIVES, MESHLET_MAX_VERTICES
from hala_tpu.scene.procedural import cornell_box, sponza_like


def _check_invariants(indices, positions, meshlets, mv, mp):
    tris = indices.reshape(-1, 3)
    total_prims = 0
    for m in meshlets:
        assert 0 < m.num_of_vertices <= MESHLET_MAX_VERTICES
        assert 0 < m.num_of_primitives <= MESHLET_MAX_PRIMITIVES
        verts = mv[m.offset_of_vertices : m.offset_of_vertices + m.num_of_vertices]
        prims = mp[
            m.offset_of_primitives : m.offset_of_primitives + m.num_of_primitives
        ]
        # packed locals decode into valid global vertex ids
        for p in prims:
            a, b, c = p & 0xFF, (p >> 8) & 0xFF, (p >> 16) & 0xFF
            assert a < m.num_of_vertices
            assert b < m.num_of_vertices
            assert c < m.num_of_vertices
        # bounding sphere contains all meshlet vertices
        pos = positions[verts]
        dist = np.linalg.norm(pos - m.center, axis=1)
        assert (dist <= m.radius + 1e-4).all()
        total_prims += m.num_of_primitives
    assert total_prims == len(tris)


@pytest.fixture(scope="module")
def prim():
    scene = sponza_like(rooms=(2, 2), boxes_per_room=3)
    return scene.meshes[0].primitives[0]


class TestMeshlets:
    def test_python_invariants(self, prim):
        m, mv, mp = build_meshlets(
            prim.indices, prim.positions, use_native=False
        )
        _check_invariants(prim.indices, prim.positions, m, mv, mp)

    def test_native_invariants_and_agreement(self, prim):
        from hala_tpu.native import get_lib

        if get_lib() is None:
            pytest.skip("native toolchain unavailable")
        mn, mvn, mpn = build_meshlets(
            prim.indices, prim.positions, use_native=True
        )
        _check_invariants(prim.indices, prim.positions, mn, mvn, mpn)
        mp_, mvp, mpp = build_meshlets(
            prim.indices, prim.positions, use_native=False
        )
        # identical greedy algorithm -> identical clustering
        assert len(mn) == len(mp_)
        np.testing.assert_array_equal(mvn, mvp)
        np.testing.assert_array_equal(mpn, mpp)

    def test_scene_meshlet_pass(self):
        scene = cornell_box()
        build_scene_meshlets(scene)
        draw_indices = set()
        for mesh in scene.meshes:
            for p in mesh.primitives:
                assert p.meshlets
                assert p.meshlet_vertices is not None
                draw_indices.update(m.draw_index for m in p.meshlets)
        assert len(draw_indices) == sum(
            len(m.primitives) for m in scene.meshes
        )
