"""Mesh importer tests (reference src/common/importer.cpp parity)."""

import numpy as np
import pytest

from gpu_ecs_madrona_tpu.utils import importer

CUBE_OBJ = b"""
# comment line
v -1 -1 -1
v 1 -1 -1
v 1 1 -1
v -1 1 -1
v -1 -1 1
v 1 -1 1
v 1 1 1
v -1 1 1
vn 0 0 1
vt 0 0
f 1/1/1 2/1/1 3/1/1 4/1/1
f 5 8 7 6
f 1 5 6 2
f 2 6 7 3
f 3 7 8 4
f 4 8 5 -8
"""


def test_parse_cube():
    mesh = importer.parse_obj_bytes(CUBE_OBJ)
    assert mesh.vertices.shape == (8, 3)
    assert len(mesh.faces) == 6
    assert all(len(f) == 4 for f in mesh.faces)
    # negative index -8 resolves to vertex 0
    assert mesh.faces[5][-1] == 0


def test_native_matches_python():
    if not importer.HAS_NATIVE:
        pytest.skip("native extension not built")
    a = importer.parse_obj_bytes(CUBE_OBJ)
    b = importer._parse_obj_python(CUBE_OBJ)
    np.testing.assert_allclose(a.vertices, b.vertices)
    assert len(a.faces) == len(b.faces)
    for fa, fb in zip(a.faces, b.faces):
        np.testing.assert_array_equal(fa, fb)


def test_degenerate_faces_dropped():
    mesh = importer.parse_obj_bytes(b"v 0 0 0\nv 1 0 0\nf 1 2\n")
    assert len(mesh.faces) == 0


def test_import_object_into_physics(tmp_path):
    p = tmp_path / "cube.obj"
    p.write_bytes(CUBE_OBJ)
    obj = importer.import_object(str(p))
    from gpu_ecs_madrona_tpu.physics.assets import PhysicsLoader, PRIM_HULL

    assert obj.prim_type == PRIM_HULL
    mgr = PhysicsLoader().load_objects([obj]).get_object_manager()
    assert mgr["num_verts"][0] == 8
    assert mgr["num_faces"][0] == 6
    assert mgr["num_edges"][0] == 3  # box: 3 unique edge directions
    np.testing.assert_allclose(mgr["local_aabb_lo"][0], [-1, -1, -1])
