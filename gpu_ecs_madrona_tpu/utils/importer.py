"""Mesh importer — .obj files into hull-ready arrays.

Counterpart of reference src/common/importer.cpp (loadOBJ,
importer.cpp:35-409; ImportedObject::importObject:411-435).  The hot parse
runs in the native C++ extension (gpu_ecs_madrona_tpu._native, GIL-released)
when built; a pure-Python parser provides the fallback.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

try:
    from gpu_ecs_madrona_tpu import _native  # type: ignore

    HAS_NATIVE = True
except ImportError:  # pragma: no cover
    _native = None
    HAS_NATIVE = False


@dataclasses.dataclass
class SourceMesh:
    """reference imp::SourceMesh (importer.hpp): vertices + face loops."""

    vertices: np.ndarray            # [V, 3] float32
    faces: List[np.ndarray]         # index loops (winding preserved)


def parse_obj_bytes(data: bytes) -> SourceMesh:
    if HAS_NATIVE:
        v_bytes, nv, fi_bytes, fo_bytes = _native.parse_obj(data)
        verts = np.frombuffer(v_bytes, np.float32).reshape(nv, 3).copy()
        fi = np.frombuffer(fi_bytes, np.int32)
        fo = np.frombuffer(fo_bytes, np.int32)
        faces = [fi[fo[i]:fo[i + 1]].copy() for i in range(len(fo) - 1)]
        return SourceMesh(vertices=verts, faces=faces)
    return _parse_obj_python(data)


def _parse_obj_python(data: bytes) -> SourceMesh:
    verts: List[List[float]] = []
    faces: List[np.ndarray] = []
    for line in data.decode("utf-8", errors="replace").splitlines():
        line = line.strip()
        if line.startswith("v "):
            parts = line.split()
            verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
        elif line.startswith("f "):
            idx = []
            for tok in line.split()[1:]:
                i = int(tok.split("/")[0])
                idx.append(i - 1 if i > 0 else len(verts) + i)
            if len(idx) >= 3:
                faces.append(np.array(idx, np.int32))
    return SourceMesh(
        vertices=np.asarray(verts, np.float32).reshape(-1, 3), faces=faces)


def load_obj(path: str) -> SourceMesh:
    """reference loadOBJ (importer.cpp:35)."""
    with open(path, "rb") as f:
        return parse_obj_bytes(f.read())


def import_object(path: str, inv_mass=1.0, mu_s=0.5, mu_d=0.5,
                  inv_inertia=(1.0, 1.0, 1.0)):
    """Load an .obj as a physics hull SourceObject (reference
    PhysicsLoader::loadHullFromDisk, physics_assets.cpp).  The mesh must be
    convex (same contract as the reference)."""
    from gpu_ecs_madrona_tpu.physics.assets import convex_hull_from_mesh

    mesh = load_obj(path)
    return convex_hull_from_mesh(mesh.vertices, mesh.faces, inv_mass=inv_mass,
                                 mu_s=mu_s, mu_d=mu_d, inv_inertia=inv_inertia)
