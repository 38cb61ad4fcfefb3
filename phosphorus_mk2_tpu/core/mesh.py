"""Host-side triangle mesh (reference src/mesh.hpp:15, src/mesh.cpp).

Meshes are plain numpy containers; Scene.build() flattens all meshes into
one global triangle soup (the reference does the same before its BVH
build, src/scene.cpp:58) with per-triangle mesh/material ids.
"""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class Mesh:
    vertices: np.ndarray                   # (V, 3) float32
    faces: np.ndarray                      # (F, 3) int32 vertex indices
    material: object = None                # material name (str), id (int),
                                           # or (F,) per-face array of ids
    normals: np.ndarray | None = None      # (V, 3) per-vertex
    uvs: np.ndarray | None = None          # (V, 2) per-vertex
    tangents: np.ndarray | None = None     # (V, 3) per-vertex (normal maps)
    smooth: object = True                  # bool or (F,) bool
    name: str = ""

    def __post_init__(self):
        self.vertices = np.ascontiguousarray(self.vertices, np.float32)
        self.faces = np.ascontiguousarray(self.faces, np.int32)
        if self.normals is not None:
            self.normals = np.ascontiguousarray(self.normals, np.float32)
        if self.uvs is not None:
            self.uvs = np.ascontiguousarray(self.uvs, np.float32)
        if self.tangents is not None:
            self.tangents = np.ascontiguousarray(self.tangents, np.float32)

    @property
    def num_faces(self) -> int:
        return self.faces.shape[0]

    def face_areas(self) -> np.ndarray:
        a = self.vertices[self.faces[:, 0]]
        b = self.vertices[self.faces[:, 1]]
        c = self.vertices[self.faces[:, 2]]
        return 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=-1)

    def compute_vertex_normals(self) -> np.ndarray:
        """Area-weighted per-vertex normals (for meshes imported without
        normals; the reference relies on the DCC to provide them)."""
        n = np.zeros_like(self.vertices)
        a = self.vertices[self.faces[:, 0]]
        b = self.vertices[self.faces[:, 1]]
        c = self.vertices[self.faces[:, 2]]
        fn = np.cross(b - a, c - a)
        for k in range(3):
            np.add.at(n, self.faces[:, k], fn)
        norm = np.linalg.norm(n, axis=-1, keepdims=True)
        return (n / np.maximum(norm, 1e-20)).astype(np.float32)

    def compute_tangents(self) -> np.ndarray:
        """Per-vertex tangents from uv gradients (the reference gets
        these from MikkTSpace via Blender, plugins/blender/import.hpp:
        115-134; uv-gradient tangents are the standalone equivalent)."""
        if self.uvs is None:
            raise ValueError("tangents need uvs")
        t = np.zeros_like(self.vertices)
        v0 = self.vertices[self.faces[:, 0]]
        v1 = self.vertices[self.faces[:, 1]]
        v2 = self.vertices[self.faces[:, 2]]
        uv0 = self.uvs[self.faces[:, 0]]
        uv1 = self.uvs[self.faces[:, 1]]
        uv2 = self.uvs[self.faces[:, 2]]
        e1 = v1 - v0
        e2 = v2 - v0
        du1 = uv1 - uv0
        du2 = uv2 - uv0
        det = du1[:, 0] * du2[:, 1] - du2[:, 0] * du1[:, 1]
        r = np.where(np.abs(det) < 1e-12, 0.0, 1.0 / np.where(det == 0, 1, det))
        tan = (e1 * du2[:, 1:2] - e2 * du1[:, 1:2]) * r[:, None]
        for k in range(3):
            np.add.at(t, self.faces[:, k], tan)
        norm = np.linalg.norm(t, axis=-1, keepdims=True)
        return (t / np.maximum(norm, 1e-20)).astype(np.float32)
