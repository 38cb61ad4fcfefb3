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
    """Attributes come in two scopes, like the reference's per-vertex vs
    per-face-vertex modes (reference src/mesh.hpp:20-26, mesh.cpp:169-258):
    per-vertex arrays (normals/uvs indexed by ``faces``) or per-corner
    arrays (``corner_normals``/``corner_uvs``, one value per face-vertex —
    split normals on hard edges, uv seams). The device scene is always
    per-vertex: ``resolve_corners()`` re-indexes so each distinct
    (position, normal, uv) corner becomes its own vertex, which
    Scene.build applies automatically."""

    vertices: np.ndarray                   # (V, 3) float32
    faces: np.ndarray                      # (F, 3) int32 vertex indices
    material: object = None                # material name (str), id (int),
                                           # or (F,) per-face array of ids
    normals: np.ndarray | None = None      # (V, 3) per-vertex
    uvs: np.ndarray | None = None          # (V, 2) per-vertex
    tangents: np.ndarray | None = None     # (V, 3) per-vertex (normal maps)
    smooth: object = True                  # bool or (F,) bool
    name: str = ""
    corner_normals: np.ndarray | None = None  # (F, 3, 3) per-face-vertex
    corner_uvs: np.ndarray | None = None      # (F, 3, 2) per-face-vertex

    def __post_init__(self):
        self.vertices = np.ascontiguousarray(self.vertices, np.float32)
        self.faces = np.ascontiguousarray(self.faces, np.int32)
        if self.normals is not None:
            self.normals = np.ascontiguousarray(self.normals, np.float32)
        if self.uvs is not None:
            self.uvs = np.ascontiguousarray(self.uvs, np.float32)
        if self.tangents is not None:
            self.tangents = np.ascontiguousarray(self.tangents, np.float32)
        f = self.faces.shape[0]
        if self.corner_normals is not None:
            self.corner_normals = np.ascontiguousarray(
                self.corner_normals, np.float32
            ).reshape(f, 3, 3)
        if self.corner_uvs is not None:
            self.corner_uvs = np.ascontiguousarray(
                self.corner_uvs, np.float32
            ).reshape(f, 3, 2)

    def resolve_corners(self) -> "Mesh":
        """Fold per-corner attributes into per-vertex arrays by splitting
        vertices at attribute discontinuities (the same re-indexing
        io/obj.load_obj applies to OBJ's independent v/vt/vn indices).
        Identity when no corner attributes are present."""
        if self.corner_normals is None and self.corner_uvs is None:
            return self
        f = self.num_faces
        vid = self.faces.reshape(-1).astype(np.int64)  # (F*3,)

        if self.corner_normals is not None:
            n = self.corner_normals.reshape(-1, 3)
        elif self.normals is not None:
            n = self.normals[vid]
        else:
            n = np.zeros((f * 3, 3), np.float32)
        if self.corner_uvs is not None:
            uv = self.corner_uvs.reshape(-1, 2)
        elif self.uvs is not None:
            uv = self.uvs[vid]
        else:
            uv = np.zeros((f * 3, 2), np.float32)

        # dedup corners on exact bit patterns (vertex id + attr words)
        key = np.concatenate(
            [
                vid[:, None],
                n.view(np.uint32).astype(np.int64),
                uv.view(np.uint32).astype(np.int64),
            ],
            axis=1,
        )
        uniq, inverse = np.unique(key, axis=0, return_index=False,
                                  return_inverse=True)
        # representative corner per unique row (first occurrence order is
        # irrelevant — any corner with the same key carries the same data)
        rep = np.zeros(uniq.shape[0], np.int64)
        rep[inverse] = np.arange(f * 3)

        out = Mesh(
            vertices=self.vertices[vid[rep]],
            faces=inverse.reshape(f, 3).astype(np.int32),
            material=self.material,
            normals=n[rep] if (
                self.corner_normals is not None or self.normals is not None
            ) else None,
            uvs=uv[rep] if (
                self.corner_uvs is not None or self.uvs is not None
            ) else None,
            tangents=self.tangents[vid[rep]] if self.tangents is not None else None,
            smooth=self.smooth,
            name=self.name,
        )
        return out

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
        """Per-vertex tangents, MikkTSpace-compatible semantics.

        The reference gets tangents from Blender's MikkTSpace when a
        material needs geom:tangent (plugins/blender/import.hpp:
        115-134). This standalone generator follows the same recipe on
        the published algorithm's core path (Mikkelsen 2008):
          * per-face tangent from the uv-gradient (dP/du);
          * degenerate faces (zero uv or world area) contribute nothing;
          * accumulation weighted by the CORNER ANGLE at each wedge
            (MikkTSpace's angle weighting — large sliver fans no longer
            dominate the average);
          * the averaged tangent is Gram-Schmidt-orthogonalized against
            the vertex's shading normal and normalized, like
            MikkTSpace's final orthonormalization per wedge.
        Differences that remain (documented): MikkTSpace splits wedges
        by uv/normal discontinuities inside one vertex index; our SoA
        meshes are already corner-split by resolve_corners when those
        discontinuities exist, so the per-vertex group matches.
        """
        if self.uvs is None:
            raise ValueError("tangents need uvs")
        t = np.zeros_like(self.vertices)
        v = [self.vertices[self.faces[:, k]] for k in range(3)]
        uv = [self.uvs[self.faces[:, k]] for k in range(3)]
        e1 = v[1] - v[0]
        e2 = v[2] - v[0]
        du1 = uv[1] - uv[0]
        du2 = uv[2] - uv[0]
        det = du1[:, 0] * du2[:, 1] - du2[:, 0] * du1[:, 1]
        face_n = np.cross(e1, e2)
        degenerate = (np.abs(det) < 1e-12) | (
            np.linalg.norm(face_n, axis=-1) < 1e-20
        )
        r = np.where(degenerate, 0.0, 1.0 / np.where(det == 0, 1, det))
        tan = (e1 * du2[:, 1:2] - e2 * du1[:, 1:2]) * r[:, None]

        def corner_angle(k):
            a = v[(k + 1) % 3] - v[k]
            b = v[(k + 2) % 3] - v[k]
            an = a / np.maximum(np.linalg.norm(a, axis=-1, keepdims=True), 1e-20)
            bn = b / np.maximum(np.linalg.norm(b, axis=-1, keepdims=True), 1e-20)
            return np.arccos(np.clip((an * bn).sum(-1), -1.0, 1.0))

        for k in range(3):
            w = np.where(degenerate, 0.0, corner_angle(k))
            np.add.at(t, self.faces[:, k], tan * w[:, None])

        # orthonormalize against the shading normal (MikkTSpace's final
        # per-wedge step): t <- normalize(t - n (n . t))
        n = self.normals if self.normals is not None else (
            self.compute_vertex_normals()
        )
        n = np.asarray(n, np.float32)
        nn = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
        t = t - nn * (nn * t).sum(-1, keepdims=True)
        norm = np.linalg.norm(t, axis=-1, keepdims=True)
        return (t / np.maximum(norm, 1e-20)).astype(np.float32)
