#!/usr/bin/env python
"""Offline Alembic -> npz mesh-bundle converter.

Run on a machine with PyAlembic installed (this render environment has no
Alembic binding and no network):

    python tools/abc_to_npz.py scene.abc out.npz

The .npz is loadable from a YAML scene's data: list (io/yaml_scene.py
_import_npz). Mesh names become material names so the YAML materials:
section binds by name, mirroring the reference's per-face-set material
binding (reference src/codecs/scene/alembic.hpp:216).
"""
from __future__ import annotations

import sys

import numpy as np


def convert(abc_path: str, npz_path: str) -> None:
    from phosphorus_mk2_tpu.core.scene import Scene
    from phosphorus_mk2_tpu.io.alembic import import_alembic

    scene = Scene()
    import_alembic(abc_path, scene)

    out = {"n_meshes": len(scene.meshes)}
    many = len(scene.meshes) > 1
    for i, mesh in enumerate(scene.meshes):
        sfx = f"_{i}" if many else ""
        out[f"vertices{sfx}"] = mesh.vertices
        out[f"faces{sfx}"] = mesh.faces
        if mesh.normals is not None:
            out[f"normals{sfx}"] = mesh.normals
        if mesh.uvs is not None:
            out[f"uvs{sfx}"] = mesh.uvs
        out[f"material{sfx}"] = np.str_(mesh.material or mesh.name)
        out[f"smooth{sfx}"] = np.bool_(
            mesh.smooth if isinstance(mesh.smooth, bool) else True
        )
    np.savez_compressed(npz_path, **out)
    print(f"wrote {npz_path}: {len(scene.meshes)} meshes")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    convert(sys.argv[1], sys.argv[2])
