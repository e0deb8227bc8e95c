"""Mesh format conversion (reference: scripts/obj_to_ply.py:23-51):
OBJ -> binary PLY (and back) via the mesh loaders.

    python -m omnidata_tpu.utils.convert_mesh in.obj out.ply
"""
from __future__ import annotations

import sys

import numpy as np


def write_ply(path: str, vertices: np.ndarray, faces: np.ndarray,
              vertex_colors: np.ndarray | None = None) -> None:
    with open(path, "w") as fh:
        fh.write("ply\nformat ascii 1.0\n")
        fh.write(f"element vertex {len(vertices)}\n")
        fh.write("property float x\nproperty float y\nproperty float z\n")
        if vertex_colors is not None:
            fh.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        fh.write(f"element face {len(faces)}\n")
        fh.write("property list uchar int vertex_indices\nend_header\n")
        if vertex_colors is not None:
            cols = (np.clip(vertex_colors, 0, 1) * 255).astype(np.uint8)
            for v, c in zip(vertices, cols):
                fh.write(f"{v[0]} {v[1]} {v[2]} {c[0]} {c[1]} {c[2]}\n")
        else:
            for v in vertices:
                fh.write(f"{v[0]} {v[1]} {v[2]}\n")
        for f in faces:
            fh.write(f"3 {f[0]} {f[1]} {f[2]}\n")


def write_obj(path: str, vertices: np.ndarray, faces: np.ndarray) -> None:
    with open(path, "w") as fh:
        for v in vertices:
            fh.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for f in faces:
            fh.write(f"f {f[0]+1} {f[1]+1} {f[2]+1}\n")


def main(argv=None):
    argv = argv or sys.argv[1:]
    src, dst = argv
    from ..mesh import load_obj, load_ply

    mesh = load_obj(src) if src.endswith(".obj") else load_ply(src)
    v = np.asarray(mesh.vertices)
    f = np.asarray(mesh.faces[: mesh.num_faces])
    c = None if mesh.vertex_colors is None else np.asarray(mesh.vertex_colors)
    if dst.endswith(".ply"):
        write_ply(dst, v, f, c)
    else:
        write_obj(dst, v, f)


if __name__ == "__main__":
    main()
