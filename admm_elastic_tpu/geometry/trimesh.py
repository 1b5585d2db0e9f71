"""Triangle mesh container + basic OBJ/PLY I/O and per-vertex normals."""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class TriMesh:
    """Vertices (n,3) float64, faces (F,3) int32."""

    vertices: np.ndarray
    faces: np.ndarray

    @property
    def n_vertices(self) -> int:
        return int(self.vertices.shape[0])

    @property
    def n_faces(self) -> int:
        return int(self.faces.shape[0])

    def apply_xform(self, M: np.ndarray) -> "TriMesh":
        self.vertices = self.vertices @ M[:3, :3].T + M[:3, 3]
        return self

    def normals(self) -> np.ndarray:
        return vertex_normals(self.vertices, self.faces)

    def save_obj(self, path: str) -> None:
        with open(path, "w") as f:
            for p in self.vertices:
                f.write(f"v {p[0]:.9g} {p[1]:.9g} {p[2]:.9g}\n")
            for t in self.faces:
                f.write(f"f {t[0]+1} {t[1]+1} {t[2]+1}\n")


def load_obj(path: str) -> TriMesh:
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "v":
                verts.append([float(x) for x in parts[1:4]])
            elif parts[0] == "f":
                idx = [int(p.split("/")[0]) - 1 for p in parts[1:]]
                for k in range(1, len(idx) - 1):  # fan-triangulate
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return TriMesh(np.asarray(verts, dtype=np.float64), np.asarray(faces, dtype=np.int32))


def load_ply(path: str) -> TriMesh:
    """ASCII PLY loader (vertex xyz + face lists)."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            header.append(line)
            if line == "end_header":
                break
        if not any(h.startswith("format ascii") for h in header):
            raise ValueError("only ASCII PLY supported")
        n_vert = n_face = 0
        for h in header:
            if h.startswith("element vertex"):
                n_vert = int(h.split()[-1])
            elif h.startswith("element face"):
                n_face = int(h.split()[-1])
        verts = np.empty((n_vert, 3), dtype=np.float64)
        for i in range(n_vert):
            verts[i] = [float(x) for x in f.readline().split()[:3]]
        faces = []
        for _ in range(n_face):
            parts = [int(x) for x in f.readline().split()]
            idx = parts[1 : 1 + parts[0]]
            for k in range(1, len(idx) - 1):
                faces.append([idx[0], idx[k], idx[k + 1]])
    return TriMesh(verts, np.asarray(faces, dtype=np.int32))


def triangle_areas(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    v = np.asarray(vertices, dtype=np.float64)
    t = np.asarray(faces, dtype=np.int64)
    e1 = v[t[:, 1]] - v[t[:, 0]]
    e2 = v[t[:, 2]] - v[t[:, 0]]
    return 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1)


def vertex_normals(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted per-vertex normals."""
    v = np.asarray(vertices, dtype=np.float64)
    t = np.asarray(faces, dtype=np.int64)
    fn = np.cross(v[t[:, 1]] - v[t[:, 0]], v[t[:, 2]] - v[t[:, 0]])
    n = np.zeros_like(v)
    for k in range(3):
        np.add.at(n, t[:, k], fn)
    norm = np.linalg.norm(n, axis=1, keepdims=True)
    return n / np.where(norm > 0, norm, 1.0)
