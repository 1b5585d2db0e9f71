"""Vertex-only scene objects (mclscene PointCloud, PointCloud.hpp:41-85):
load from .node or ASCII PLY, density-based radius estimation."""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class PointCloud:
    vertices: np.ndarray
    radii: np.ndarray | None = None

    @property
    def n_vertices(self) -> int:
        return int(self.vertices.shape[0])

    def apply_xform(self, M: np.ndarray) -> "PointCloud":
        self.vertices = self.vertices @ M[:3, :3].T + M[:3, 3]
        return self

    def compute_radii(self, k: int = 8) -> np.ndarray:
        """Per-point radius from mean distance to the k nearest neighbors
        (density estimator; PointCloud.hpp compute_radii analog)."""
        v = self.vertices
        n = len(v)
        k = min(k, n - 1)
        if k <= 0:
            self.radii = np.zeros(n)
            return self.radii
        # O(n^2) host-side; fine for scene-scale clouds
        d2 = ((v[:, None, :] - v[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        nearest = np.sort(d2, axis=1)[:, :k]
        self.radii = 0.5 * np.sqrt(nearest).mean(axis=1)
        return self.radii


def load_pointcloud(path: str) -> PointCloud:
    from .trimesh import load_ply

    if path.endswith(".ply"):
        m = load_ply(path)
        return PointCloud(np.asarray(m.vertices))
    if path.endswith(".node"):
        path = path[: -len(".node")]
    # .node without .ele: parse vertices only
    from .tetmesh import _load_indexed_rows

    verts, _ = _load_indexed_rows(path + ".node", 3)
    return PointCloud(verts)
