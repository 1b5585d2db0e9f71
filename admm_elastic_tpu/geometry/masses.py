"""Mass lumping: uniform (mass/n per node) or density-weighted
(tet volume/4, triangle area/3 per incident node), matching the reference's
ForceBuilder.hpp:104-151,191-303 semantics."""

from __future__ import annotations

import numpy as np

from .tetmesh import tet_volumes
from .trimesh import triangle_areas


def lump_masses_uniform(n_vertices: int, total_mass: float) -> np.ndarray:
    return np.full(n_vertices, total_mass / n_vertices, dtype=np.float64)


def lump_masses_tets(
    vertices: np.ndarray, tets: np.ndarray, total_mass: float
) -> np.ndarray:
    """Density-weighted lumping: each tet's mass (density*volume) split /4."""
    vol = tet_volumes(vertices, tets)
    tot = vol.sum()
    if tot <= 0:
        raise ValueError("tet mesh volume is zero; cannot compute density")
    density = total_mass / tot
    m = np.zeros(len(vertices), dtype=np.float64)
    contrib = density * vol / 4.0
    for k in range(4):
        np.add.at(m, np.asarray(tets, dtype=np.int64)[:, k], contrib)
    return m


def lump_masses_tris(
    vertices: np.ndarray, faces: np.ndarray, total_mass: float
) -> np.ndarray:
    """Density-weighted lumping: each triangle's mass (density*area) split /3."""
    area = triangle_areas(vertices, faces)
    tot = area.sum()
    if tot <= 0:
        raise ValueError("triangle mesh area is zero; cannot compute density")
    density = total_mass / tot
    m = np.zeros(len(vertices), dtype=np.float64)
    contrib = density * area / 3.0
    for k in range(3):
        np.add.at(m, np.asarray(faces, dtype=np.int64)[:, k], contrib)
    return m
