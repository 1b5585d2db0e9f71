"""Host-side mesh geometry: loaders, procedural builders, connectivity, mass lumping.

All functions here are pure numpy (host-side preprocessing). Device code lives in
:mod:`admm_elastic_tpu.ops` / :mod:`admm_elastic_tpu.models`.
"""

from .tetmesh import (TetMesh, load_mesh_as_tets, load_node_ele,
                      surface_faces, tet_volumes, tetrahedralize_surface)
from .trimesh import TriMesh, triangle_areas, vertex_normals
from .primitives import make_plane_grid, make_sym_plane, make_cylinder, make_sphere, make_box, make_torus, make_beam_tets
from .connectivity import unique_edges, across_edge, extract_hinges
from .masses import lump_masses_uniform, lump_masses_tets, lump_masses_tris

__all__ = [
    "TetMesh", "load_mesh_as_tets", "load_node_ele", "surface_faces",
    "tet_volumes", "tetrahedralize_surface",
    "TriMesh", "triangle_areas", "vertex_normals",
    "make_plane_grid", "make_sym_plane", "make_cylinder", "make_sphere", "make_box", "make_torus",
    "make_beam_tets",
    "unique_edges", "across_edge", "extract_hinges",
    "lump_masses_uniform", "lump_masses_tets", "lump_masses_tris",
]
