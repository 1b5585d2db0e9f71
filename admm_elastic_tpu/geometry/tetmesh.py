"""Tetrahedral mesh container and .node/.ele I/O.

Parity target: the reference's TetMesh loaders with 1-index autodetect and
boundary-surface extraction by unique-face counting
(reference: deps/mclscene/src/TetMesh.cpp:133-270).

A C++ fast path for connectivity lives in admm_elastic_tpu/native (optional);
this module is the always-available numpy implementation.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np


@dataclasses.dataclass
class TetMesh:
    """Vertices (n,3) float64 and tets (T,4) int32."""

    vertices: np.ndarray
    tets: np.ndarray
    faces: np.ndarray | None = None  # boundary surface triangles, (F,3) int32

    @property
    def n_vertices(self) -> int:
        return int(self.vertices.shape[0])

    @property
    def n_tets(self) -> int:
        return int(self.tets.shape[0])

    def need_surface(self) -> np.ndarray:
        if self.faces is None:
            self.faces = surface_faces(self.tets)
        return self.faces

    def apply_xform(self, M: np.ndarray) -> "TetMesh":
        """Apply a 4x4 homogeneous transform to the vertices (in place)."""
        v = self.vertices
        vh = v @ M[:3, :3].T + M[:3, 3]
        self.vertices = vh
        return self

    def save(self, prefix: str) -> None:
        """Write .node/.ele files (0-indexed)."""
        with open(prefix + ".node", "w") as f:
            f.write(f"{self.n_vertices} 3 0 0\n")
            for i, p in enumerate(self.vertices):
                f.write(f"{i} {p[0]:.17g} {p[1]:.17g} {p[2]:.17g}\n")
        with open(prefix + ".ele", "w") as f:
            f.write(f"{self.n_tets} 4 0\n")
            for i, t in enumerate(self.tets):
                f.write(f"{i} {t[0]} {t[1]} {t[2]} {t[3]}\n")


def _load_indexed_rows(path: str, n_cols: int) -> np.ndarray:
    """Read a tetgen-style file: header line '<count> ...', then '<idx> c0 c1 ...' rows.

    Autodetects 1-indexing from the first row's index (reference
    TetMesh.cpp:160-161,207-211) and returns rows ordered by index.
    """
    with open(path) as f:
        header = f.readline().split()
        count = int(header[0])
        rows = np.empty((count, n_cols), dtype=np.float64)
        seen = np.zeros(count, dtype=bool)
        starts_with_one = False
        for i in range(count):
            parts = f.readline().split()
            idx = int(parts[0])
            if i == 0 and idx == 1:
                starts_with_one = True
            if starts_with_one:
                idx -= 1
            if idx >= count or seen[idx]:
                raise ValueError(f"bad index {idx} in {path}")
            seen[idx] = True
            rows[idx] = [float(p) for p in parts[1 : 1 + n_cols]]
    if not seen.all():
        raise ValueError(f"missing indices in {path}")
    return rows, starts_with_one


def load_node_ele(prefix: str) -> TetMesh:
    """Load `<prefix>.node` + `<prefix>.ele` (tetgen format, 0- or 1-indexed)."""
    if prefix.endswith(".node") or prefix.endswith(".ele"):
        prefix = os.path.splitext(prefix)[0]
    verts, _ = _load_indexed_rows(prefix + ".node", 3)
    tets, one_based = _load_indexed_rows(prefix + ".ele", 4)
    tets = tets.astype(np.int64)
    if one_based:
        tets -= 1
    if tets.min() < 0 or tets.max() >= len(verts):
        raise ValueError(f"tet indices out of range in {prefix}.ele")
    return TetMesh(vertices=verts, tets=tets.astype(np.int32))


def surface_faces(tets: np.ndarray) -> np.ndarray:
    """Boundary triangles of a tet mesh: faces referenced by exactly one tet.

    Face orientation matches the reference's per-tet face list
    (p0p1p3, p0p2p1, p0p3p2, p1p2p3; TetMesh.cpp:243-247). (Face *order* may
    differ between the numpy and native paths — a permutation only.)
    """
    if len(tets) >= 20_000:
        from . import native

        out = native.surface_faces(tets)
        if out is not None:
            return out
    t = np.asarray(tets, dtype=np.int64)
    p0, p1, p2, p3 = t[:, 0], t[:, 1], t[:, 2], t[:, 3]
    faces = np.concatenate(
        [
            np.stack([p0, p1, p3], axis=1),
            np.stack([p0, p2, p1], axis=1),
            np.stack([p0, p3, p2], axis=1),
            np.stack([p1, p2, p3], axis=1),
        ],
        axis=0,
    )
    key = np.sort(faces, axis=1)
    _, inv, counts = np.unique(key, axis=0, return_inverse=True, return_counts=True)
    boundary = counts[inv] == 1
    return faces[boundary].astype(np.int32)


def tet_volumes(vertices: np.ndarray, tets: np.ndarray) -> np.ndarray:
    """|det| / 6 signed-volume magnitude per tet (reference TetForce.cpp:56)."""
    v = np.asarray(vertices, dtype=np.float64)
    t = np.asarray(tets, dtype=np.int64)
    v0, v1, v2, v3 = (v[t[:, i]] for i in range(4))
    return np.abs(np.einsum("ij,ij->i", v0 - v3, np.cross(v1 - v3, v2 - v3))) / 6.0


def tetrahedralize_surface(vertices, faces, quality=None):
    """Tetrahedralize a closed triangle surface: the tetgen-fallback path
    of the reference's TetMesh loader (deps/mclscene/src/TetMesh.cpp:376-435
    calls tetgen when a .node/.ele pair is absent).

    tetgen itself is ~35k LoC of vendored C++ the reference only exercises
    for PLY inputs; here the same capability is built from parts we already
    have: scipy Delaunay over the surface vertices, then discard tets whose
    centroid lies OUTSIDE the closed surface (ray-parity test against the
    BVH) — for a closed watertight input this reproduces tetgen's
    constrained behavior up to boundary-face recovery (Delaunay may shave
    slivers at concave creases; tetgen refines instead). No Steiner-point
    refinement (`quality` accepted for API parity, ignored).

    Returns a TetMesh (vertices, tets, boundary surface).
    """
    from scipy.spatial import Delaunay

    from .bvh import BVH

    v = np.asarray(vertices, np.float64)
    f = np.asarray(faces, np.int64)
    # weld duplicate vertices (procedural surfaces often store per-face
    # sheets); Delaunay rejects/degenerates on coincident points
    vq = np.round(v / (1e-9 * max(1.0, np.abs(v).max())))
    _, first, invmap = np.unique(vq, axis=0, return_index=True,
                                 return_inverse=True)
    v = v[first]
    f = invmap[f]
    f = f[(f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 0] != f[:, 2])]
    tri = Delaunay(v)
    tets = tri.simplices.astype(np.int64)

    # drop degenerate slivers: gridded/cospherical point sets make qhull
    # emit zero-volume simplices, which cannot carry a rest basis
    q0, q1, q2, q3 = (v[tets[:, i]] for i in range(4))
    vol6 = np.einsum("ij,ij->i", q1 - q0, np.cross(q2 - q0, q3 - q0))
    scale = float(np.abs(v).max()) or 1.0
    tets = tets[np.abs(vol6) > 1e-9 * scale**3]

    # keep tets whose centroid is inside the closed surface (odd number of
    # crossings along a fixed ray; BVH closest-hit marched segment by
    # segment)
    bvh = BVH(v, f)
    cents = v[tets].mean(axis=1)
    rng = np.random.default_rng(0)
    direction = rng.normal(size=3)
    direction /= np.linalg.norm(direction)

    def inside(p):
        crossings = 0
        o = p.copy()
        guard = 0
        while True:
            t, fidx, _ = bvh.closest_hit(o, direction)
            if fidx < 0:
                break
            crossings += 1
            o = o + (t + 1e-9 * max(1.0, abs(t))) * direction
            guard += 1
            if guard > 1000:
                break
        return crossings % 2 == 1

    keep = np.fromiter((inside(c) for c in cents), bool, len(cents))
    tets = tets[keep]
    if len(tets) == 0:
        raise ValueError("tetrahedralization produced no interior tets "
                         "(surface not closed?)")
    # fix orientation: positive signed volume (TetMesh load convention)
    p0, p1, p2, p3 = (v[tets[:, i]] for i in range(4))
    vol6 = np.einsum("ij,ij->i", p1 - p0, np.cross(p2 - p0, p3 - p0))
    flip = vol6 < 0
    tets[flip, 2], tets[flip, 3] = tets[flip, 3], tets[flip, 2].copy()
    surface = surface_faces(tets.astype(np.int32))
    return TetMesh(vertices=v, tets=tets.astype(np.int32), faces=surface)


def load_mesh_as_tets(path: str):
    """Reference TetMesh::load semantics: prefer a .node/.ele pair; fall
    back to tetrahedralizing a surface mesh (TetMesh.cpp:47-64,376-435)."""
    base = path
    for ext in (".node", ".ele"):
        if base.endswith(ext):
            base = base[: -len(ext)]
    import os

    if os.path.exists(base + ".node") and os.path.exists(base + ".ele"):
        return load_node_ele(base)
    from .trimesh import load_obj, load_ply

    if path.endswith(".ply"):
        m = load_ply(path)
    elif path.endswith(".obj"):
        m = load_obj(path)
    else:
        raise ValueError(f"no .node/.ele pair and unknown extension: {path}")
    return tetrahedralize_surface(m.vertices, m.faces)
