"""Geometry layer: loaders, procedural meshes, connectivity, mass lumping."""

import os

import numpy as np
import pytest

from admm_elastic_tpu.geometry import (
    TetMesh,
    across_edge,
    extract_hinges,
    load_node_ele,
    lump_masses_tets,
    lump_masses_tris,
    lump_masses_uniform,
    make_beam_tets,
    make_cylinder,
    make_sphere,
    make_sym_plane,
    surface_faces,
    tet_volumes,
    triangle_areas,
    unique_edges,
)

REF = "/root/reference"


def test_make_sym_plane_layout():
    m = make_sym_plane(30, 20)
    # vertex count: grid + centers (trimesh2 TriMeshBuilder.h:123)
    assert m.n_vertices == 31 * 21 + 30 * 20
    assert m.n_faces == 30 * 20 * 4
    # corner indices used by windyflag pins (windyflag.cpp:89-96):
    # vertex 0 = (x=0,y=0) -> (-1,-1,0); vertex 20 = (x=0,y=20) -> (-1,1,0)
    np.testing.assert_allclose(m.vertices[0], [-1, -1, 0])
    np.testing.assert_allclose(m.vertices[20], [-1, 1, 0])
    # all quads split into 4 triangles around the center vertex
    areas = triangle_areas(m.vertices, m.faces)
    assert np.all(areas > 0)
    np.testing.assert_allclose(areas.sum(), 4.0, rtol=1e-12)


def test_tet_volumes_and_surface():
    # unit tet
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=float)
    tets = np.array([[0, 1, 2, 3]], dtype=np.int32)
    np.testing.assert_allclose(tet_volumes(verts, tets), [1 / 6], rtol=1e-14)
    faces = surface_faces(tets)
    assert len(faces) == 4

    beam = make_beam_tets(3, 2, 2)
    vols = tet_volumes(beam.vertices, beam.tets)
    assert beam.n_tets == 3 * 2 * 2 * 5
    assert np.all(vols > 0)
    # 5-tet decomposition fills each unit cell exactly
    np.testing.assert_allclose(vols.sum(), 12.0, rtol=1e-12)
    # boundary of a box beam: 2*(3*2 + 3*2 + 2*2) quads, 2-4 tris each
    sf = surface_faces(beam.tets)
    assert len(sf) > 0


def test_node_ele_roundtrip(tmp_path):
    beam = make_beam_tets(2, 2, 2)
    prefix = str(tmp_path / "beam")
    beam.save(prefix)
    loaded = load_node_ele(prefix)
    np.testing.assert_allclose(loaded.vertices, beam.vertices)
    np.testing.assert_array_equal(loaded.tets, beam.tets)


def test_node_ele_one_indexed(tmp_path):
    p = tmp_path / "one"
    (tmp_path / "one.node").write_text(
        "4 3 0 0\n1 0 0 0\n2 1 0 0\n3 0 1 0\n4 0 0 1\n"
    )
    (tmp_path / "one.ele").write_text("1 4 0\n1 1 2 3 4\n")
    m = load_node_ele(str(p))
    assert m.n_vertices == 4 and m.n_tets == 1
    np.testing.assert_array_equal(m.tets[0], [0, 1, 2, 3])


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference assets not present")
def test_load_reference_meshes():
    bunny = load_node_ele(REF + "/samples/bunnyexpand/bunny_1124")
    assert bunny.n_vertices == 777 and bunny.n_tets == 2510
    dillo = load_node_ele(REF + "/samples/poordillo/dillo919")
    assert dillo.n_vertices == 919 and dillo.n_tets == 2761
    horse = load_node_ele(REF + "/samples/plinkopony/horse759")
    assert horse.n_vertices == 962 and horse.n_tets == 3221
    assert np.all(tet_volumes(dillo.vertices, dillo.tets) > 0)


def test_unique_edges_and_across_edge():
    m = make_sym_plane(2, 2)
    E = unique_edges(m.faces)
    # Euler: V - E + F = 1 for a disk (with boundary): faces=16, verts=13
    assert len(E) == m.n_faces + m.n_vertices - 1
    adj = across_edge(m.faces)
    assert adj.shape == (m.n_faces, 3)
    # each interior edge appears in exactly 2 faces; adjacency is symmetric
    for f in range(m.n_faces):
        for c in range(3):
            nf = adj[f, c]
            if nf >= 0:
                assert f in adj[nf]


def test_extract_hinges_volino():
    # two triangles sharing edge (1,2): faces (0,1,2) and (1,3,2)
    faces = np.array([[0, 1, 2], [1, 3, 2]], dtype=np.int32)
    h = extract_hinges(faces)
    assert h.shape == (1, 4)
    wings = {h[0, 0], h[0, 1]}
    shared = {h[0, 2], h[0, 3]}
    assert wings == {0, 3} and shared == {1, 2}

    # plane: interior edge count = hinges
    m = make_sym_plane(4, 3)
    h = extract_hinges(m.faces)
    E = unique_edges(m.faces)
    adj = across_edge(m.faces)
    n_interior = int((adj >= 0).sum() // 2)
    assert len(h) == n_interior
    # dedup: all sorted signatures unique
    sig = {tuple(sorted(r)) for r in h.tolist()}
    assert len(sig) == len(h)


def test_mass_lumping():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=float)
    tets = np.array([[0, 1, 2, 3]], dtype=np.int32)
    m = lump_masses_tets(verts, tets, total_mass=2.0)
    np.testing.assert_allclose(m, [0.5] * 4)

    mu = lump_masses_uniform(4, 2.0)
    np.testing.assert_allclose(mu, [0.5] * 4)

    tri_v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], dtype=float)
    tri_f = np.array([[0, 1, 2], [1, 3, 2]], dtype=np.int32)
    mt = lump_masses_tris(tri_v, tri_f, total_mass=3.0)
    np.testing.assert_allclose(mt.sum(), 3.0)
    # corner vertices touch 1 triangle, diagonal vertices touch 2
    assert mt[0] == pytest.approx(0.5) and mt[3] == pytest.approx(0.5)
    assert mt[1] == pytest.approx(1.0) and mt[2] == pytest.approx(1.0)


def test_primitive_meshes_watertight_normals():
    for mesh in [make_cylinder(6, 8), make_sphere(8)]:
        areas = triangle_areas(mesh.vertices, mesh.faces)
        assert np.all(areas > 0)
        # watertight: every edge shared by exactly 2 faces
        f = mesh.faces.astype(np.int64)
        e = np.sort(
            np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]]), axis=1
        )
        _, counts = np.unique(e, axis=0, return_counts=True)
        assert np.all(counts == 2)


def test_tetrahedralize_surface_fallback():
    """tetgen-fallback parity (TetMesh.cpp:376-435): a closed surface with
    no .node/.ele pair is tetrahedralized (Delaunay + inside-test); the
    result simulates."""
    import os
    import tempfile

    from admm_elastic_tpu.geometry.tetmesh import (
        load_mesh_as_tets,
        tetrahedralize_surface,
    )

    # closed box surface (12 triangles, 8 verts) -> 6ish tets inside
    from admm_elastic_tpu.geometry.primitives import make_box

    box = make_box(tess=1)
    tm = tetrahedralize_surface(box.vertices, box.faces)
    assert tm.n_tets >= 5
    # total volume equals the box volume
    v = tm.vertices[tm.tets]
    vol = np.abs(np.einsum(
        "ij,ij->i", v[:, 1] - v[:, 0],
        np.cross(v[:, 2] - v[:, 0], v[:, 3] - v[:, 0]))).sum() / 6.0
    assert abs(vol - 8.0) < 1e-6  # box is [-1,1]^3
    # positive orientation everywhere (load convention)
    svol = np.einsum("ij,ij->i", v[:, 1] - v[:, 0],
                     np.cross(v[:, 2] - v[:, 0], v[:, 3] - v[:, 0]))
    assert (svol > 0).all()
    assert tm.faces is not None and len(tm.faces) >= 12

    # load_mesh_as_tets routes .obj surfaces through the fallback
    with tempfile.TemporaryDirectory() as d:
        from admm_elastic_tpu.geometry.trimesh import TriMesh

        p = os.path.join(d, "box.obj")
        TriMesh(vertices=box.vertices, faces=box.faces).save_obj(p)
        tm2 = load_mesh_as_tets(p)
        assert tm2.n_tets == tm.n_tets
