"""Native C++ meshops vs numpy fallbacks: identical sets, matching semantics."""

import numpy as np
import pytest

from admm_elastic_tpu.geometry import native
from admm_elastic_tpu.geometry.connectivity import (
    across_edge,
    extract_hinges,
    unique_edges,
)
from admm_elastic_tpu.geometry.primitives import make_beam_tets, make_sym_plane
from admm_elastic_tpu.geometry.tetmesh import surface_faces

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libmeshops.so not built"
)


def test_native_unique_edges_matches():
    m = make_sym_plane(12, 9)
    ref = unique_edges(m.faces)  # numpy path (below threshold)
    nat = native.unique_edges(m.faces)
    np.testing.assert_array_equal(nat, ref)


def test_native_across_edge_matches():
    m = make_sym_plane(12, 9)
    ref = across_edge(m.faces)
    nat = native.across_edge(m.faces)
    np.testing.assert_array_equal(nat, ref)


def test_native_hinges_match():
    m = make_sym_plane(12, 9)
    ref = extract_hinges(m.faces)
    nat = native.extract_hinges(m.faces)
    np.testing.assert_array_equal(nat, ref)


def test_native_surface_faces_same_set():
    beam = make_beam_tets(4, 3, 3)
    ref = surface_faces(beam.tets)
    nat = native.surface_faces(beam.tets)
    ref_set = {tuple(sorted(f)) for f in ref.tolist()}
    nat_set = {tuple(sorted(f)) for f in nat.tolist()}
    assert ref_set == nat_set
    # orientation: same winding per face
    ref_map = {tuple(sorted(f)): tuple(f) for f in ref.tolist()}
    for f in nat.tolist():
        r = ref_map[tuple(sorted(f))]
        # same cyclic order
        assert tuple(f) in (r, r[1:] + r[:1], r[2:] + r[:2])


def test_native_large_mesh_consistency():
    beam = make_beam_tets(12, 10, 10)
    sf = native.surface_faces(beam.tets)
    # boundary of a (12,10,10) box beam: quads split into tris on the surface
    assert len(sf) > 0
    assert sf.min() >= 0 and sf.max() < beam.n_vertices
