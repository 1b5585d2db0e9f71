"""BVH build + ray traversal (mclscene BVH/RayIntersect component parity)."""

import numpy as np
import pytest

from admm_elastic_tpu.geometry.bvh import BVH, batched_closest_hit, morton_codes
from admm_elastic_tpu.geometry.primitives import make_sphere, make_sym_plane


def _brute_force_hit(vertices, faces, o, d):
    from admm_elastic_tpu.geometry.bvh import _ray_triangle

    best_t, best_f = np.inf, -1
    for f, tri_idx in enumerate(faces):
        t, u, v = _ray_triangle(np.asarray(o, float), np.asarray(d, float),
                                vertices[tri_idx])
        if t is not None and t < best_t:
            best_t, best_f = t, f
    return best_t, best_f


@pytest.mark.parametrize("method", ["lbvh", "spatial"])
def test_bvh_matches_brute_force(method):
    m = make_sphere(10)
    bvh = BVH(m.vertices, m.faces, method=method)
    assert bvh.n_nodes > 1
    rng = np.random.default_rng(0)
    for _ in range(25):
        o = rng.normal(size=3) * 3.0
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        t, f, _ = bvh.closest_hit(o, d)
        bt, bf = _brute_force_hit(m.vertices, m.faces.astype(np.int64), o, d)
        if bf < 0:
            assert f == -1
        else:
            assert f >= 0
            assert t == pytest.approx(bt, rel=1e-10)


def test_bvh_any_hit_and_radius():
    m = make_sphere(8, radius=2.0)
    bvh = BVH(m.vertices, m.faces)
    # ray from origin (inside) in any direction must hit
    assert bvh.any_hit([0, 0, 0], [1, 0, 0])
    # ray far away pointing away misses
    assert not bvh.any_hit([10, 0, 0], [1, 0, 0])
    assert bvh.radius(center=[0, 0, 0]) == pytest.approx(2.0, rel=1e-6)
    lo, hi = bvh.aabb()
    np.testing.assert_allclose(hi - lo, [4, 4, 4], rtol=1e-6)


def test_morton_ordering_locality():
    pts = np.random.default_rng(1).uniform(size=(1000, 3))
    codes = morton_codes(pts)
    order = np.argsort(codes)
    # consecutive morton neighbors should be spatially close on average
    d = np.linalg.norm(np.diff(pts[order], axis=0), axis=1)
    d_rand = np.linalg.norm(np.diff(pts, axis=0), axis=1)
    assert d.mean() < 0.5 * d_rand.mean()


def test_batched_closest_hit_matches():
    m = make_sym_plane(4, 4)
    rng = np.random.default_rng(2)
    origins = np.column_stack(
        [rng.uniform(-0.9, 0.9, 8), rng.uniform(-0.9, 0.9, 8), np.full(8, 1.0)]
    )
    dirs = np.tile(np.array([0.0, 0.0, -1.0]), (8, 1))
    t, f = batched_closest_hit(m.vertices, m.faces, origins, dirs)
    t, f = np.asarray(t), np.asarray(f)
    np.testing.assert_allclose(t, 1.0, rtol=1e-6)  # plane at z=0
    bvh = BVH(m.vertices, m.faces)
    for i in range(8):
        tb, fb, _ = bvh.closest_hit(origins[i], dirs[i])
        assert fb == f[i]


def test_empty_and_degenerate():
    bvh = BVH(np.zeros((0, 3)), np.zeros((0, 3), dtype=np.int32))
    assert bvh.closest_hit([0, 0, 0], [1, 0, 0])[1] == -1
    # degenerate triangle (zero area) never hit, no crash
    v = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0]], dtype=float)
    bvh2 = BVH(v, np.array([[0, 1, 2]]))
    assert bvh2.closest_hit([0.5, 1, 0], [0, -1, 0])[1] == -1
