"""Batched small-SVD kernels: reconstruction, orientation, degeneracy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from admm_elastic_tpu.ops.svd import (
    eigh_sym3x3,
    polar_project,
    svd3x2,
    svd3x3_oriented,
)


def _random_mats(n=64, seed=0):
    rng = np.random.default_rng(seed)
    mats = [rng.normal(size=(3, 3)) for _ in range(n)]
    mats += [np.diag([1.0, 1.0, -1.0]) @ rng.normal(size=(3, 3)) for _ in range(16)]
    mats += [
        np.zeros((3, 3)),
        np.eye(3),
        np.diag([1e-12, 1.0, 2.0]),
        np.diag([1e-9, 1e-9, 3.0]),
        np.outer(rng.normal(size=3), rng.normal(size=3)),  # rank 1
        1e-8 * rng.normal(size=(3, 3)),
        1e8 * rng.normal(size=(3, 3)),
    ]
    return np.stack(mats)


def test_eigh_sym3x3_reconstruction():
    F = _random_mats()
    A = np.einsum("nji,njk->nik", F, F)
    w, V = jax.jit(jax.vmap(eigh_sym3x3))(jnp.asarray(A))
    w, V = np.asarray(w), np.asarray(V)
    recon = np.einsum("nij,nj,nkj->nik", V, w, V)
    scale = np.abs(A).max(axis=(1, 2), keepdims=True) + 1.0
    assert np.max(np.abs(recon - A) / scale) < 1e-12
    assert np.all(w[:, 0] >= w[:, 1] - 1e-9) and np.all(w[:, 1] >= w[:, 2] - 1e-9)


def test_svd3x3_oriented():
    F = _random_mats()
    U, S, V = jax.jit(jax.vmap(svd3x3_oriented))(jnp.asarray(F))
    U, S, V = map(np.asarray, (U, S, V))
    recon = np.einsum("nij,nj,nkj->nik", U, S, V)
    scale = np.abs(F).max(axis=(1, 2), keepdims=True) + 1.0
    assert np.max(np.abs(recon - F) / scale) < 1e-10
    # proper rotations
    assert np.allclose(np.linalg.det(U), 1.0, atol=1e-9)
    assert np.allclose(np.linalg.det(V), 1.0, atol=1e-9)
    eye = np.eye(3)
    assert np.max(np.abs(np.einsum("nij,nik->njk", U, U) - eye)) < 1e-9
    # sign convention: sign(S[2]) == sign(det F) (TetForce.cpp:88-100 semantics)
    sgn = np.sign(np.linalg.det(F))
    assert np.all((np.sign(S[:, 2]) == sgn) | (sgn == 0))
    # ordering s0 >= s1 >= |s2|
    assert np.all(S[:, 0] >= S[:, 1] - 1e-9)
    assert np.all(S[:, 1] >= np.abs(S[:, 2]) - 1e-9)


def test_svd3x3_matches_numpy_singular_values():
    F = _random_mats(32, seed=3)
    _, S, _ = jax.jit(jax.vmap(svd3x3_oriented))(jnp.asarray(F))
    S_ref = np.linalg.svd(F, compute_uv=False)
    np.testing.assert_allclose(np.abs(np.asarray(S)), S_ref, rtol=1e-8, atol=1e-8)


def test_polar_project_matches_reference_semantics():
    """polar_project == plain-SVD U diag(1,1,-1 if det F<0) V^T — the
    LinearTetStrain projection (TetForce.cpp:137-143), i.e. the closest
    proper rotation to F."""
    F = _random_mats(32, seed=4)
    R = np.asarray(jax.jit(jax.vmap(polar_project))(jnp.asarray(F)))
    for i in range(len(F)):
        u, s, vt = np.linalg.svd(F[i])
        d = np.ones(3)
        if np.linalg.det(F[i]) < 0:
            d[2] = -1.0
        expect = u @ np.diag(d) @ vt
        if np.abs(s[1] - s[2]) < 1e-9 or s[1] < 1e-12:
            continue  # projection not unique; skip degenerate comparisons
        assert np.linalg.det(R[i]) == pytest.approx(1.0, abs=1e-9)
        np.testing.assert_allclose(R[i], expect, rtol=1e-6, atol=1e-8)


def test_svd3x2():
    rng = np.random.default_rng(1)
    F = np.stack([rng.normal(size=(3, 2)) for _ in range(64)] + [np.zeros((3, 2))])
    U, S, V = jax.jit(jax.vmap(svd3x2))(jnp.asarray(F))
    U, S, V = map(np.asarray, (U, S, V))
    recon = np.einsum("nij,nj,nkj->nik", U, S, V)
    assert np.max(np.abs(recon - F)) < 1e-10
    assert np.all(S >= -1e-12)
    assert np.all(S[:, 0] >= S[:, 1] - 1e-9)
    S_ref = np.linalg.svd(F, compute_uv=False)
    np.testing.assert_allclose(S, S_ref, rtol=1e-8, atol=1e-10)
    # orthonormal columns
    eye = np.eye(2)
    assert np.max(np.abs(np.einsum("nij,nik->njk", U, U) - eye)) < 1e-9


@pytest.mark.parametrize("dtype", [jnp.float32])
def test_svd3x3_f32_stability(dtype):
    F = jnp.asarray(_random_mats(32, seed=5), dtype)
    U, S, V = jax.jit(jax.vmap(svd3x3_oriented))(F)
    recon = jnp.einsum("nij,nj,nkj->nik", U, S, V)
    scale = jnp.max(jnp.abs(F), axis=(1, 2), keepdims=True) + 1.0
    assert float(jnp.max(jnp.abs(recon - F) / scale)) < 1e-4
    assert bool(jnp.all(jnp.isfinite(U)) & jnp.all(jnp.isfinite(S)))
