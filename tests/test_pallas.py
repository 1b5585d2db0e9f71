"""Pallas fused local-step kernels, validated in interpreter mode on CPU
against the jnp reference implementations (the kernels compile natively on
TPU; interpret=True exercises identical math)."""

import jax.numpy as jnp
import numpy as np

from admm_elastic_tpu.ops.pallas.tet_local import (
    BLOCK,
    arap_local_step,
    arap_local_step_reference,
)


def _data(E, seed=0, inverted=False):
    rng = np.random.default_rng(seed)
    dx9 = rng.normal(size=(9, E)).astype(np.float32)
    if inverted:
        # make a batch of inverted deformation gradients
        F = dx9.T.reshape(E, 3, 3)
        F[: E // 2] = F[: E // 2] @ np.diag([1.0, 1.0, -1.0])
        dx9 = F.reshape(E, 9).T.copy()
    u9 = (rng.normal(size=(9, E)) * 0.1).astype(np.float32)
    w2 = rng.uniform(0.5, 2.0, E).astype(np.float32)
    k = rng.uniform(0.5, 2.0, E).astype(np.float32)
    return (jnp.asarray(a) for a in (dx9, u9, w2, k))


def test_arap_kernel_matches_reference():
    dx9, u9, w2, k = _data(2 * BLOCK)
    z1, un1 = arap_local_step(dx9, u9, w2, k, interpret=True)
    z2, un2 = arap_local_step_reference(dx9, u9, w2, k)
    assert float(jnp.abs(z1 - z2).max()) < 1e-4
    assert float(jnp.abs(un1 - un2).max()) < 1e-4


def test_arap_kernel_inverted_elements():
    dx9, u9, w2, k = _data(BLOCK, seed=1, inverted=True)
    z1, un1 = arap_local_step(dx9, u9, w2, k, interpret=True)
    z2, un2 = arap_local_step_reference(dx9, u9, w2, k)
    assert float(jnp.abs(z1 - z2).max()) < 1e-4
    assert bool(jnp.isfinite(z1).all())


def test_arap_kernel_degenerate():
    z = jnp.zeros((9, BLOCK), jnp.float32)
    ones = jnp.ones(BLOCK, jnp.float32)
    out_z, out_u = arap_local_step(z, z, ones, ones, interpret=True)
    assert bool(jnp.isfinite(out_z).all() and jnp.isfinite(out_u).all())
