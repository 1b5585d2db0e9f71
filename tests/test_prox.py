"""Proximal sub-solver correctness: the batched Newton must land on the same
minimizers as a high-accuracy scipy reference on the actual NH/StVK/Fung
objectives (the reference solves these with per-element L-BFGS,
TetForce.cpp:320-364; we replace the algorithm, not the problem)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import minimize as scipy_minimize

from admm_elastic_tpu.models.tet import nh_energy, stvk_energy
from admm_elastic_tpu.models.triangle import fung_energy
from admm_elastic_tpu.ops.newton import newton_minimize


def _solve_scipy(obj, x0, n):
    res = scipy_minimize(
        obj,
        x0,
        method="L-BFGS-B",
        bounds=[(1e-10, None)] * n,
        options={"maxiter": 200, "ftol": 1e-16, "gtol": 1e-12},
    )
    return res.x


@pytest.mark.parametrize("energy,name", [(nh_energy, "nh"), (stvk_energy, "stvk")])
def test_tet_prox_matches_scipy(energy, name):
    rng = np.random.default_rng(0)
    mu, lam = 100.0, 100.0
    k = min(mu, lam)
    # prox centers spanning stretch, compression, and inversion (sigma0[2]<0)
    centers = [
        np.array([1.0, 1.0, 1.0]),
        np.array([2.5, 0.7, 1.1]),
        np.array([0.3, 0.2, 0.25]),
        np.array([1.4, 1.0, -0.8]),  # inverted element
        np.array([4.0, 3.0, 2.0]),
    ] + [rng.uniform(0.1, 3.0, 3) for _ in range(10)]

    def objective(sig, s0):
        return energy(jnp.asarray(sig), mu, lam) + 0.5 * k * jnp.sum(
            (jnp.asarray(sig) - s0) ** 2
        )

    for s0 in centers:
        s0j = jnp.asarray(s0)
        got = np.asarray(
            newton_minimize(lambda s: objective(s, s0j), jnp.ones(3), 25)
        )
        ref = _solve_scipy(lambda s: float(objective(s, s0j)), np.ones(3), 3)
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5,
                                   err_msg=f"{name} prox center {s0}")


def test_fung_prox_matches_scipy():
    mu, b, k = 10.0, 1.0, 10.0
    for s0 in [np.array([1.0, 1.0]), np.array([1.4, 0.8]), np.array([0.6, 0.5])]:
        s0j = jnp.asarray(s0)

        def objective(sig):
            return fung_energy(jnp.asarray(sig), mu, b) + 0.5 * k * jnp.sum(
                (jnp.asarray(sig) - s0j) ** 2
            )

        got = np.asarray(newton_minimize(objective, s0j, 25))
        ref = _solve_scipy(lambda s: float(objective(s)), s0, 2)
        np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-5)


def test_newton_monotone_and_positive():
    """Never increases the objective; never leaves the positive domain."""
    mu = lam = 1e5
    k = 1e5

    def obj(s, s0):
        return nh_energy(s, mu, lam) + 0.5 * k * jnp.sum((s - s0) ** 2)

    rng = np.random.default_rng(3)
    s0s = jnp.asarray(rng.uniform(-2, 4, size=(64, 3)))

    def run(s0):
        f = lambda s: obj(s, s0)
        out = newton_minimize(f, jnp.ones(3), 8)
        return out, f(out), f(jnp.ones(3))

    outs, f_end, f_start = jax.vmap(run)(s0s)
    assert bool(jnp.all(outs > 0))
    assert bool(jnp.all(f_end <= f_start + 1e-9))
    assert bool(jnp.all(jnp.isfinite(outs)))


def test_newton_batched_matches_single():
    mu = lam = 100.0
    k = 100.0
    rng = np.random.default_rng(5)
    s0s = jnp.asarray(rng.uniform(0.2, 2.5, size=(32, 3)))

    def solve(s0):
        return newton_minimize(
            lambda s: nh_energy(s, mu, lam) + 0.5 * k * jnp.sum((s - s0) ** 2),
            jnp.ones(3),
            15,
        )

    batched = jax.vmap(solve)(s0s)
    for i in range(4):
        single = solve(s0s[i])
        np.testing.assert_allclose(np.asarray(batched[i]), np.asarray(single),
                                   rtol=1e-12)


def test_closed_form_grad_hess_match_ad():
    """Hand-derived NH/StVK gradients+Hessians equal AD derivatives."""
    from admm_elastic_tpu.models.tet import (
        nh_energy, nh_grad_hess, stvk_energy, stvk_grad_hess,
    )

    rng = np.random.default_rng(7)
    for energy, gh in [(nh_energy, nh_grad_hess), (stvk_energy, stvk_grad_hess)]:
        for _ in range(10):
            sig = jnp.asarray(rng.uniform(0.2, 3.0, 3))
            sig0 = jnp.asarray(rng.uniform(0.2, 3.0, 3))
            mu, lam, k = 123.0, 77.0, 50.0

            def obj(s):
                return energy(s, mu, lam) + 0.5 * k * jnp.sum((s - sig0) ** 2)

            g_ad = jax.grad(obj)(sig)
            H_ad = jax.jacfwd(jax.grad(obj))(sig)
            g, H = gh(sig, mu, lam, k, sig0)
            np.testing.assert_allclose(np.asarray(g), np.asarray(g_ad),
                                       rtol=1e-10)
            np.testing.assert_allclose(np.asarray(H), np.asarray(H_ad),
                                       rtol=1e-10)
