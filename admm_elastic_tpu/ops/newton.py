"""Fixed-iteration safeguarded Newton for batched proximal sub-problems.

The reference minimizes per-element proximal objectives over 2-3 singular
values with L-BFGS + More-Thuente line search (cppoptlib lbfgssolver.h:43-144).
That algorithm is heavily branchy and unsuited to SIMD execution. Here we use
a damped Newton iteration with a fixed, branch-free backtracking schedule:

  * gradient via `jax.grad`, Hessian via `jax.jacfwd(jax.grad(f))` — exact AD
    of the analytic energies (the reference's hand-coded NHProx Hessian,
    TetForce.cpp:245-263, actually disagrees with its own gradient; AD avoids
    that class of bug);
  * Levenberg damping + steepest-descent fallback when the Newton direction
    is not a descent direction;
  * candidate steps {1, 1/2, 1/4, 1/16} evaluated in parallel, best
    objective wins, never moving to a worse point (monotone);
  * domain guard sigma > floor enforced by clamping (the reference uses
    +inf barrier values, TetForce.cpp:229).

Designed to be vmapped over elements; all shapes static.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

#: Newton-direction backtracking schedule. The deep tail matters: with an
#: ill-conditioned Hessian (tiny eigenvalue, large gradient) the Newton step
#: can be ~100x too long, and a schedule stopping at 1/16 leaves every
#: candidate worse than x — the iterate then never moves at all (caught by
#: the L-BFGS oracle in tests/test_hyper_oracle.py).
_ALPHAS = (1.0, 0.5, 0.25, 0.0625, 1.0 / 64.0, 1.0 / 256.0)
#: scaled gradient-step candidates always evaluated alongside the Newton
#: candidates — guarantees progress even when the Newton direction is
#: useless at every scale
_GRAD_ALPHAS = (1.0, 0.0625)


def _solve_spd(H, g, damp):
    """Solve (H + damp*I) d = g for tiny n (2 or 3) via explicit inverse."""
    n = H.shape[0]
    A = H + damp * jnp.eye(n, dtype=H.dtype)
    if n == 2:
        det = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
        inv = jnp.array([[A[1, 1], -A[0, 1]], [-A[1, 0], A[0, 0]]], H.dtype)
        det = jnp.where(jnp.abs(det) < jnp.finfo(H.dtype).tiny * 1e3, 1.0, det)
        return (inv @ g) / det
    # n == 3: adjugate
    c0 = jnp.cross(A[:, 1], A[:, 2])
    c1 = jnp.cross(A[:, 2], A[:, 0])
    c2 = jnp.cross(A[:, 0], A[:, 1])
    det = jnp.dot(A[:, 0], c0)
    det = jnp.where(jnp.abs(det) < jnp.finfo(H.dtype).tiny * 1e3, 1.0, det)
    adjT = jnp.stack([c0, c1, c2], axis=0)  # rows = cofactor columns
    return (adjT @ g) / det


def newton_minimize(value_fn, x0, iters: int, floor: float = 1e-10,
                    grad_fn=None, hess_fn=None):
    """Minimize value_fn (R^n -> R) from x0 with `iters` damped-Newton steps.

    value_fn must be differentiable on x > floor; x is clamped to the domain
    between steps. grad_fn/hess_fn default to AD (jax.grad / jacfwd); passing
    hand-derived closed forms shrinks the traced program considerably for the
    hot hyperelastic paths. Returns the final iterate.
    """
    if grad_fn is None:
        grad_fn = jax.grad(value_fn)
    if hess_fn is None:
        hess_fn = jax.jacfwd(grad_fn)
    dtype = x0.dtype
    floor = jnp.asarray(floor, dtype)
    alphas = jnp.asarray(_ALPHAS, dtype)
    galphas = jnp.asarray(_GRAD_ALPHAS, dtype)

    def body(_, x):
        g = grad_fn(x)
        H = hess_fn(x)
        # Levenberg damping scaled to the Hessian magnitude keeps the solve
        # stable when H is indefinite far from the optimum.
        hnorm = jnp.max(jnp.abs(H))
        damp = 1e-6 * (hnorm + 1.0)
        d = _solve_spd(H, -g, damp)
        # fall back to (scaled) steepest descent if not a descent direction
        descent = jnp.dot(d, g) < 0.0
        gscale = 1.0 / (hnorm + 1.0)
        d = jnp.where(descent, d, -g * gscale)

        cand_n = x[None, :] + alphas[:, None] * d[None, :]
        cand_g = x[None, :] - galphas[:, None] * (g * gscale)[None, :]
        cand = jnp.maximum(jnp.concatenate([cand_n, cand_g], axis=0), floor)
        vals = jax.vmap(value_fn)(cand)
        vals = jnp.where(jnp.isfinite(vals), vals, jnp.inf)
        best = jnp.argmin(vals)
        x_new = cand[best]
        improved = vals[best] < value_fn(x)
        return jnp.where(improved, x_new, x)

    x0 = jnp.maximum(x0, floor)
    return jax.lax.fori_loop(0, iters, body, x0)


def make_batched_newton(value_fn_of_params, iters: int, floor: float = 1e-10):
    """Build a vmapped solver: (x0 (E,n), *params each (E,...)) -> (E,n).

    value_fn_of_params(x, *params) -> scalar objective for one element.
    """

    def single(x0, *params):
        return newton_minimize(lambda x: value_fn_of_params(x, *params), x0, iters, floor)

    return jax.vmap(single)
