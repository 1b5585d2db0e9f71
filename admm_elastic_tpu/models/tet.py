"""Tetrahedral strain constraints (reference TetForce.cpp).

Selector: each tet contributes 3 row-groups; Dx reshaped is the deformation
gradient F = X_def @ B with B = D4 @ inv(rest edge matrix) (4x3)
(TetForce.cpp:28-77). We store coeff[e,r,c] = B[e,c,r] so the canonical
(E,R,3) layout Dx[e,r,:] holds F^T rows; F = Dx^T per element.

Sign convention note: the reference reconstructs z from a *plain* SVD
(sigma >= 0, U/V possibly improper) after modifying the singular values; we
use the oriented SVD (proper rotations, signed s2). The two reconstructions
are related by flipping the third modified singular value when det F < 0 —
see `_reconstruct_plain`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.newton import newton_minimize
from ..ops.svd import polar_project, svd3x3_oriented
from .base import ForceBatch

_D4 = np.array(
    [[-1.0, -1.0, -1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
)


def build_tet_basis(x: np.ndarray, tets: np.ndarray):
    """Per-tet B (E,4,3) and volume (E,) from rest positions
    (helper::init_tet_force, TetForce.cpp:28-57)."""
    t = np.asarray(tets, dtype=np.int64)
    v = np.asarray(x, dtype=np.float64)
    v0, v1, v2, v3 = (v[t[:, i]] for i in range(4))
    edges = np.stack([v1 - v0, v2 - v0, v3 - v0], axis=2)  # (E,3,3) columns
    det = np.linalg.det(edges)
    bad = np.flatnonzero(np.abs(det) < 1e-300)
    if bad.size:
        raise ValueError(
            f"degenerate (zero-volume) rest tet(s) at indices {bad[:8].tolist()}"
            f"{'...' if bad.size > 8 else ''}: cannot build rest basis"
        )
    edges_inv = np.linalg.inv(edges)
    B = np.einsum("ck,ekr->ecr", _D4, edges_inv)  # (E,4,3)
    volume = np.abs(np.einsum("ij,ij->i", v0 - v3, np.cross(v1 - v3, v2 - v3))) / 6.0
    return B, volume


def _tet_selector_params(tets, B):
    """coeff[e,r,c] = B[e,c,r] -> (E,3,4)."""
    return {
        "indices": np.asarray(tets, dtype=np.int32),
        "coeff": np.transpose(B, (0, 2, 1)).copy(),
    }


def _F_of(Dxu):
    """(E,R=3,3) canonical rows -> (E,3,3) deformation gradients."""
    return jnp.swapaxes(Dxu, 1, 2)


def _rows_of(F):
    return jnp.swapaxes(F, 1, 2)


def _reconstruct_plain(U, V, s_mod, s2_sign):
    """U_o diag(s_mod') V_o^T equal to the reference's plain-SVD reconstruction
    U_p diag(s_mod) V_p^T: flip the third entry when the element is inverted
    (plain factors absorb the reflection that our oriented factors put into
    sign(s2))."""
    flip = jnp.where(s2_sign < 0, -1.0, 1.0)
    s = jnp.asarray(s_mod).at[:, 2].multiply(flip)
    return jnp.einsum("eij,ej,ekj->eik", U, s, V)


class _PlaneLayoutMixin:
    """Plane-layout (9, E_padded) Dx/u/z handling for pallas-backed tet
    forces: the fused kernels consume/produce structure-of-planes arrays, and
    these overrides keep that layout across the WHOLE ADMM iteration (Dx is
    produced plane-directly by one einsum, the RHS contribution consumes
    planes directly) — zero relayout ops on the hot path.

    Plane convention: planes[3a+b, e] = canonical[e, b, a] (i.e. F_{a,b} of
    the deformation gradient; see _to_planes)."""

    def _padded_E(self, E=None):
        """Kernel-block padding for E elements. E defaults to this force's
        global element count; the per-shard SPMD path (parallel/spmd.py)
        passes LOCAL params whose shapes drive all sizes, so every method
        below derives E from the arrays rather than from self."""
        from ..ops.pallas.tet_local import BLOCK

        if E is None:
            E = self.n_elements
        return -(-E // BLOCK) * BLOCK

    def _to_planes(self, rows, pad, fill=1.0):
        """(E,R,3) canonical rows -> (9, E+pad) F-layout planes."""
        E = rows.shape[0]
        planes = _F_of(rows).reshape(E, 9).T
        if pad:
            planes = jnp.pad(planes, ((0, 0), (0, pad)), constant_values=fill)
        return planes

    def _from_planes(self, planes, E):
        return _rows_of(planes[:, :E].T.reshape(E, 3, 3))

    def _coeff_planes(self, params):
        """cp[4b+k, e] = coeff[e,b,k] = B[e,k,b], padded (12, Ep) — the
        selector layout the fused local+RHS kernels consume."""
        cp = np.transpose(params["coeff"], (1, 2, 0)).reshape(12, -1)
        Ep = self._padded_E(cp.shape[1])
        return np.pad(cp, ((0, 0), (0, Ep - cp.shape[1])))

    def _gathered_planes(self, params, x):
        """xg[3k+a, e] = x[tet[e,k], a], padded (12, Ep)."""
        E = params["indices"].shape[0]
        pad = self._padded_E(E) - E
        xg = x[params["indices"]].reshape(E, 12).T
        if pad:
            xg = jnp.pad(xg, ((0, 0), (0, pad)))
        return xg

    def _contrib_flat(self, contrib, E):
        """(12, Ep) contribution planes -> (E*4, 3) flat rows matching the
        unfused rhs_contribution layout."""
        return contrib[:, :E].T.reshape(E * 4, 3)

    def _contrib_flat6(self, contrib, contribz, E):
        """Two (12, Ep) contribution plane blocks -> (E*4, 6) flat rows
        (cols 0:3 RHS, 3:6 dual-residual z rows)."""
        return jnp.concatenate(
            [self._contrib_flat(contrib, E), self._contrib_flat(contribz, E)],
            axis=1,
        )

    def primal_piece(self, params, u_new, u_old):
        if self.backend != "pallas":
            return super().primal_piece(params, u_new, u_old)
        E = params["weight"].shape[0]
        du = (u_new - u_old)[:, :E]
        w2 = params["weight"] ** 2
        return jnp.sum(w2 * jnp.sum(du * du, axis=0))

    def rhs_contribution6(self, params, z, u):
        if self.backend != "pallas":
            return super().rhs_contribution6(params, z, u)
        E = params["weight"].shape[0]
        w2 = params["weight"] ** 2
        zu3 = (z - u).reshape(3, 3, -1)[:, :, :E]
        z3 = z.reshape(3, 3, -1)[:, :, :E]
        czu = jnp.einsum("erk,e,jre->ekj", params["coeff"], w2, zu3)
        cz = jnp.einsum("erk,e,jre->ekj", params["coeff"], w2, z3)
        return jnp.concatenate(
            [czu.reshape(-1, 3), cz.reshape(-1, 3)], axis=1
        )


    def dual_init(self, np_module=np):
        if self.backend != "pallas":
            return super().dual_init(np_module)
        return np_module.zeros((9, self._padded_E()))

    def compute_Dx(self, params, x):
        if self.backend != "pallas":
            return super().compute_Dx(params, x)
        E = params["indices"].shape[0]
        pad = self._padded_E(E) - E
        verts = x[params["indices"]]  # (E,K,3)
        planes = jnp.einsum("ebk,eka->abe", params["coeff"], verts).reshape(9, E)
        if pad:
            planes = jnp.pad(planes, ((0, 0), (0, pad)))
        return planes

    def rhs_contribution(self, params, z, u):
        if self.backend != "pallas":
            return super().rhs_contribution(params, z, u)
        E = params["weight"].shape[0]
        y3 = (z - u).reshape(3, 3, -1)[:, :, :E]  # [a,b,e] = ycan[e,b,a]
        w2 = params["weight"] ** 2
        c = jnp.einsum("erk,e,jre->ekj", params["coeff"], w2, y3)
        return c.reshape(-1, 3)

    def scatter_rhs(self, params, z, u, n_vertices):
        if self.backend != "pallas":
            return super().scatter_rhs(params, z, u, n_vertices)
        from ..ops.segment import coeff_apply_T

        w2 = params["weight"] ** 2
        return coeff_apply_T(
            params["coeff"], params["indices"], w2,
            self._planes_to_canonical(z - u, params["weight"].shape[0]),
            n_vertices,
        )

    def _planes_to_canonical(self, planes, E=None):
        if E is None:
            E = self.n_elements
        return jnp.transpose(planes.reshape(3, 3, -1)[:, :, :E], (2, 1, 0))

    def residual_pieces(self, params, Dx, z, z_prev, n_vertices, dt2):
        if self.backend != "pallas":
            return super().residual_pieces(params, Dx, z, z_prev, n_vertices, dt2)
        from ..ops.segment import coeff_apply_T

        w = params["weight"][:, None, None]
        dxc = self._planes_to_canonical(Dx)
        zc = self._planes_to_canonical(z)
        zpc = self._planes_to_canonical(z_prev)
        r2 = jnp.sum((w * (dxc - zc)) ** 2)
        s = dt2 * coeff_apply_T(
            params["coeff"], params["indices"], params["weight"] ** 2,
            zc - zpc, n_vertices,
        )
        return r2, s


class LinearTetStrain(_PlaneLayoutMixin, ForceBatch):
    """Corotational/ARAP-style tet: project F to the closest rotation and mix
    with k = stiffness * volume (TetForce.cpp:112-153).

    backend: 'xla' (vmapped jnp, default) or 'pallas' (fused VPU kernel,
    ops/pallas/tet_local.py; requires a TPU backend and pads internally to
    the kernel block size).
    """

    R, K = 3, 4

    def __init__(self, tets: np.ndarray, stiffness, weight_scale=1.0,
                 backend="xla"):
        self.tets = np.asarray(tets, dtype=np.int32).reshape(-1, 4)
        self.stiffness = np.broadcast_to(
            np.asarray(stiffness, dtype=np.float64), (len(self.tets),)
        ).copy()
        self.weight_scale = weight_scale  # parsed but unused, like the reference
        if backend not in ("xla", "pallas"):
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend

    @property
    def n_elements(self) -> int:
        return len(self.tets)

    def build(self, x, masses, dt):
        B, vol = build_tet_basis(x, self.tets)
        params = _tet_selector_params(self.tets, B)
        params["weight"] = np.sqrt(self.stiffness) * np.sqrt(vol)
        params["k"] = self.stiffness * vol
        if self.backend == "pallas":
            params["coeff_p"] = self._coeff_planes(params)
        return params, {}

    @property
    def supports_fused_local_rhs(self) -> bool:
        return self.backend == "pallas"

    def fused_local_rhs(self, params, x, u, state, with_z=False):
        """One-kernel ARAP pipeline for the ell/dia global modes
        (ops/pallas/tet_local.arap_local_step_fused). with_z additionally
        returns the dual-residual z-contribution columns ((E*4, 6) flat)."""
        from ..ops.pallas.tet_local import arap_local_step_fused

        E = params["indices"].shape[0]
        pad = self._padded_E(E) - E
        xg = self._gathered_planes(params, x)
        w2 = jnp.pad(params["weight"] ** 2, (0, pad), constant_values=1.0)
        k = jnp.pad(params["k"], (0, pad), constant_values=1.0)
        out = arap_local_step_fused(
            xg, u, params["coeff_p"], w2, k, emit_z=with_z
        )
        if with_z:
            z9, unew9, contrib, contribz = out
            return z9, unew9, state, self._contrib_flat6(contrib, contribz, E)
        z9, unew9, contrib = out
        return z9, unew9, state, self._contrib_flat(contrib, E)

    def _project_xla(self, Dx, u, params, state):
        F = _F_of(Dx + u)
        R = jax.vmap(polar_project)(F)
        k = params["k"][:, None, None]
        w2 = (params["weight"] ** 2)[:, None, None]
        zF = (k * R + w2 * F) / (w2 + k)
        return _rows_of(zF), state

    def project(self, Dx, u, params, state):
        """Canonical-layout entry point (tests/direct API). The pallas branch
        converts to planes around the kernel; the System's hot path uses
        project_with_dual natively instead."""
        if self.backend == "pallas":
            E = Dx.shape[0]
            pad = self._padded_E(E) - E
            z9, _, st = self.project_with_dual(
                self._to_planes(Dx, pad), self._to_planes(u, pad, fill=0.0),
                params, state,
            )
            return self._from_planes(z9, E), st
        return self._project_xla(Dx, u, params, state)

    def project_with_dual(self, Dx, u, params, state):
        """Native layout: planes (9, E_padded) when backend='pallas'
        (produced by compute_Dx, consumed by rhs_contribution)."""
        if self.backend != "pallas":
            z, st = self.project(Dx, u, params, state)
            return z, u + Dx - z, st
        from ..ops.pallas.tet_local import arap_local_step

        E = params["weight"].shape[0]
        pad = self._padded_E(E) - E
        w2 = jnp.pad((params["weight"] ** 2), (0, pad), constant_values=1.0)
        k = jnp.pad(params["k"], (0, pad), constant_values=1.0)
        z9, unew9 = arap_local_step(Dx, u, w2, k)
        return z9, unew9, state


class TetVolume(ForceBatch):
    """Volume preservation: fixed-point projection of singular values so
    det(Sigma) lands in [limit_min, limit_max] (TetForce.cpp:160-210).
    XML force type `volpres` (ForceBuilder.cpp:406-435)."""

    R, K = 3, 4
    FP_ITERS = 4  # reference uses 4 fixed-point iterations (TetForce.cpp:188)

    def __init__(self, tets, stiffness, limit_min=1.0, limit_max=1.0):
        self.tets = np.asarray(tets, dtype=np.int32).reshape(-1, 4)
        E = len(self.tets)
        self.stiffness = np.broadcast_to(
            np.asarray(stiffness, dtype=np.float64), (E,)
        ).copy()
        self.limit_min = np.broadcast_to(np.asarray(limit_min, np.float64), (E,)).copy()
        self.limit_max = np.broadcast_to(np.asarray(limit_max, np.float64), (E,)).copy()

    @property
    def n_elements(self) -> int:
        return len(self.tets)

    def build(self, x, masses, dt):
        B, vol = build_tet_basis(x, self.tets)
        params = _tet_selector_params(self.tets, B)
        params["weight"] = np.sqrt(self.stiffness) * np.sqrt(vol)
        params["k"] = self.stiffness * vol
        params["limit_min"] = self.limit_min
        params["limit_max"] = self.limit_max
        return params, {}

    def project(self, Dx, u, params, state):
        F = _F_of(Dx + u)
        U, s, V = jax.vmap(svd3x3_oriented)(F)
        s2_sign = s[:, 2]
        # plain-SVD singular values are all non-negative
        s0 = jnp.abs(s)

        lmin, lmax = params["limit_min"], params["limit_max"]

        def fp_iter(_, Sd):
            S, d = Sd
            detS = S[:, 0] * S[:, 1] * S[:, 2]
            f = detS - jnp.clip(detS, lmin, lmax)
            g = jnp.stack(
                [S[:, 1] * S[:, 2], S[:, 0] * S[:, 2], S[:, 0] * S[:, 1]], axis=1
            )
            gg = jnp.sum(g * g, axis=1)
            gd = jnp.sum(g * d, axis=1)
            d = -((f - gd) / jnp.where(gg > 0, gg, 1.0))[:, None] * g
            return (s0 + d, d)

        S, _ = jax.lax.fori_loop(0, self.FP_ITERS, fp_iter, (s0, jnp.zeros_like(s0)))
        # reference overwrites S[2] = -1 for inverted elements (TetForce.cpp:196)
        S = jnp.where(s2_sign[:, None] < 0, S.at[:, 2].set(-1.0), S)
        p = _reconstruct_plain(U, V, S, s2_sign)
        k = params["k"][:, None, None]
        w2 = (params["weight"] ** 2)[:, None, None]
        zF = (k * p + w2 * F) / (w2 + k)
        return _rows_of(zF), state


def nh_energy(sigma, mu, lam):
    """Neo-Hookean energy density on singular values (TetForce.cpp:216-225):
    0.5 mu (I1 - log I3 - 3) + (lambda/8) log(I3)^2, I3 = det(Sigma)^2."""
    det = sigma[0] * sigma[1] * sigma[2]
    I1 = jnp.sum(sigma * sigma)
    log_I3 = 2.0 * jnp.log(det)
    return 0.5 * mu * (I1 - log_I3 - 3.0) + 0.125 * lam * log_I3 * log_I3


def stvk_energy(sigma, mu, lam):
    """St. Venant-Kirchhoff on singular values (TetForce.cpp:269-278):
    mu ||E||^2 + lambda/2 tr(E)^2, E = (Sigma^2 - I)/2."""
    E = 0.5 * (sigma * sigma - 1.0)
    return mu * jnp.sum(E * E) + 0.5 * lam * jnp.sum(E) ** 2


def nh_grad_hess(sigma, mu, lam, k, sigma0):
    """Closed-form gradient and Hessian of the NH proximal objective
    (derived from nh_energy; the reference's hand Hessian at
    TetForce.cpp:245-263 is inconsistent with its own gradient — this one
    is the true derivative, validated against AD in tests)."""
    inv = 1.0 / sigma
    logdet = jnp.log(sigma[0] * sigma[1] * sigma[2])
    g = mu * (sigma - inv) + lam * logdet * inv + k * (sigma - sigma0)
    inv2 = inv * inv
    diag = mu * (1.0 + inv2) - lam * logdet * inv2 + k
    H = lam * jnp.outer(inv, inv) + jnp.diag(diag)
    return g, H


def stvk_grad_hess(sigma, mu, lam, k, sigma0):
    """Closed-form gradient and Hessian of the StVK proximal objective
    (gradient matches StVKProx::gradient, TetForce.cpp:289-297)."""
    s2 = jnp.sum(sigma * sigma)
    g = (
        mu * sigma * (sigma * sigma - 1.0)
        + 0.5 * lam * (s2 - 3.0) * sigma
        + k * (sigma - sigma0)
    )
    diag = mu * (3.0 * sigma * sigma - 1.0) + 0.5 * lam * (s2 - 3.0) + k
    H = lam * jnp.outer(sigma, sigma) + jnp.diag(diag)
    return g, H


class HyperElasticTet(_PlaneLayoutMixin, ForceBatch):
    """General hyperelastic tet: oriented SVD -> minimize the proximal
    objective over the 3 singular values -> z = U diag(sigma*) V^T
    (TetForce.cpp:303-364). The reference's per-element L-BFGS with
    More-Thuente line search is replaced by a fixed-iteration safeguarded
    Newton (ops/newton.py) that vmaps over the batch.

    model: 'nh' | 'stvk'. k = min(mu, lambda); w = sqrt(k * volume)
    (TetForce.cpp:306-307).
    """

    R, K = 3, 4
    SIGMA_FLOOR = 1e-8

    def __init__(self, tets, mu, lam, max_iters=10, model="nh", backend="xla"):
        self.tets = np.asarray(tets, dtype=np.int32).reshape(-1, 4)
        E = len(self.tets)
        self.mu = np.broadcast_to(np.asarray(mu, np.float64), (E,)).copy()
        self.lam = np.broadcast_to(np.asarray(lam, np.float64), (E,)).copy()
        self.max_iters = int(max_iters)
        if model not in ("nh", "stvk"):
            raise ValueError(f"unknown hyperelastic model {model!r}")
        self.model = model
        if backend not in ("xla", "pallas"):
            raise ValueError(f"unknown backend {backend!r}")
        if backend == "pallas" and model not in ("nh", "stvk"):
            raise ValueError("pallas backend implements nh and stvk")
        self.backend = backend

    @property
    def n_elements(self) -> int:
        return len(self.tets)

    def build(self, x, masses, dt):
        B, vol = build_tet_basis(x, self.tets)
        params = _tet_selector_params(self.tets, B)
        k = np.minimum(self.mu, self.lam)
        params["weight"] = np.sqrt(k) * np.sqrt(vol)
        params["k"] = k
        params["mu"] = self.mu
        params["lam"] = self.lam
        # warm start persists across steps (TetForce.hpp:145 last_prox_result)
        if self.backend == "pallas":
            state = {"sigma": np.ones((3, self._padded_E()))}
            # selector-coefficient planes for the fully fused local+RHS
            # kernel (loop-invariant; precomputed so the hot loop does zero
            # relayout work)
            params["coeff_p"] = self._coeff_planes(params)
        else:
            state = {"sigma": np.ones((len(self.tets), 3))}
        return params, state

    @property
    def supports_fused_local_rhs(self) -> bool:
        return self.backend == "pallas"

    def fused_local_rhs(self, params, x, u, state, with_z=False):
        """One-kernel per-iteration element pipeline for the ell/dia global
        modes: gathered positions in, (z, u', warm, D^T W^2 (z-u') flat
        contribution rows) out — everything between the vertex gather and the
        incidence gather runs inside ops/pallas/nh_local.nh_local_step_fused."""
        from ..ops.pallas.nh_local import nh_local_step_fused

        E = params["indices"].shape[0]
        pad = self._padded_E(E) - E
        xg = self._gathered_planes(params, x)
        mu = jnp.pad(params["mu"], (0, pad), constant_values=1.0)
        lam = jnp.pad(params["lam"], (0, pad), constant_values=1.0)
        k = jnp.pad(params["k"], (0, pad), constant_values=1.0)
        w2 = jnp.pad(params["weight"] ** 2, (0, pad))
        out = nh_local_step_fused(
            xg, u, state["sigma"], params["coeff_p"], mu, lam, k, w2,
            iters=self.max_iters, model=self.model, emit_z=with_z,
        )
        if with_z:
            z9, unew9, warm_new, contrib, contribz = out
            flat = self._contrib_flat6(contrib, contribz, E)
        else:
            z9, unew9, warm_new, contrib = out
            flat = self._contrib_flat(contrib, E)
        return z9, unew9, {**state, "sigma": warm_new}, flat

    def project(self, Dx, u, params, state):
        if self.backend == "pallas":
            E = Dx.shape[0]
            pad = self._padded_E(E) - E
            z9, _, st = self.project_with_dual(
                self._to_planes(Dx, pad), self._to_planes(u, pad, fill=0.0),
                params, state,
            )
            return self._from_planes(z9, E), st
        F = _F_of(Dx + u)
        U, s, V = jax.vmap(svd3x3_oriented)(F)

        # warm-start guards (TetForce.cpp:339-347): flip a negative third
        # component, ELSE bump a collapsed (all ~0) start to 1e-3 — the
        # bump only applies when the third component was non-negative
        x2 = state["sigma"]
        neg3 = x2[:, 2] < 0.0
        x2 = x2.at[:, 2].set(jnp.abs(x2[:, 2]))
        collapsed = (~neg3) & jnp.all(jnp.abs(x2) < 1e-3, axis=1)
        x2 = jnp.where(collapsed[:, None], 1e-3, x2)

        energy = nh_energy if self.model == "nh" else stvk_energy
        grad_hess = nh_grad_hess if self.model == "nh" else stvk_grad_hess
        iters = self.max_iters

        def solve_one(x0, sigma0, mu, lam, k):
            def objective(sig):
                return energy(sig, mu, lam) + 0.5 * k * jnp.sum((sig - sigma0) ** 2)

            def gfn(sig):
                return grad_hess(sig, mu, lam, k, sigma0)[0]

            def hfn(sig):
                return grad_hess(sig, mu, lam, k, sigma0)[1]

            return newton_minimize(
                objective, x0, iters, floor=self.SIGMA_FLOOR,
                grad_fn=gfn, hess_fn=hfn,
            )

        sigma_star = jax.vmap(solve_one)(
            x2, s, params["mu"], params["lam"], params["k"]
        )
        # z = U diag(sigma*) V^T with the oriented factors (TetForce.cpp:357)
        zF = jnp.einsum("eij,ej,ekj->eik", U, sigma_star, V)
        return _rows_of(zF), {**state, "sigma": sigma_star}

    def project_with_dual(self, Dx, u, params, state):
        """Fused VPU kernel path (ops/pallas/nh_local.py): SVD + Newton +
        reconstruct + dual update in one kernel; warm start carried in the
        kernel's third output. Native layout = planes (9, E_padded) when
        backend='pallas'; the warm start is stored padded (3, E_padded)."""
        if self.backend != "pallas":
            z, st = self.project(Dx, u, params, state)
            return z, u + Dx - z, st
        from ..ops.pallas.nh_local import nh_local_step

        E = params["weight"].shape[0]
        pad = self._padded_E(E) - E
        mu = jnp.pad(params["mu"], (0, pad), constant_values=1.0)
        lam = jnp.pad(params["lam"], (0, pad), constant_values=1.0)
        k = jnp.pad(params["k"], (0, pad), constant_values=1.0)
        z9, unew9, warm_new = nh_local_step(
            Dx, u, state["sigma"], mu, lam, k, iters=self.max_iters,
            model=self.model,
        )
        return z9, unew9, {**state, "sigma": warm_new}
