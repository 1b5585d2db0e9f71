"""Fused Pallas kernel for the cloth (triangle strain) local step.

One kernel per element block computes (TriangleForce.cpp:79-113 semantics):

    F      = Dx + u                    (3x2 deformation gradient)
    U,s,V  = SVD(F)                    (closed-form 2x2 eig of F^T F +
                                        safe orthonormalization of F V)
    T      = U V^T                     (in-plane rotation projection)
    z      = (k T + w^2 F) / (w^2 + k)
    z      = strain-limit(z)           (column norms clamped to
                                        [limit_min, limit_max], max(l,1e-6))
    u'     = u + Dx - z = F - z

entirely in VMEM with lane-parallel arithmetic. Plane layout: 6 planes
(6, E) with plane 2a+b = F_{a,b}; selector coefficients cp[3b+k, e] =
B[e,k,b]; gathered positions xg[3k+a, e] = x[face[e,k], a]. The fused
variant additionally applies the selector in-kernel and emits the
D^T W^2 (z-u') contribution rows (and optionally the D^T W^2 z rows used
for dual residuals), mirroring ops/pallas/nh_local.py for tets.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tet_local import BLOCK


def _svd32(f, eps):
    """f: 6 planes of F (3x2, plane 2a+b). Returns (U cols, V cols, s):
    U = [u0,u1] lists of 3 lane-arrays, V = [v0,v1] lists of 2, s=(s0,s1)
    with s0 >= s1 >= 0 (plain SVD — no orientation handling needed for a
    3x2 factor; T = U V^T is the closest in-plane rotation)."""

    def col(b):
        return (f[b], f[2 + b], f[4 + b])

    def dotc(ba, bb):
        a, b = col(ba), col(bb)
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    a00, a11, a01 = dotc(0, 0), dotc(1, 1), dotc(0, 1)
    # closed-form symmetric 2x2 eigendecomposition
    tr = a00 + a11
    diff = a00 - a11
    rad = jnp.sqrt(diff * diff + 4.0 * a01 * a01)
    w0 = 0.5 * (tr + rad)
    w1 = 0.5 * (tr - rad)
    # eigenvector for w0: (A - w0 I) v = 0 gives two candidate forms
    # v = (w0 - a11, a01) (row 2) or (a01, w0 - a00) (row 1); take the
    # better-conditioned one, fall back to (1,0) for isotropic A
    c1x, c1y = w0 - a11, a01
    c2x, c2y = a01, w0 - a00
    n1 = c1x * c1x + c1y * c1y
    n2 = c2x * c2x + c2y * c2y
    use1 = n1 >= n2
    vx = jnp.where(use1, c1x, c2x)
    vy = jnp.where(use1, c1y, c2y)
    nn = jnp.sqrt(jnp.maximum(n1, n2))
    ok = nn > eps * jnp.maximum(tr, 1.0)
    inv = 1.0 / jnp.where(ok, nn, 1.0)
    c = jnp.where(ok, vx * inv, 1.0)
    s_ = jnp.where(ok, vy * inv, 0.0)
    v0 = [c, s_]
    v1 = [-s_, c]

    s0 = jnp.sqrt(jnp.maximum(w0, 0.0))
    s1 = jnp.sqrt(jnp.maximum(w1, 0.0))

    def matvec(v):
        return [
            f[0] * v[0] + f[1] * v[1],
            f[2] * v[0] + f[3] * v[1],
            f[4] * v[0] + f[5] * v[1],
        ]

    b0 = matvec(v0)
    b1 = matvec(v1)

    def norm3(x):
        return jnp.sqrt(x[0] * x[0] + x[1] * x[1] + x[2] * x[2])

    tol = eps * 16.0 * (s0 + eps)
    n0 = norm3(b0)
    ok0 = n0 > tol
    inv0 = 1.0 / jnp.where(ok0, n0, 1.0)
    u0 = [jnp.where(ok0, b0[a] * inv0, 1.0 if a == 0 else 0.0)
          for a in range(3)]

    d01 = u0[0] * b1[0] + u0[1] * b1[1] + u0[2] * b1[2]
    p1 = [b1[a] - d01 * u0[a] for a in range(3)]
    n1 = norm3(p1)
    ok1 = n1 > tol
    inv1 = 1.0 / jnp.where(ok1, n1, 1.0)
    # fallback axis least aligned with u0
    au = [jnp.abs(u0[0]), jnp.abs(u0[1]), jnp.abs(u0[2])]
    use_x = (au[0] <= au[1]) & (au[0] <= au[2])
    use_y = (~use_x) & (au[1] <= au[2])
    ax = [
        jnp.where(use_x, 1.0, 0.0),
        jnp.where(use_y, 1.0, 0.0),
        jnp.where(use_x | use_y, 0.0, 1.0),
    ]
    dax = ax[0] * u0[0] + ax[1] * u0[1] + ax[2] * u0[2]
    fb = [ax[a] - dax * u0[a] for a in range(3)]
    fbn = norm3(fb)
    fb = [fb[a] / jnp.where(fbn > 0, fbn, 1.0) for a in range(3)]
    u1 = [jnp.where(ok1, p1[a] * inv1, fb[a]) for a in range(3)]

    return [u0, u1], [v0, v1], (s0, s1)


def _tri_body(f, w2, k, lmin, lmax, limiting):
    """Shared projection: F planes -> z planes (strain-limited mix)."""
    eps = jnp.asarray(jnp.finfo(f[0].dtype).eps, f[0].dtype)
    U, V, _ = _svd32(f, eps)
    denom = 1.0 / (w2 + k)
    z = [None] * 6
    for a in range(3):
        for b in range(2):
            t = U[0][a] * V[0][b] + U[1][a] * V[1][b]
            z[2 * a + b] = (k * t + w2 * f[2 * a + b]) * denom
    if limiting:
        # clamp column norms into [lmin, lmax] (TriangleForce.cpp:100-107)
        for b in range(2):
            l = jnp.sqrt(
                z[b] * z[b] + z[2 + b] * z[2 + b] + z[4 + b] * z[4 + b]
            )
            safe = jnp.maximum(l, 1e-6)
            scale = jnp.where(
                l < lmin, lmin / safe, jnp.where(l > lmax, lmax / safe, 1.0)
            )
            for a in range(3):
                z[2 * a + b] = z[2 * a + b] * scale
    return z


def _make_tri_kernel(limiting):
    def kernel(dx_ref, u_ref, w2_ref, k_ref, lmin_ref, lmax_ref,
               z_ref, unew_ref):
        dx = [dx_ref[p, :] for p in range(6)]
        uu = [u_ref[p, :] for p in range(6)]
        f = [dx[p] + uu[p] for p in range(6)]
        z = _tri_body(f, w2_ref[0, :], k_ref[0, :], lmin_ref[0, :],
                      lmax_ref[0, :], limiting)
        for p in range(6):
            z_ref[p, :] = z[p]
            unew_ref[p, :] = f[p] - z[p]

    return kernel


def _make_tri_fused_kernel(limiting, emit_z):
    def kernel(xg_ref, u_ref, cp_ref, w2_ref, k_ref, lmin_ref, lmax_ref,
               z_ref, unew_ref, contrib_ref, *maybe_cz):
        xg = [xg_ref[p, :] for p in range(9)]
        cp = [cp_ref[p, :] for p in range(6)]
        # dx[2a+b] = F_{a,b} = sum_k cp[3b+k] * xg[3k+a]
        dx = []
        for a in range(3):
            for b in range(2):
                acc = cp[3 * b] * xg[a]
                for kk in range(1, 3):
                    acc = acc + cp[3 * b + kk] * xg[3 * kk + a]
                dx.append(acc)
        uu = [u_ref[p, :] for p in range(6)]
        f = [dx[p] + uu[p] for p in range(6)]
        w2 = w2_ref[0, :]
        z = _tri_body(f, w2, k_ref[0, :], lmin_ref[0, :], lmax_ref[0, :],
                      limiting)
        zu = [None] * 6
        for p in range(6):
            un = f[p] - z[p]
            z_ref[p, :] = z[p]
            unew_ref[p, :] = un
            zu[p] = z[p] - un  # = 2z - F
        # contrib[3k+j] = w2 * sum_r cp[3r+k] * (z-u')[2j+r]
        for kk in range(3):
            for j in range(3):
                acc = cp[kk] * zu[2 * j]
                acc = acc + cp[3 + kk] * zu[2 * j + 1]
                contrib_ref[3 * kk + j, :] = w2 * acc
                if emit_z:
                    accz = cp[kk] * z[2 * j] + cp[3 + kk] * z[2 * j + 1]
                    maybe_cz[0][3 * kk + j, :] = w2 * accz

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "limiting"))
def tri_local_step(dx6, u6, w2, k, lmin, lmax, interpret=None,
                   limiting=True):
    """Fused triangle-strain local step. dx6/u6: (6,E); w2/k/lmin/lmax:
    (E,). E must be a multiple of BLOCK. Returns (z6, u6_new)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    E = dx6.shape[1]
    grid = (E // BLOCK,)
    p6 = pl.BlockSpec((6, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
    p1 = pl.BlockSpec((1, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
    z6, unew = pl.pallas_call(
        _make_tri_kernel(limiting),
        grid=grid,
        in_specs=[p6, p6, p1, p1, p1, p1],
        out_specs=[p6, p6],
        out_shape=[
            jax.ShapeDtypeStruct(dx6.shape, dx6.dtype),
            jax.ShapeDtypeStruct(dx6.shape, dx6.dtype),
        ],
        interpret=interpret,
    )(dx6, u6, w2.reshape(1, E), k.reshape(1, E), lmin.reshape(1, E),
      lmax.reshape(1, E))
    return z6, unew


@functools.partial(
    jax.jit, static_argnames=("interpret", "limiting", "emit_z")
)
def tri_local_step_fused(xg9, u6, cp6, w2, k, lmin, lmax, interpret=None,
                         limiting=True, emit_z=False):
    """Fully fused local step + RHS contribution. xg9/contrib: (9,E);
    u6/cp6: (6,E); scalars (E,). Returns (z6, u6_new, contrib9) or with
    emit_z (z6, u6_new, contrib9, contribz9)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    E = xg9.shape[1]
    grid = (E // BLOCK,)
    p9 = pl.BlockSpec((9, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
    p6 = pl.BlockSpec((6, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
    p1 = pl.BlockSpec((1, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_specs = [p6, p6, p9]
    out_shape = [
        jax.ShapeDtypeStruct(u6.shape, u6.dtype),
        jax.ShapeDtypeStruct(u6.shape, u6.dtype),
        jax.ShapeDtypeStruct(xg9.shape, xg9.dtype),
    ]
    if emit_z:
        out_specs.append(p9)
        out_shape.append(jax.ShapeDtypeStruct(xg9.shape, xg9.dtype))
    out = pl.pallas_call(
        _make_tri_fused_kernel(limiting, emit_z),
        grid=grid,
        in_specs=[p9, p6, p6, p1, p1, p1, p1],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(xg9, u6, cp6, w2.reshape(1, E), k.reshape(1, E),
      lmin.reshape(1, E), lmax.reshape(1, E))
    return tuple(out)
