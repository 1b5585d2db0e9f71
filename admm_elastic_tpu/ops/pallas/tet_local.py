"""Fused Pallas kernel for the corotational (ARAP) tet local step.

One kernel evaluates, for a block of elements living entirely in VMEM:

    F   = Dx + u                       (deformation gradient per element)
    R   = closest proper rotation to F (Jacobi eigensolver on F^T F +
                                        safe orthonormalization — the same
                                        branch-free math as ops/svd.py,
                                        hand-laid-out on (8,128) VPU blocks)
    z   = (k R + w^2 F) / (w^2 + k)
    u'  = u + Dx - z

avoiding every HBM round-trip of the intermediates (F, A, V, U are ~30
floats/element that XLA would otherwise spill between kernels).

Data layout: element quantities are structure-of-arrays — Dx/u/z as 9 planes
of shape (E,), stored (9, Ep) with Ep padded to a multiple of the block; the
kernel processes (1, BLOCK) rows of each plane per grid step with all 9
planes resident. Scalars w2/k are (Ep,) planes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SWEEPS = 6
BLOCK = 1024  # elements per grid step (8 sublane rows x 128 lanes)


def _jacobi_cs(app, aqq, apq, eps):
    tau = (aqq - app) / (2.0 * jnp.where(jnp.abs(apq) < eps, 1.0, apq))
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(jnp.abs(apq) < eps, 0.0, t)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    return c, t * c


def _polar_rotation(f, eps):
    """f: list of 9 (block,) arrays, row-major F[r][c] = f[3*r+c].
    Returns list of 9 arrays for R = U V^T (closest proper rotation)."""
    # A = F^T F (symmetric): a_rc = sum_k F[k][r] * F[k][c]
    def col(c):
        return (f[c], f[3 + c], f[6 + c])

    def dotc(ca, cb):
        a, b = col(ca), col(cb)
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    a00, a11, a22 = dotc(0, 0), dotc(1, 1), dotc(2, 2)
    a01, a02, a12 = dotc(0, 1), dotc(0, 2), dotc(1, 2)
    scale = jnp.maximum(
        jnp.maximum(jnp.maximum(jnp.abs(a00), jnp.abs(a11)), jnp.abs(a22)),
        1.0,
    )
    a00, a11, a22 = a00 / scale, a11 / scale, a22 / scale
    a01, a02, a12 = a01 / scale, a02 / scale, a12 / scale

    one = jnp.ones_like(a00)
    zero = jnp.zeros_like(a00)
    v = [[one, zero, zero], [zero, one, zero], [zero, zero, one]]

    def rot_cols(p, q, c, s):
        for r in range(3):
            vp, vq = v[r][p], v[r][q]
            v[r][p] = c * vp - s * vq
            v[r][q] = s * vp + c * vq

    for _ in range(_SWEEPS):
        c, s = _jacobi_cs(a00, a11, a01, eps)
        n00 = c * c * a00 - 2 * s * c * a01 + s * s * a11
        n11 = s * s * a00 + 2 * s * c * a01 + c * c * a11
        n02 = c * a02 - s * a12
        n12 = s * a02 + c * a12
        a00, a11, a01, a02, a12 = n00, n11, zero, n02, n12
        rot_cols(0, 1, c, s)
        c, s = _jacobi_cs(a00, a22, a02, eps)
        n00 = c * c * a00 - 2 * s * c * a02 + s * s * a22
        n22 = s * s * a00 + 2 * s * c * a02 + c * c * a22
        n01 = c * a01 - s * a12
        n12 = s * a01 + c * a12
        a00, a22, a02, a01, a12 = n00, n22, zero, n01, n12
        rot_cols(0, 2, c, s)
        c, s = _jacobi_cs(a11, a22, a12, eps)
        n11 = c * c * a11 - 2 * s * c * a12 + s * s * a22
        n22 = s * s * a11 + 2 * s * c * a12 + c * c * a22
        n01 = c * a01 - s * a02
        n02 = s * a01 + c * a02
        a11, a22, a12, a01, a02 = n11, n22, zero, n01, n02
        rot_cols(1, 2, c, s)

    # sort eigenvalues descending (sorting network over (value, column) pairs)
    w = [a00, a11, a22]
    cols = [[v[0][c], v[1][c], v[2][c]] for c in range(3)]

    def cswap(i, j):
        swap = w[i] < w[j]
        w[i], w[j] = jnp.where(swap, w[j], w[i]), jnp.where(swap, w[i], w[j])
        for r in range(3):
            ci, cj = cols[i][r], cols[j][r]
            cols[i][r] = jnp.where(swap, cj, ci)
            cols[j][r] = jnp.where(swap, ci, cj)

    cswap(0, 1)
    cswap(1, 2)
    cswap(0, 1)

    # proper rotation: flip third column if det(V) < 0
    det = (
        cols[0][0] * (cols[1][1] * cols[2][2] - cols[1][2] * cols[2][1])
        - cols[1][0] * (cols[0][1] * cols[2][2] - cols[0][2] * cols[2][1])
        + cols[2][0] * (cols[0][1] * cols[1][2] - cols[0][2] * cols[1][1])
    )
    sflip = jnp.where(det < 0, -1.0, 1.0)
    for r in range(3):
        cols[2][r] = cols[2][r] * sflip

    # B = F V: b_kc = sum_r F[k][r] * V[r][c]
    def matvec(ci):
        vc = cols[ci]
        return [
            f[0] * vc[0] + f[1] * vc[1] + f[2] * vc[2],
            f[3] * vc[0] + f[4] * vc[1] + f[5] * vc[2],
            f[6] * vc[0] + f[7] * vc[1] + f[8] * vc[2],
        ]

    b0, b1 = matvec(0), matvec(1)

    def norm3(x):
        return jnp.sqrt(x[0] * x[0] + x[1] * x[1] + x[2] * x[2])

    n0 = norm3(b0)
    tol = eps * 16.0 * (jnp.sqrt(jnp.maximum(w[0] * scale, 0.0)) + eps)
    ok0 = n0 > tol
    inv0 = 1.0 / jnp.where(ok0, n0, 1.0)
    u0 = [jnp.where(ok0, b0[k] * inv0, 1.0 if k == 0 else 0.0) for k in range(3)]

    d01 = u0[0] * b1[0] + u0[1] * b1[1] + u0[2] * b1[2]
    p1 = [b1[k] - d01 * u0[k] for k in range(3)]
    n1 = norm3(p1)
    ok1 = n1 > tol
    inv1 = 1.0 / jnp.where(ok1, n1, 1.0)
    # fallback: axis least aligned with u0, projected + normalized
    au = [jnp.abs(u0[0]), jnp.abs(u0[1]), jnp.abs(u0[2])]
    use_x = (au[0] <= au[1]) & (au[0] <= au[2])
    use_y = (~use_x) & (au[1] <= au[2])
    ax = [
        jnp.where(use_x, 1.0, 0.0),
        jnp.where(use_y, 1.0, 0.0),
        jnp.where(use_x | use_y, 0.0, 1.0),
    ]
    dax = ax[0] * u0[0] + ax[1] * u0[1] + ax[2] * u0[2]
    fb = [ax[k] - dax * u0[k] for k in range(3)]
    fbn = norm3(fb)
    fb = [fb[k] / jnp.where(fbn > 0, fbn, 1.0) for k in range(3)]
    u1 = [jnp.where(ok1, p1[k] * inv1, fb[k]) for k in range(3)]

    u2 = [
        u0[1] * u1[2] - u0[2] * u1[1],
        u0[2] * u1[0] - u0[0] * u1[2],
        u0[0] * u1[1] - u0[1] * u1[0],
    ]
    U = [u0, u1, u2]  # U[c][k] = column c, component k

    # R = U V^T: R_{r,c} = sum_j U[j][r] * V[c][j]; emitted row-major so the
    # plane order matches F (plane 3r+c = R_{r,c})
    R = []
    for r in range(3):
        for c in range(3):
            R.append(
                U[0][r] * cols[0][c] + U[1][r] * cols[1][c] + U[2][r] * cols[2][c]
            )
    return R


def _arap_kernel(dx_ref, u_ref, w2_ref, k_ref, z_ref, unew_ref):
    dx = [dx_ref[p, :] for p in range(9)]
    uu = [u_ref[p, :] for p in range(9)]
    f = [dx[p] + uu[p] for p in range(9)]
    eps = jnp.asarray(jnp.finfo(dx[0].dtype).eps, dx[0].dtype)
    R = _polar_rotation(f, eps)
    w2 = w2_ref[0, :]
    k = k_ref[0, :]
    denom = 1.0 / (w2 + k)
    for p in range(9):
        z = (k * R[p] + w2 * f[p]) * denom
        z_ref[p, :] = z
        unew_ref[p, :] = uu[p] + dx[p] - z


def _make_arap_fused_kernel(emit_z):
    """ARAP local step with in-kernel selector apply and RHS contribution
    (same plane conventions as nh_local._make_hyper_fused_kernel). When
    emit_z, a second contribution block w2 * D^T z is emitted (the
    dual-residual piece: s_i = dt^2 (T z_i - T z_{i-1}))."""

    def kernel(xg_ref, u_ref, cp_ref, w2_ref, k_ref,
               z_ref, unew_ref, contrib_ref, *maybe_cz):
        xg = [xg_ref[p, :] for p in range(12)]
        cp = [cp_ref[p, :] for p in range(12)]
        dx = []
        for a in range(3):
            for b in range(3):
                acc = cp[4 * b] * xg[a]
                for kk in range(1, 4):
                    acc = acc + cp[4 * b + kk] * xg[3 * kk + a]
                dx.append(acc)
        uu = [u_ref[p, :] for p in range(9)]
        f = [dx[p] + uu[p] for p in range(9)]
        eps = jnp.asarray(jnp.finfo(dx[0].dtype).eps, dx[0].dtype)
        R = _polar_rotation(f, eps)
        w2 = w2_ref[0, :]
        k = k_ref[0, :]
        denom = 1.0 / (w2 + k)
        zu = [None] * 9
        zz = [None] * 9
        for p in range(9):
            z = (k * R[p] + w2 * f[p]) * denom
            un = uu[p] + dx[p] - z
            z_ref[p, :] = z
            unew_ref[p, :] = un
            zu[p] = z - un
            zz[p] = z
        for kk in range(4):
            for j in range(3):
                acc = cp[kk] * zu[3 * j]
                for r in range(1, 3):
                    acc = acc + cp[4 * r + kk] * zu[3 * j + r]
                contrib_ref[3 * kk + j, :] = w2 * acc
                if emit_z:
                    accz = cp[kk] * zz[3 * j]
                    for r in range(1, 3):
                        accz = accz + cp[4 * r + kk] * zz[3 * j + r]
                    maybe_cz[0][3 * kk + j, :] = w2 * accz

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "emit_z"))
def arap_local_step_fused(xg12, u9, cp12, w2, k, interpret=None, emit_z=False):
    """Fully fused ARAP local step + RHS contribution. xg12/cp12: (12,E)
    gathered-position and selector-coefficient planes; u9: (9,E); w2/k: (E,).
    Returns (z9, u9_new, contrib12) or, with emit_z, (z9, u9_new, contrib12,
    contribz12)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    E = xg12.shape[1]
    grid = (E // BLOCK,)
    p12 = pl.BlockSpec((12, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
    p9 = pl.BlockSpec((9, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
    p1 = pl.BlockSpec((1, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_specs = [p9, p9, p12]
    out_shape = [
        jax.ShapeDtypeStruct(u9.shape, u9.dtype),
        jax.ShapeDtypeStruct(u9.shape, u9.dtype),
        jax.ShapeDtypeStruct(xg12.shape, xg12.dtype),
    ]
    if emit_z:
        out_specs.append(p12)
        out_shape.append(jax.ShapeDtypeStruct(xg12.shape, xg12.dtype))
    out = pl.pallas_call(
        _make_arap_fused_kernel(emit_z),
        grid=grid,
        in_specs=[p12, p9, p12, p1, p1],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(xg12, u9, cp12, w2.reshape(1, E), k.reshape(1, E))
    return tuple(out)


@functools.partial(jax.jit, static_argnames=("interpret",))
def arap_local_step(dx9, u9, w2, k, interpret=None):
    """Fused ARAP local step.

    dx9, u9: (9, E) planes (E a multiple of BLOCK); w2, k: (E,).
    Returns (z9, u9_new) with the same layout.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    E = dx9.shape[1]
    grid = (E // BLOCK,)
    plane_spec = pl.BlockSpec((9, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
    scal_spec = pl.BlockSpec((1, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
    z9, unew = pl.pallas_call(
        _arap_kernel,
        grid=grid,
        in_specs=[plane_spec, plane_spec, scal_spec, scal_spec],
        out_specs=[plane_spec, plane_spec],
        out_shape=[
            jax.ShapeDtypeStruct(dx9.shape, dx9.dtype),
            jax.ShapeDtypeStruct(dx9.shape, dx9.dtype),
        ],
        interpret=interpret,
    )(dx9, u9, w2.reshape(1, E), k.reshape(1, E))
    return z9, unew


def arap_local_step_reference(dx9, u9, w2, k):
    """jnp reference with identical layout, for validation."""
    from ..svd import polar_project

    E = dx9.shape[1]
    F = jnp.transpose(dx9 + u9, (1, 0)).reshape(E, 3, 3)
    R = jax.vmap(polar_project)(F)
    w2c = w2[:, None, None]
    kc = k[:, None, None]
    z = (kc * R + w2c * F) / (w2c + kc)
    z9 = z.reshape(E, 9).T
    unew = u9 + dx9 - z9
    return z9, unew
