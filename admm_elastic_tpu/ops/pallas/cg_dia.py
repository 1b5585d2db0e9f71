"""Single-kernel fixed-iteration CG with a sparse-DIAgonal matvec.

For lattice-numbered meshes A_hat has a few dozen nonzero diagonals
(assemble_A_hat_dia), so the matvec is a static shift-multiply-add — no
gather, no scatter. The complete CG state (x, r, p in (3, n) planes, ~270 KB
each) plus the diagonal values (~3 MB) fit in VMEM, so the ENTIRE solve runs
as ONE kernel: zero per-iteration dispatch, zero HBM round-trips.

This is the structured-mesh fast path; unstructured meshes use the ELL
gather CG (cg_step.py). Offsets and iteration count are compile-time
constants (the shifts become static slices).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(offsets, n, n_pad, n_iters):
    D = len(offsets)

    def matvec(p, dia):
        # p: (3, n_pad) values; dia rows indexed statically
        out = jnp.zeros_like(p)
        for d in range(D):
            off = offsets[d]
            if off == 0:
                shifted = p
            elif off > 0:
                shifted = jnp.pad(p[:, off:], ((0, 0), (0, off)))
            else:
                shifted = jnp.pad(p[:, : n_pad + off], ((0, 0), (-off, 0)))
            out = out + dia[d, :] * shifted
        return out

    def kernel(b_ref, x0_ref, invd_ref, dia_ref, x_out):
        b = b_ref[:, :]
        x = x0_ref[:, :]
        invd = invd_ref[:, :]
        dia = dia_ref[:, :]

        r = b - matvec(x, dia)
        z = invd * r
        p = z
        rz = jnp.sum(r * z)

        def body(_, carry):
            x, r, p, rz = carry
            Ap = matvec(p, dia)
            pAp = jnp.sum(p * Ap)
            alpha = rz / jnp.where(pAp > 0, pAp, 1.0)
            x = x + alpha * p
            r = r - alpha * Ap
            z = invd * r
            rz_new = jnp.sum(r * z)
            beta = rz_new / jnp.where(rz > 0, rz, 1.0)
            p = z + beta * p
            return (x, r, p, rz_new)

        x, r, p, rz = jax.lax.fori_loop(0, n_iters, body, (x, r, p, rz))
        x_out[:, :] = x

    return kernel


@functools.partial(
    jax.jit, static_argnames=("offsets", "n_iters", "interpret")
)
def cg_dia_solve(b, x0, diag, dia_vals, offsets, n_iters, interpret=None):
    """Solve A x = b with n_iters Jacobi-PCG iterations entirely in one
    kernel. b, x0: (n, 3); dia_vals: (D, n); offsets: static tuple.
    Out-of-range diagonal entries must be zero (assemble_A_hat_dia ensures
    this), so shifted pads contribute nothing."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = b.shape[0]
    pad = (-n) % 128

    def to_t(a):
        return jnp.pad(a.T, ((0, 0), (0, pad)))

    bt = to_t(b)
    xt = to_t(x0)
    # padded tail: A acts as identity (inv_diag 1, dia 0) so CG leaves it at
    # b=0 harmlessly
    invd = jnp.pad(1.0 / diag, (0, pad), constant_values=1.0)[None, :]
    dia = jnp.pad(dia_vals, ((0, 0), (0, pad)))

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_kernel(offsets, n, n + pad, n_iters),
        in_specs=[vspec, vspec, vspec, vspec],
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct(bt.shape, bt.dtype),
        interpret=interpret,
    )(bt, xt, invd, dia)
    return out[:, :n].T
