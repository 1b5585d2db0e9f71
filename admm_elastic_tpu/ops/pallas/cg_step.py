"""Fused CG iteration kernel.

Per-op dispatch overhead dominates the Jacobi-PCG inner loop on the TPU
(measured ~12 ms/iteration of which the actual ELL matvec is < 2 ms —
docs/PERFORMANCE.md). This kernel fuses every vector op of one CG iteration
(both dot products, the three axpys, and the preconditioner apply) into a
single VMEM-resident Pallas call, so one CG iteration = 1 XLA matvec + 1
kernel instead of ~8 dispatched ops.

Layout: CG vectors are kept (3, n) so the long axis is on lanes (n padded to
a multiple of 128 by the caller); the scalar rz rides in a (1,1) SMEM block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cg_update_kernel(x_ref, r_ref, p_ref, rz_ref, Ap_ref, invd_ref,
                      x_out, r_out, p_out, rz_out):
    p = p_ref[:, :]
    Ap = Ap_ref[:, :]
    pAp = jnp.sum(p * Ap)
    rz = rz_ref[0, 0]
    alpha = rz / jnp.where(pAp > 0, pAp, 1.0)
    x = x_ref[:, :] + alpha * p
    r = r_ref[:, :] - alpha * Ap
    z = invd_ref[:, :] * r
    rz_new = jnp.sum(r * z)
    beta = rz_new / jnp.where(rz > 0, rz, 1.0)
    x_out[:, :] = x
    r_out[:, :] = r
    p_out[:, :] = z + beta * p
    rz_out[0, 0] = rz_new


@functools.partial(jax.jit, static_argnames=("interpret",))
def cg_update(x, r, p, rz, Ap, inv_diag, interpret=None):
    """One fused CG vector update. All arrays (3, n); rz (1,1); inv_diag (1, n)
    broadcastable. Returns (x', r', p', rz')."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    inv3 = jnp.broadcast_to(inv_diag, x.shape)
    return pl.pallas_call(
        _cg_update_kernel,
        in_specs=[vspec, vspec, vspec, sspec, vspec, vspec],
        out_specs=[vspec, vspec, vspec, sspec],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((1, 1), x.dtype),
        ],
        interpret=interpret,
    )(x, r, p, rz, Ap, inv3)


def pcg_solve_fixed_fused(A_apply, b, x0, diag, n_iters: int,
                          interpret=None):
    """Fixed-iteration Jacobi-PCG with the fused update kernel.

    A_apply: operator in the standard (n, 3) layout (the fast ELL gather);
    CG state lives in the kernel-friendly (3, n_padded) layout and is
    transposed around the matvec each iteration (cheap relayouts vs the
    ~8 dispatched vector ops the kernel replaces).
    """
    n = b.shape[0]
    pad = (-n) % 128

    def to_t(a):
        return jnp.pad(a.T, ((0, 0), (0, pad)))

    def from_t(at):
        return at[:, :n].T

    bt = to_t(b)
    xt = to_t(x0)
    inv = jnp.pad(1.0 / diag, (0, pad))[None, :]

    rt = bt - to_t(A_apply(x0))
    zt = inv * rt
    pt = zt
    rz = jnp.sum(rt * zt).reshape(1, 1)

    def body(_, carry):
        xt, rt, pt, rz = carry
        Ap = to_t(A_apply(from_t(pt)))
        return cg_update(xt, rt, pt, rz, Ap, inv, interpret=interpret)

    xt, rt, pt, rz = jax.lax.fori_loop(0, n_iters, body, (xt, rt, pt, rz))
    return from_t(xt)


def ell_apply_T(xt, ell_idx, ell_vals, pad):
    """A_hat @ x in the (3, n+pad) layout: gather along lanes + weighted sum.
    ell_idx/ell_vals are the standard (n, K) ELL arrays."""
    n, K = ell_idx.shape
    g = jnp.take(xt[:, : n], ell_idx.reshape(-1), axis=1).reshape(3, n, K)
    out = jnp.einsum("nk,jnk->jn", ell_vals, g)
    return jnp.pad(out, ((0, 0), (0, pad)))
