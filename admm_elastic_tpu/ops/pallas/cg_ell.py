"""Single-kernel fixed-iteration CG with an in-kernel ELL gather matvec.

The general-mesh counterpart of cg_dia.py: the ELL matrix is stored
column-major ((K, n) planes) so each matvec is K lane-wise
`take_along_axis(x, idx_k, axis=1)` gathers — Mosaic supports lane gathers —
followed by multiply-accumulate, all inside ONE VMEM-resident kernel. The
complete CG state + matrix (~6 MB at n=22k, K=24) lives in VMEM: zero
per-iteration dispatch, zero HBM round-trips per iteration.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(K, n_iters):
    def matvec(p, idxs, vals):
        # p: (8, n) padded-sublane planes (rows 0..2 = xyz); idxs/vals (K, n)
        out = jnp.zeros_like(p)
        for k in range(K):
            idx_row = idxs[k, :]
            idx2 = jnp.broadcast_to(idx_row[None, :], p.shape)
            g = jnp.take_along_axis(p, idx2, axis=1)
            out = out + vals[k, :] * g
        return out

    def kernel(b_ref, x0_ref, invd_ref, idx_ref, val_ref, x_out):
        b = b_ref[:, :]
        x = x0_ref[:, :]
        invd = invd_ref[:, :]
        idxs = idx_ref[:, :]
        vals = val_ref[:, :]

        r = b - matvec(x, idxs, vals)
        z = invd * r
        p = z
        rz = jnp.sum(r * z)

        def body(_, carry):
            x, r, p, rz = carry
            Ap = matvec(p, idxs, vals)
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


@functools.partial(jax.jit, static_argnames=("n_iters", "interpret"))
def cg_ell_solve(b, x0, diag, ell_idx, ell_vals, n_iters, interpret=None):
    """Solve A x = b with n_iters Jacobi-PCG iterations in one kernel.
    b, x0: (n,3); ell_idx/ell_vals: the standard (n, K) ELL arrays."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = b.shape[0]
    K = ell_idx.shape[1]
    pad = (-n) % 128

    def to_t(a):
        return jnp.pad(a.T, ((0, 0), (0, pad)))

    bt = to_t(b)
    xt = to_t(x0)
    invd = jnp.pad(1.0 / diag, (0, pad), constant_values=1.0)[None, :]
    # column-major ELL planes; padded tail rows self-reference with value 0
    idx_t = jnp.pad(ell_idx.T.astype(jnp.int32), ((0, 0), (0, pad)))
    val_t = jnp.pad(ell_vals.T.astype(b.dtype), ((0, 0), (0, pad)))

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_kernel(K, n_iters),
        in_specs=[vspec] * 5,
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct(bt.shape, bt.dtype),
        interpret=interpret,
    )(bt, xt, invd, idx_t, val_t)
    return out[:, :n].T
