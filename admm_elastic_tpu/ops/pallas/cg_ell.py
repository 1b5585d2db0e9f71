"""Single-kernel fixed-iteration CG with an in-kernel ELL gather matvec.

The general-mesh counterpart of cg_dia.py: the ELL matrix is stored
column-major ((K, n) planes) so each matvec is K lane-wise
`take_along_axis(x, idx_k, axis=1)` gathers followed by multiply-accumulate,
all inside ONE VMEM-resident kernel.

CURRENT MOSAIC LIMITATION: `tpu.dynamic_gather` only shuffles within a
single 128-lane register, so this kernel compiles only when gather indices
stay within 128-lane windows — real meshes span all of n and the backend
compiler rejects it (verified on v5e). The kernel is correct in interpreter
mode and kept for when Mosaic grows cross-tile gathers; until then,
unstructured meshes should use cg_backend='fused' (per-iteration update
kernel + XLA matvec) and lattice meshes the DIA kernel (cg_dia.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(K, n_iters):
    def kernel(b_ref, x0_ref, invd_ref, idx_ref, val_ref, x_out,
               r_s, p_s, Ap_s):
        # state in scratch refs, in-place matvec accumulation, scalar-only
        # loop carry (keeps the Mosaic VMEM stack small)
        def matvec_into(src_ref, out_ref):
            src = src_ref[:, :]
            for k in range(K):
                idx2 = jnp.broadcast_to(idx_ref[k, :][None, :], src.shape)
                g = jnp.take_along_axis(src, idx2, axis=1)
                if k == 0:
                    out_ref[:, :] = val_ref[0, :] * g
                else:
                    out_ref[:, :] = out_ref[:, :] + val_ref[k, :] * g

        matvec_into(x0_ref, Ap_s)
        r_s[:, :] = b_ref[:, :] - Ap_s[:, :]
        p_s[:, :] = invd_ref[:, :] * r_s[:, :]
        x_out[:, :] = x0_ref[:, :]
        rz0 = jnp.sum(r_s[:, :] * p_s[:, :])

        def body(_, rz):
            matvec_into(p_s, Ap_s)
            pAp = jnp.sum(p_s[:, :] * Ap_s[:, :])
            alpha = rz / jnp.where(pAp > 0, pAp, 1.0)
            x_out[:, :] = x_out[:, :] + alpha * p_s[:, :]
            r_s[:, :] = r_s[:, :] - alpha * Ap_s[:, :]
            z = invd_ref[:, :] * r_s[:, :]
            rz_new = jnp.sum(r_s[:, :] * z)
            beta = rz_new / jnp.where(rz > 0, rz, 1.0)
            p_s[:, :] = z + beta * p_s[:, :]
            return rz_new

        jax.lax.fori_loop(0, n_iters, body, rz0)

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
        scratch_shapes=[
            pltpu.VMEM(bt.shape, bt.dtype),  # r
            pltpu.VMEM(bt.shape, bt.dtype),  # p
            pltpu.VMEM(bt.shape, bt.dtype),  # Ap
        ],
        interpret=interpret,
    )(bt, xt, invd, idx_t, val_t)
    return out[:, :n].T
