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
    W = n_pad

    def kernel(b_ref, x0_ref, invd_ref, dia_ref, x_out, r_s, p_s, Ap_s):
        # state lives in scratch refs; the CG loop carries only the scalar rz.
        # The matvec accumulates IN PLACE into Ap_s with static-slice adds —
        # one live temporary instead of D padded copies (VMEM stack budget).
        _center = offsets.index(0)

        def matvec_into(src_ref, out_ref):
            out_ref[:, :] = dia_ref[_center, :] * src_ref[:, :]
            for d in range(D):
                off = offsets[d]
                if off == 0:
                    continue
                if off > 0:
                    out_ref[:, : W - off] = (
                        out_ref[:, : W - off]
                        + dia_ref[d, : W - off] * src_ref[:, off:]
                    )
                else:
                    out_ref[:, -off:] = (
                        out_ref[:, -off:]
                        + dia_ref[d, -off:] * src_ref[:, : W + off]
                    )

        # r = b - A x0 ; p = z = invd * r
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
        scratch_shapes=[
            pltpu.VMEM(bt.shape, bt.dtype),  # r
            pltpu.VMEM(bt.shape, bt.dtype),  # p
            pltpu.VMEM(bt.shape, bt.dtype),  # Ap
        ],
        interpret=interpret,
    )(bt, xt, invd, dia)
    return out[:, :n].T
