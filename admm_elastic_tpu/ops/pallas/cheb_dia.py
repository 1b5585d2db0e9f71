"""Single-kernel Chebyshev solve with a sparse-DIAgonal matvec.

The distributable sibling of cg_dia.py: the CG kernel's per-iteration
inner products make it single-device by construction, while the
Chebyshev recurrence (parallel/cheb.py) has NO reductions — its
per-iteration scalars are host-precomputed from the spectral bounds and
ride in SMEM. The whole chunk of iterations runs as ONE pallas launch
with every operand VMEM-resident, which is what removes the ~31 us/
iteration JAX-level dispatch cost measured on the sharded steppers
(round-5 chip measurement: cg75 adds 15.4 ms/step over cg25 at 100k
tets purely in tiny-op dispatch).

Sharded use (parallel/banded_spmd.py): each device launches this kernel
on its halo-extended slab. A matvec corrupts the outermost `reach` rows
of the halo per iteration, so a chunk of `c` iterations needs the d/z
halos valid to depth c*reach on entry — the stepper sizes its halo and
chunk count accordingly and re-exchanges between chunks. At D=1 the
slab IS the domain (zero-fill edges are the true boundary, matching
_shifted semantics in the reference mega kernel) and one chunk runs the
entire solve.

State (x, z, d) is threaded through chunk launches; `first` chunks
initialize z = D^{-1}(b - A x), d = z/theta in-kernel; `last` chunks
apply the final position update.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .banded_step import _shifted


def _make_kernel(offsets, Lr, n_it, first, last, inv_theta, interpret):
    """(Lr, 128) plane layout with the mega kernel's `_shifted`
    flat-index shifts (roll_lanes + row shifts — the Mosaic-native
    form; the earlier (3, W) lane-major layout paid a relayout per
    shifted operand). State refs are (3*Lr, 128), one axis block per
    row band."""
    D = len(offsets)

    def kernel(b_ref, x0_ref, z0_ref, d0_ref, invd_ref, dia_ref,
               c1_ref, c2_ref, x_out, z_out, d_out):
        def rows(a):
            return slice(a * Lr, (a + 1) * Lr)

        def matvec(src_ref, a):
            xa = src_ref[rows(a), :]
            acc = None
            for dd in range(D):
                t = (dia_ref[rows(dd), :]
                     * _shifted(xa, offsets[dd], Lr, interpret))
                acc = t if acc is None else acc + t
            return acc

        x_out[:, :] = x0_ref[:, :]
        if first:
            for a in range(3):
                z_out[rows(a), :] = invd_ref[:, :] * (
                    b_ref[rows(a), :] - matvec(x0_ref, a))
            d_out[:, :] = inv_theta * z_out[:, :]
        else:
            z_out[:, :] = z0_ref[:, :]
            d_out[:, :] = d0_ref[:, :]

        def body(i, _):
            x_out[:, :] = x_out[:, :] + d_out[:, :]
            cc1 = c1_ref[i]
            cc2 = c2_ref[i]
            for a in range(3):
                z_out[rows(a), :] = (z_out[rows(a), :]
                                     - invd_ref[:, :] * matvec(d_out, a))
            d_out[:, :] = cc1 * d_out[:, :] + cc2 * z_out[:, :]
            return 0

        jax.lax.fori_loop(0, n_it, body, 0)
        if last:
            x_out[:, :] = x_out[:, :] + d_out[:, :]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "n_it", "first", "last", "inv_theta",
                     "interpret"),
)
def cheb_dia_chunk(b, x, z, d, invd, dia, c1, c2, *, offsets, n_it,
                   first, last, inv_theta, interpret=None):
    """Run `n_it` full Chebyshev iterations (x+=d; z-=D^{-1}A d;
    d=c1[i]d+c2[i]z) in one kernel.

    b, x, z, d: (3*Lr, 128) planes (axis blocks of Lr rows); invd:
    (Lr, 128); dia: (n_dia*Lr, 128); c1, c2: (n_it,) host-precomputed
    coefficients for THIS chunk (slice of the full schedule). first:
    initialize z/d from b/x (z, d inputs ignored); last: apply the
    trailing position update. Returns (x, z, d)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if c1.shape[0] == 0:  # init-only launch: keep SMEM shapes non-empty
        c1 = jnp.zeros((1,), b.dtype)
        c2 = jnp.zeros((1,), b.dtype)
    Lr = b.shape[0] // 3
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    shp = jax.ShapeDtypeStruct(b.shape, b.dtype)
    x, z, d = pl.pallas_call(
        _make_kernel(offsets, Lr, n_it, first, last, inv_theta,
                     interpret),
        in_specs=[vspec] * 6 + [sspec, sspec],
        out_specs=[vspec, vspec, vspec],
        out_shape=[shp, shp, shp],
        interpret=interpret,
    )(b, x, z, d, invd, dia, c1, c2)
    return x, z, d
