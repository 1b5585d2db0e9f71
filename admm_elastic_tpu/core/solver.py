"""Global-step linear solvers.

The reference pre-factors the SPD system  A = M + dt^2 D^T W^2 D  with a
sequential sparse SimplicialLDLT and backsolves every ADMM iteration
(System.cpp:136-140,62). Two structural facts make the TPU replacement both
faster and more flexible:

  1. D never mixes xyz components (see ops/segment.py), so A = A_hat (x) I_3
     with A_hat only (n,n): the solve is A_hat X = B with X, B (n,3).
  2. Per ADMM iteration, x changes little — warm-starting makes iterative
     solves cheap.

Two modes:
  * 'dense'  — precompute A_hat^{-1} once on the host; every global step is a
    single (n,n)@(n,3) matmul on the MXU. Exact (matches LDLT to roundoff),
    ideal for n up to a few thousand. Weight changes re-invert on the host
    (the reference pays the same re-factorization, System.cpp:159-179).
  * 'cg'     — matrix-free Jacobi-preconditioned CG; A-apply is
    gather/einsum/segment-sum over element batches. Scales to millions of
    nodes and makes weight changes free. Fixed max iterations with early
    exit via residual tolerance inside lax.while_loop.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ..ops.segment import coeff_apply, coeff_apply_T, coeff_diag


def _assemble_A_hat_csr(n, masses, dt, force_params):
    """Host-side sparse assembly of A_hat = diag(m) + dt^2 sum_t C^T W^2 C."""
    import scipy.sparse as sp

    dt2 = dt * dt
    rows_all, cols_all, vals_all = [], [], []
    for p in force_params.values():
        C = np.asarray(p["coeff"], dtype=np.float64)
        idx = np.asarray(p["indices"], dtype=np.int64)
        w2 = np.asarray(p["weight"], dtype=np.float64) ** 2
        Me = np.einsum("erk,erl->ekl", C, C) * w2[:, None, None] * dt2
        K = idx.shape[1]
        rows_all.append(np.repeat(idx[:, :, None], K, axis=2).ravel())
        cols_all.append(np.repeat(idx[:, None, :], K, axis=1).ravel())
        vals_all.append(Me.ravel())
    if rows_all:
        A = sp.coo_matrix(
            (
                np.concatenate(vals_all),
                (np.concatenate(rows_all), np.concatenate(cols_all)),
            ),
            shape=(n, n),
        ).tocsr()
        A.sum_duplicates()
    else:
        A = sp.csr_matrix((n, n))
    A = A + sp.diags(np.asarray(masses, dtype=np.float64))
    # keep structural zeros: the sparsity pattern is determined by the
    # constraint TOPOLOGY, not the current weights, so runtime weight edits
    # (poordillo release: weight -> 0, System.cpp:159-179) never change the
    # ELL/DIA pattern and recompute_weights() is a pure value refresh
    return A


def assemble_A_hat(n, masses, dt, force_params):
    """Dense A_hat (via sparse assembly; dense only at materialization)."""
    return _assemble_A_hat_csr(n, masses, dt, force_params).toarray()


def A_hat_apply(x, masses, dt2, force_params):
    """Matrix-free A_hat applied to x (n,3)."""
    out = masses[:, None] * x
    n = x.shape[0]
    for p in force_params.values():
        y = coeff_apply(p["coeff"], p["indices"], x)
        w2 = p["weight"] ** 2
        out = out + dt2 * coeff_apply_T(p["coeff"], p["indices"], w2, y, n)
    return out


def A_hat_diag(masses, dt2, force_params):
    """Exact diagonal of A_hat (Jacobi preconditioner)."""
    d = masses
    n = masses.shape[0]
    for p in force_params.values():
        w2 = p["weight"] ** 2
        d = d + dt2 * coeff_diag(p["coeff"], p["indices"], w2, n)
    return d


def pcg_solve(A_apply, b, x0, diag, tol, max_iters):
    """Jacobi-preconditioned CG on (n,3) right-hand sides treated as one
    system (single scalar inner products over all 3n dofs; collectives-ready:
    under shard_map the dots and A_apply psum across element shards)."""
    inv_diag = 1.0 / diag

    def dot(a, b):
        return jnp.vdot(a, b)

    r = b - A_apply(x0)
    z = inv_diag[:, None] * r
    p = z
    rz = dot(r, z)
    b_norm2 = dot(b, b)
    tol2 = tol * tol * jnp.maximum(b_norm2, jnp.finfo(b.dtype).tiny)

    def cond(carry):
        x, r, p, rz, it = carry
        return jnp.logical_and(it < max_iters, dot(r, r) > tol2)

    def body(carry):
        x, r, p, rz, it = carry
        Ap = A_apply(p)
        pAp = dot(p, Ap)
        alpha = rz / jnp.where(pAp > 0, pAp, 1.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = inv_diag[:, None] * r
        rz_new = dot(r, z)
        beta = rz_new / jnp.where(rz > 0, rz, 1.0)
        p = z + beta * p
        return (x, r, p, rz_new, it + 1)

    x, r, p, rz, it = jax.lax.while_loop(cond, body, (x0, r, p, rz, jnp.int32(0)))
    return x, it


def assemble_A_hat_ell(n, masses, dt, force_params, pad_to: int = 8):
    """Host-side assembly of A_hat in padded ELL (ELLPACK) form.

    TPU scatters serialize; gathers vectorize. Precomputing the sparse
    A_hat = diag(m) + dt^2 sum C^T W^2 C as per-row neighbor lists turns
    every CG matvec into ONE gather + weighted sum — no segment_sum in the
    inner loop. Rows are padded to the max vertex degree (rounded up to a
    multiple of `pad_to`) with zero-value self-references.

    Returns (idx (n,K) int32, vals (n,K) float64, diag (n,) float64).
    """
    A = _assemble_A_hat_csr(n, masses, dt, force_params)
    deg = np.diff(A.indptr)
    K = max(int(deg.max()) if n else 1, 1)
    K = -(-K // pad_to) * pad_to
    ell_idx = np.tile(np.arange(n, dtype=np.int64)[:, None], (1, K))
    ell_vals = np.zeros((n, K), dtype=np.float64)
    row_of = np.repeat(np.arange(n), deg)
    pos = np.arange(A.nnz) - np.repeat(A.indptr[:-1], deg)
    ell_idx[row_of, pos] = A.indices
    ell_vals[row_of, pos] = A.data
    return ell_idx.astype(np.int32), ell_vals, A.diagonal().copy()


def assemble_A_hat_dia(n, masses, dt, force_params, max_diagonals: int = 48):
    """A_hat in sparse-DIAgonal form, when the mesh permits.

    Meshes with regular (lattice) vertex numbering produce an A_hat whose
    nonzeros lie on a handful of fixed diagonals (27 for a hexahedral
    lattice). Storing those diagonals turns the matvec into static
    shift-multiply-adds — NO gather — which lets the whole CG solve run
    inside one VMEM-resident Pallas kernel (ops/pallas/cg_dia.py).

    Returns (offsets tuple, dia_vals (D, n) float64, diag (n,)) or None if
    the matrix has more than max_diagonals distinct diagonals (unstructured
    mesh — use ELL instead).
    """
    A = _assemble_A_hat_csr(n, masses, dt, force_params).tocoo()
    offs = np.unique(A.col - A.row)
    if len(offs) > max_diagonals:
        return None
    dia = np.zeros((len(offs), n), dtype=np.float64)
    d_idx = np.searchsorted(offs, A.col - A.row)
    np.add.at(dia, (d_idx, A.row), A.data)
    return tuple(int(o) for o in offs), dia, A.tocsr().diagonal().copy()


def dia_apply(x, offsets, dia_vals):
    """A_hat @ x via diagonals: (n,3) -> (n,3). Static shifts, no gather.
    (XLA reference implementation; the hot path is the fused kernel.)"""
    n = x.shape[0]
    out = jnp.zeros_like(x)
    for d, off in enumerate(offsets):
        if off >= 0:
            shifted = jnp.pad(x[off:], ((0, off), (0, 0)))
        else:
            shifted = jnp.pad(x[: n + off], ((-off, 0), (0, 0)))
        out = out + dia_vals[d][:, None] * shifted
    return out


def ell_apply(x, ell_idx, ell_vals):
    """A_hat @ x via ELL: (n,3) -> (n,3). One gather + einsum, no scatter."""
    return jnp.einsum("nk,nkj->nj", ell_vals, x[ell_idx])


def assemble_transpose_incidence(n, force_params, order, pad_to: int = 8):
    """Vertex -> (element, slot) incidence in padded-ELL form, for computing
    D^T W^2 y by GATHER instead of segment_sum (the right-hand-side assembly;
    TPU scatters serialize, gathers vectorize).

    Contributions are laid out as the concatenation, in `order`, of each
    type's flattened (E*K, 3) per-vertex contribution rows; a zero sentinel
    row is appended at index `total`. Returns (inc_idx (n, D) int32, total).
    """
    offsets = []
    idx_all = []
    off = 0
    for name in order:
        idx = np.asarray(force_params[name]["indices"], dtype=np.int64).reshape(-1)
        idx_all.append(idx)
        offsets.append(off)
        off += idx.size
    total = off
    if total == 0:
        return np.zeros((n, 1), dtype=np.int32), 0
    verts = np.concatenate(idx_all)
    flat = np.arange(total, dtype=np.int64)
    srt = np.argsort(verts, kind="stable")
    sv = verts[srt]
    counts = np.bincount(sv, minlength=n)
    D = max(int(counts.max()), 1)
    D = -(-D // pad_to) * pad_to
    inc = np.full((n, D), total, dtype=np.int64)  # sentinel
    pos = np.arange(total) - np.repeat(
        np.concatenate([[0], np.cumsum(counts)[:-1]]), counts
    )
    inc[sv, pos] = flat[srt]
    return inc.astype(np.int32), total


def transpose_gather_apply(contribs_flat, inc_idx):
    """sum of contribution rows per vertex: (total+1, 3), (n,D) -> (n,3)."""
    return jnp.sum(contribs_flat[inc_idx], axis=1)


def pcg_solve_fixed(A_apply, b, x0, diag, n_iters: int):
    """Jacobi-PCG with a FIXED iteration count (lax.fori_loop, no residual
    test): no data-dependent control flow, so the whole solve is a static
    pipeline — faster on TPU and required where dynamic while_loops are
    unavailable. ADMM tolerates the resulting inexact global solves (it is
    itself an outer fixed-point loop); pair with warm starts."""
    inv_diag = 1.0 / diag

    def dot(a, b):
        return jnp.vdot(a, b)

    r = b - A_apply(x0)
    z = inv_diag[:, None] * r
    p = z
    rz = dot(r, z)

    def body(_, carry):
        x, r, p, rz = carry
        Ap = A_apply(p)
        pAp = dot(p, Ap)
        alpha = rz / jnp.where(pAp > 0, pAp, 1.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = inv_diag[:, None] * r
        rz_new = dot(r, z)
        beta = rz_new / jnp.where(rz > 0, rz, 1.0)
        p = z + beta * p
        return (x, r, p, rz_new)

    x, r, p, rz = jax.lax.fori_loop(0, n_iters, body, (x0, r, p, rz))
    return x, jnp.int32(n_iters)
