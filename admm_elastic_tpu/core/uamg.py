"""Host-side builder for the IN-KERNEL algebraic multigrid preconditioner
(banded whole-timestep kernel, uell mode — ARBITRARY mesh topology).

The reference's global step is an exact prefactored LDLT
(/root/reference/deps/admm-elastic-sca/src/system/System.cpp:140) and is
topology-agnostic. The uell whole-timestep kernel (core/uell.py +
ops/pallas/banded_step.py) runs arbitrary meshes, but its fixed-budget
Jacobi-PCG needs ~150 in-kernel iterations to match that exact solve at
100k-tet scale (docs/PERFORMANCE.md "Matched-residual solves") because
A_hat is stiffness-dominated and the Jacobi floor grows with mesh
diameter. The grid geometric MG (core/mg.py) removes the diameter
dependence for grid numberings; this module is its ALGEBRAIC counterpart
for unstructured meshes. Every device operation is one the kernel already
performs:

  fine matvec    — the uell per-row-offset ELL slots (unchanged: the
                   slab-ordered packing keeps its locality; see the
                   round-2 feasibility study in docs/PERFORMANCE.md —
                   aggregate-ORDERED numbering was measured 5.4x worse)
  level-1 matvec — a second, smaller uell packing of the Galerkin
                   operator over a compact coarse layout (coarse dofs
                   rank-ordered by LEADER position, so the coarse
                   ordering inherits the fine slab order's spatial
                   coherence)
  restriction    — piecewise-constant over capped graph aggregates,
                   executed as a handful of "transfer ops": one
                   full-plane lane-gather + static row-range sums each
                   (the same A/B machinery as the grid MG's coarsest
                   pack, generalized to a greedy op schedule)
  prolongation   — the exact transpose of restriction (same entry sets:
                   static row-range broadcasts + one lane-gather per op),
                   so the V(1,1) damped-Jacobi cycle is symmetric — a
                   valid SPD CG preconditioner
  coarsest solve — level-2 dofs packed to an (np2, 128) plane by the same
                   transfer ops, then an exact dense inverse applied as
                   np2^2 (1,128)@(128,128) MXU matmuls

Setup is host-side scipy/numpy (like the uell packing itself) and runs at
System.initialize; aggregation quality was validated in round 2 (cap-8
greedy reaches 57 PCG iterations to 1e-10 vs 66 uncapped vs 423 Jacobi on
the delaunay100k A_hat).
"""

from __future__ import annotations

import numpy as np

from .uell import LANES, pack_uell, uell_matvec_np

MAX_OPS = 40          # transfer-op budget per level+direction (sanity cap)


# ------------------------------------------------------------- aggregation

def _strength_graph(A, theta):
    """Strong-connection mask |a_ij| >= theta*sqrt(a_ii a_jj) (same rule
    as core/amg.py)."""
    import scipy.sparse as sp

    d = A.diagonal()
    d = np.where(d > 0, d, 1.0)
    Ac = A.tocoo()
    off = Ac.row != Ac.col
    strong = off & (
        np.abs(Ac.data) >= theta * np.sqrt(d[Ac.row] * d[Ac.col])
    )
    return sp.csr_matrix(
        (np.ones(int(strong.sum())), (Ac.row[strong], Ac.col[strong])),
        shape=A.shape,
    )


def aggregate_capped(S, cap=8, rounds=3):
    """Vaněk-style greedy aggregation with a hard size cap (the cap bounds
    the per-aggregate transfer-entry count). Round 1 seeds an aggregate
    from each node whose strong neighborhood is untouched (taking at most
    cap-1 neighbors); further rounds seed among the LEFTOVER nodes (with
    the cap, one seeding round strands most of the mesh next to full
    aggregates: 64% singletons measured on the delaunay100k A_hat, vs 9%
    with re-seeding — and the smooth-error contraction improves 0.30 ->
    0.20 per cycle); then attach remaining nodes to the SMALLEST adjacent
    aggregate with room; singletons last. Returns (agg (n,) int64,
    n_agg)."""
    n = S.shape[0]
    agg = np.full(n, -1, np.int64)
    size = []
    indptr, indices = S.indptr, S.indices
    n_agg = 0
    for r in range(rounds):
        progress = False
        for i in range(n):
            if agg[i] != -1:
                continue
            nb = indices[indptr[i]: indptr[i + 1]]
            if r == 0 and (agg[nb] != -1).any():
                continue
            nb = nb[agg[nb] == -1]
            if r > 0 and len(nb) == 0:
                continue
            agg[i] = n_agg
            take = nb[: cap - 1]
            agg[take] = n_agg
            size.append(1 + len(take))
            n_agg += 1
            progress = True
        if not progress:
            break
    for i in range(n):
        if agg[i] != -1:
            continue
        nb = indices[indptr[i]: indptr[i + 1]]
        best = -1
        bs = cap
        for j in nb:
            a = agg[j]
            if a != -1 and size[a] < bs:
                best = a
                bs = size[a]
        if best != -1:
            agg[i] = best
            size[best] += 1
    for i in range(n):
        if agg[i] == -1:
            agg[i] = n_agg
            size.append(1)
            n_agg += 1
    return agg, n_agg


# --------------------------------------------------------- transfer schedule

class _TransferOp:
    __slots__ = ("rowmap", "ranges", "used_r", "entries")

    def __init__(self):
        self.rowmap = {}   # source row -> target row
        self.ranges = {}   # target row -> [lo, hi)
        self.used_r = set()  # (source row, target lane)
        self.entries = []  # (tr, tl, fr, fl)

    def _range_ok(self, tr, lo, hi):
        for t2, (l2, h2) in self.ranges.items():
            if t2 != tr and lo < h2 and l2 < hi:
                return False
        return True

    def try_add(self, tr, tl, fr, fl):
        known = self.rowmap.get(fr)
        if known is not None and known != tr:
            return False
        if (fr, tl) in self.used_r:
            return False
        if known is None:
            lo, hi = self.ranges.get(tr, (fr, fr + 1))
            lo, hi = min(lo, fr), max(hi, fr + 1)
            if not self._range_ok(tr, lo, hi):
                return False
            self.ranges[tr] = (lo, hi)
            self.rowmap[fr] = tr
        self.used_r.add((fr, tl))
        self.entries.append((tr, tl, fr, fl))
        return True


def schedule_transfers(t_pos, s_pos, Ns_rows, Nt_rows, max_ops=MAX_OPS):
    """Schedule piecewise-constant transfer entries target_pos[j] <-
    source_pos[j] (both flat plane positions) into gather ops.

    Each op executes as (R = restriction, P = R^T = prolongation):
      R:  g = mask_r * take_along_axis(SRC, idx_r, axis=1)
          for (tr, lo, hi) in segments: OUT[tr] += g[lo:hi].sum(rows)
      P:  exp[lo:hi] = Z[tr] per segment (static row-range broadcast)
          OUT += mask_p * take_along_axis(exp, idx_p, axis=1)

    Invariants per op (checked during the greedy): each source row feeds
    at most one target row; per (source row, target lane) at most one
    entry; each (op, target row)'s source rows form one contiguous range
    that contains no row feeding a DIFFERENT target row (rows with no
    entries are fine — their mask is zero).

    Returns a list of dicts {idx_r, mask_r, idx_p, mask_p: (Ns_rows,128);
    segments: tuple of (tr, lo, hi)}. Raises ValueError past max_ops.
    """
    t_pos = np.asarray(t_pos, np.int64)
    s_pos = np.asarray(s_pos, np.int64)
    if len(t_pos) and (t_pos.max() >= Nt_rows * LANES
                       or s_pos.max() >= Ns_rows * LANES):
        raise ValueError("uamg: transfer position out of plane bounds")
    order = np.argsort(s_pos, kind="stable")
    ops = []
    for j in order:
        tr, tl = int(t_pos[j]) // LANES, int(t_pos[j]) % LANES
        fr, fl = int(s_pos[j]) // LANES, int(s_pos[j]) % LANES
        for op in ops:
            if op.try_add(tr, tl, fr, fl):
                break
        else:
            if len(ops) >= max_ops:
                raise ValueError("uamg: transfer op budget exceeded")
            op = _TransferOp()
            assert op.try_add(tr, tl, fr, fl)
            ops.append(op)
    out = []
    for op in ops:
        idx_r = np.zeros((Ns_rows, LANES), np.int32)
        mask_r = np.zeros((Ns_rows, LANES))
        idx_p = np.zeros((Ns_rows, LANES), np.int32)
        mask_p = np.zeros((Ns_rows, LANES))
        for tr, tl, fr, fl in op.entries:
            idx_r[fr, tl] = fl
            mask_r[fr, tl] = 1.0
            idx_p[fr, fl] = tl
            mask_p[fr, fl] = 1.0
        segs = tuple(
            (int(tr), int(lo), int(hi))
            for tr, (lo, hi) in sorted(op.ranges.items())
        )
        out.append({
            "idx_r": idx_r, "mask_r": mask_r,
            "idx_p": idx_p, "mask_p": mask_p,
            "segments": segs,
        })
    return out


def apply_R_np(ops, x_src, Nt_rows):
    """Numpy reference of the restriction op sequence."""
    out = np.zeros((Nt_rows, LANES))
    for op in ops:
        g = op["mask_r"] * np.take_along_axis(
            x_src, op["idx_r"].astype(np.int64), axis=1
        )
        for tr, lo, hi in op["segments"]:
            out[tr] += g[lo:hi].sum(0)
    return out


def apply_P_np(ops, z, Ns_rows):
    """Numpy reference of the prolongation op sequence (transpose of R)."""
    out = np.zeros((Ns_rows, LANES))
    for op in ops:
        exp = np.zeros((Ns_rows, LANES))
        for tr, lo, hi in op["segments"]:
            exp[lo:hi] = z[tr]
        out += op["mask_p"] * np.take_along_axis(
            exp, op["idx_p"].astype(np.int64), axis=1
        )
    return out


# -------------------------------------------------------------- hierarchy

def _rho_dinv_a(A, iters=60, seed=0):
    d = A.diagonal()
    d = np.where(d > 0, d, 1.0)
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(A.shape[0])
    lam = 1.0
    for _ in range(iters):
        y = (A @ x) / d
        lam = float(np.linalg.norm(y))
        if lam == 0:
            return 1.0
        x = y / lam
    return lam


def _rank_by_leader(agg, n_agg, member_pos):
    """Coarse ids rank-ordered by leader (min member) position: returns
    rank (n_agg,) with rank[a] = the coarse id of aggregate a."""
    leader = np.full(n_agg, np.iinfo(np.int64).max, np.int64)
    np.minimum.at(leader, agg, member_pos)
    rank = np.empty(n_agg, np.int64)
    rank[np.argsort(leader, kind="stable")] = np.arange(n_agg)
    return rank


def build_uamg(A, positions, n_pad, cap=8, theta=0.08, np2_max=8,
               uell_quantiles=(0.99, 0.97, 1.0), dilute=8,
               max_l1_slots=320):
    """Build the in-kernel algebraic-MG package for CSR A_hat (internal
    vertex ids) whose FINE layout is the uell diluted slab layout
    (`positions` (n,) from core/uell, padded plane size n_pad).

    Returns (planes, meta) or raises ValueError when the structure does
    not fit the op budgets (caller falls back to Jacobi).

    planes (numpy):
      om_invd0 (Nf,128), vmask1/om_invd1 (Nc,128),
      r0/p0 ops (idx+mask per op, (Nf,128)), r1/p1 ops ((Nc,128)),
      l1 uell value planes (K1, Nc, 128) + lane planes,
      a2inv_blocks (np2^2, 128, 128)
    meta (static): segments per op, l1 slot/fold q lists, np2 rows, sizes.
    """
    import scipy.sparse as sp

    A = A.tocsr()
    n = A.shape[0]
    positions = np.asarray(positions, np.int64)
    Nf = n_pad // LANES

    # ---- level 1: capped aggregation over the fine strength graph
    S = _strength_graph(A, theta)
    agg, nc1 = aggregate_capped(S, cap)
    if nc1 >= n:
        raise ValueError("uamg: no coarsening progress")
    rank1 = _rank_by_leader(agg, nc1, positions)
    c_of = rank1[agg]                       # fine vertex -> coarse id
    # diluted compact coarse layout (spare slots for the L1 uell packing's
    # hub splitting, same recipe as the fine layout)
    cpos_of_id = np.arange(nc1) + np.arange(nc1) // dilute
    n_pos_c = int(cpos_of_id[-1]) + 1 if nc1 else 1
    P1 = sp.csr_matrix(
        (np.ones(n), (np.arange(n), c_of)), shape=(n, nc1)
    )
    A1 = (P1.T @ A @ P1).tocsr()
    A1.sum_duplicates()

    # ---- L1 operator as a uell packing over the coarse layout
    A1c = A1.tocoo()
    nz = A1c.data != 0.0
    pk1 = None
    err = None
    for cq in uell_quantiles:
        try:
            pk1 = pack_uell(A1c.row[nz], A1c.col[nz], A1c.data[nz],
                            cpos_of_id, n_pos_c, cap_quantile=cq,
                            max_slots=max_l1_slots,
                            spare_pool=max(256, n_pos_c // 8))
            break
        except ValueError as e:  # try the next quantile
            err = e
    if pk1 is None:
        raise ValueError(f"uamg: L1 uell packing failed ({err})")
    Npad_c = pk1["n_pad"]
    Nc = Npad_c // LANES

    # ---- transfers fine <-> L1
    ops0 = schedule_transfers(
        cpos_of_id[c_of], positions, Nf, Nc
    )

    # ---- level 2: aggregate A1, rank by L1 position, packed dense solve
    S1 = _strength_graph(A1, theta)
    agg2, nc2 = aggregate_capped(S1, cap)
    # compose once more if the coarsest is still too large for the packed
    # dense plane
    while nc2 > np2_max * LANES:
        P2t = sp.csr_matrix(
            (np.ones(nc1), (np.arange(nc1), agg2)), shape=(nc1, nc2)
        )
        A2t = (P2t.T @ A1 @ P2t).tocsr()
        S2 = _strength_graph(A2t, theta)
        aggn, ncn = aggregate_capped(S2, cap)
        if ncn >= nc2:
            raise ValueError("uamg: coarsest level does not fit")
        agg2 = aggn[agg2]
        nc2 = ncn
    rank2 = _rank_by_leader(agg2, nc2, cpos_of_id)
    c2_of = rank2[agg2]                     # L1 id -> L2 id (rank order)
    P2 = sp.csr_matrix(
        (np.ones(nc1), (np.arange(nc1), c2_of)), shape=(nc1, nc2)
    )
    A2 = (P2.T @ A1 @ P2).toarray()
    np2 = max(-(-nc2 // LANES), 1)
    # L2 packed position IS the rank id (dense layout, no dilution —
    # the coarsest level is solved exactly, never uell-packed)
    ops1 = schedule_transfers(c2_of, cpos_of_id, Nc, np2)

    a2inv = np.linalg.inv(A2)
    npad2 = np2 * LANES
    a2inv_pad = np.zeros((npad2, npad2))
    a2inv_pad[:nc2, :nc2] = a2inv
    blocks = np.zeros((np2 * np2, LANES, LANES))
    for sr in range(np2):
        for tr in range(np2):
            blocks[sr * np2 + tr] = a2inv_pad[
                tr * LANES:(tr + 1) * LANES, sr * LANES:(sr + 1) * LANES
            ].T

    # ---- smoothers (damped Jacobi, same omega rule as core/mg.py)
    om0 = 4.0 / (3.0 * max(_rho_dinv_a(A), 1e-12))
    om1 = 4.0 / (3.0 * max(_rho_dinv_a(A1), 1e-12))
    d0 = A.diagonal()
    om_invd0 = np.zeros(n_pad)
    om_invd0[positions] = om0 / np.where(d0 > 0, d0, 1.0)
    d1 = A1.diagonal()
    om_invd1 = np.zeros(Npad_c)
    om_invd1[cpos_of_id] = om1 / np.where(d1 > 0, d1, 1.0)
    vmask1 = np.zeros(Npad_c)
    vmask1[cpos_of_id] = 1.0

    planes = {
        "om_invd0": om_invd0.reshape(Nf, LANES),
        "om_invd1": om_invd1.reshape(Nc, LANES),
        "vmask1": vmask1.reshape(Nc, LANES),
        "r0_idx": np.stack([op["idx_r"] for op in ops0]),
        "r0_mask": np.stack([op["mask_r"] for op in ops0]),
        "p0_idx": np.stack([op["idx_p"] for op in ops0]),
        "p0_mask": np.stack([op["mask_p"] for op in ops0]),
        "r1_idx": np.stack([op["idx_r"] for op in ops1]),
        "r1_mask": np.stack([op["mask_r"] for op in ops1]),
        "p1_idx": np.stack([op["idx_p"] for op in ops1]),
        "p1_mask": np.stack([op["mask_p"] for op in ops1]),
        "l1_vals": np.stack(
            [vp for _, _, vp in pk1["slots"]]
            + [vp for layer in pk1["folds"] for _, _, vp in layer]
        ),
        "l1_cc": np.stack(
            [cc for _, cc, _ in pk1["slots"]]
            + [cc for layer in pk1["folds"] for _, cc, _ in layer]
        ),
        "a2inv_blocks": blocks,
    }
    meta = {
        "segs0": tuple(op["segments"] for op in ops0),
        "segs1": tuple(op["segments"] for op in ops1),
        "l1_slot_qs": tuple(q for q, _, _ in pk1["slots"]),
        "l1_fold_qs": tuple(
            tuple(q for q, _, _ in layer) for layer in pk1["folds"]
        ),
        "np2": int(np2),
        "nc_rows": int(Nc),
        "nc2": int(nc2),
        "levels": (int(n), int(nc1), int(nc2)),
        "n_ops": (len(ops0), len(ops1)),
    }
    return planes, meta


# ----------------------------------------------------------------- numpy ref

def _l1_matvec_np(planes, meta, x):
    """L1 uell matvec in the coarse layout (numpy reference)."""
    pk = {
        "n_pad": planes["om_invd1"].size,
        "slots": [
            (q, planes["l1_cc"][k], planes["l1_vals"][k])
            for k, q in enumerate(meta["l1_slot_qs"])
        ],
        "folds": [],
    }
    kf = len(meta["l1_slot_qs"])
    for layer in meta["l1_fold_qs"]:
        lops = []
        for q in layer:
            lops.append((q, planes["l1_cc"][kf], planes["l1_vals"][kf]))
            kf += 1
        pk["folds"].append(lops)
    out = uell_matvec_np(pk, x.ravel()).reshape(x.shape)
    return planes["vmask1"] * out


def vcycle_np(planes, meta, fine_matvec, r):
    """Numpy reference of the EXACT op sequence the kernel runs:
    r (Nf,128) -> z (Nf,128). fine_matvec: callable (Nf,128)->(Nf,128)
    (the kernel's own uell matvec, vmask applied)."""
    Nf = r.shape[0]
    Nc = meta["nc_rows"]
    np2 = meta["np2"]

    def ops_of(which):
        return [
            {
                "idx_r": planes[f"{which}_idx"][k]
                if which[0] == "r" else None,
                "mask_r": planes[f"{which}_mask"][k]
                if which[0] == "r" else None,
                "idx_p": planes[f"{which}_idx"][k]
                if which[0] == "p" else None,
                "mask_p": planes[f"{which}_mask"][k]
                if which[0] == "p" else None,
                "segments": meta["segs0" if which[1] == "0" else "segs1"][k],
            }
            for k in range(planes[f"{which}_idx"].shape[0])
        ]

    def coarse_solve(rp):
        z = np.zeros_like(rp)
        B = planes["a2inv_blocks"]
        for sr in range(np2):
            for tr in range(np2):
                z[tr] += rp[sr] @ B[sr * np2 + tr]
        return z

    z = planes["om_invd0"] * r
    res = r - fine_matvec(z)
    r1 = apply_R_np(ops_of("r0"), res, Nc)
    z1 = planes["om_invd1"] * r1
    res1 = r1 - _l1_matvec_np(planes, meta, z1)
    r2 = apply_R_np(ops_of("r1"), res1, np2)
    z2 = apply_P_np(ops_of("p1"), coarse_solve(r2), Nc)
    z1 = z1 + z2
    z1 = z1 + planes["om_invd1"] * (r1 - _l1_matvec_np(planes, meta, z1))
    z = z + apply_P_np(ops_of("p0"), z1, Nf)
    z = z + planes["om_invd0"] * (r - fine_matvec(z))
    return z
