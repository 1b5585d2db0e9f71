"""Whole-ADMM-timestep Pallas kernel for ARBITRARY banded tet meshes.

The lattice kernel (lattice_step.py) needs constant-offset selectors; this
kernel drops that requirement. It runs the full System-dia algorithm —
explicit kicks, every ADMM iteration's hyperelastic local steps, dual
updates, RHS assembly and whole Jacobi-PCG solves — as ONE pallas_call per
rollout window for ANY tet mesh whose vertex numbering is banded enough for
the sparse-diagonal global matrix (grid meshes in any numbering via the
renumbering in core/lattice.detect_grid_numbering, jittered/graded lattices,
RCM-ordered unstructured meshes), with PER-ELEMENT materials.

Everything lives in a 2D row-major layout: a vertex plane is an (Nr, 128)
f32 block (vertex i at row i//128, lane i%128), element chunks are 64
sub-blocks of 128 elements (element planes are (64, 128) blocks). The two
operations the lattice kernel got for free from constant offsets are done
with windowed dynamic-index primitives instead (hardware-probed; see
tools/probe_mosaic.py):

- GATHER x[tet[e,k],a]: each chunk's vertex indices fit a window of Wr
  rows starting at a per-chunk base row (elements are sorted by min vertex
  index on the host). The gather is a short scan over window rows r:
  take_along_axis (a native per-sublane lane shuffle) picks lanes from the
  broadcast row, and (rr == r) masks select which elements read row r.

- SCATTER b[tet[e,k],a] += contrib: the host packs elements into
  sub-blocks such that within a sub-block each corner's 128 target LANES
  are distinct (core/banded.place_elements). The scatter then becomes a
  lane PERMUTATION (take_along_axis by the inverse permutation P) followed
  by the same short row scan on the permuted target rows, accumulating into
  a window accumulator — no atomic/conflicting writes anywhere.

The global CG solve uses the same sparse-diagonal matvec as cg_dia.py, but
in 2D layout an offset `off = 128 q + s` becomes a lane roll by s combined
with two static row shifts (lanes that wrap the 128 boundary read the next
row); pltpu.roll handles the lane rotation.

Algorithmically identical to the general System dia path (same math as
reference System.cpp:26-75 with TetForce.cpp:303-364 local steps);
trajectories match to f32 round-off (tests/test_banded.py).

Supported: one tet force (NeoHookean/StVK HyperElasticTet or
LinearTetStrain 'arap') with per-element mu/lam/k/volume, StaticAnchors
with per-node weights, an optional CollisionForce of analytic shapes
(floor/sphere/cylinder), gravity-style velocity kicks. Per-iteration
residuals stream from in-kernel on request ("primal": ~free via the
dual-update identity; True: primal + dual, the dual via a second
scatter accumulation) — including per-scenario in sweep mode.

Global solve: two interchangeable matvec forms —
- sparse-DIAgonal (banded numberings: static shifts + lane rolls), or
- per-row-offset ELL + layered folds (core/uell.py; ARBITRARY topology:
  one native lane shuffle + multiply-add per slot plane, hub splits
  folded back on the result plane, valid-mask to hide spare slots).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nh_local import _newton_hyper, _svd_columns

SUB = 64          # sub-blocks (rows) per chunk; chunk = SUB*128 elements
LANES = 128

# FB (static per-chunk block) plane layout — each plane is SUB rows.
# float planes: 0-11 cp[4b+k], 12 w2, 13 mu, 14 lam, 15 k(prox);
# index planes (stored as exact small f32 values): 16-19 rr[k] (window row
# of corner k), 20-23 cc[k] (lane of corner k), 24-27 P[k] (scatter lane
# permutation: out-lane -> element lane), 28-31 rrp[k] (window row of the
# PERMUTED targets; -1 marks a pad lane that receives nothing).
FB_PLANES = 32
CP0, W2P, MUP, LAMP, KP = 0, 12, 13, 14, 15
RRP0, CCP0, PP0, RRPP0 = 16, 20, 24, 28

# DB (dual block) planes: 0-8 u (row-major F planes), 9-11 warm sigma.
DB_PLANES = 12

# STATE planes (each Nr rows): live x, v, pre-step x, M xbar, b/r (folded),
# CG p, CG Ap, anchor duals, floor duals.
SX, SV, SXT, SMXB, SB, SP_, SAP, SAU, SCU = (3 * q for q in range(9))
STATE_PLANES = 27

# P2D (packed vertex-plane input) planes: aw2, invd, mass, vmask, ancz xyz.
PAW2, PINVD, PMASS, PVM, PANCZ = 0, 1, 2, 3, 4
P2D_PLANES = 7


def _roll_lanes(x, k, interpret):
    """out[r, l] = x[r, (l - k) % 128] (np.roll semantics along lanes)."""
    k = k % LANES
    if k == 0:
        return x
    if interpret:
        return jnp.roll(x, k, axis=1)
    return pltpu.roll(x, k, 1)


def _row_shift_up(x, q, Nr):
    """out[r] = x[r + q] with zero fill (q >= 0)."""
    if q == 0:
        return x
    if q >= Nr:
        return jnp.zeros_like(x)
    return jnp.concatenate([x[q:, :], jnp.zeros((q, LANES), x.dtype)], 0)


def _row_shift_down(x, q, Nr):
    """out[r] = x[r - q] with zero fill (q >= 0)."""
    if q == 0:
        return x
    if q >= Nr:
        return jnp.zeros_like(x)
    return jnp.concatenate([jnp.zeros((q, LANES), x.dtype), x[: Nr - q, :]], 0)


def _shifted(xp, off, Nr, interpret):
    """out[i] = x[i + off] (flat index, zero fill) in (Nr,128) layout."""
    if off == 0:
        return xp
    if off > 0:
        q, s = divmod(off, LANES)
        t = _roll_lanes(xp, LANES - s, interpret) if s else xp
        base = _row_shift_up(t, q, Nr)
        if s == 0:
            return base
        alt = _row_shift_up(t, q + 1, Nr)
        lane = jax.lax.broadcasted_iota(jnp.int32, (Nr, LANES), 1)
        return jnp.where(lane < LANES - s, base, alt)
    m = -off
    q, s = divmod(m, LANES)
    t = _roll_lanes(xp, s, interpret) if s else xp
    base = _row_shift_down(t, q, Nr)
    if s == 0:
        return base
    alt = _row_shift_down(t, q + 1, Nr)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Nr, LANES), 1)
    return jnp.where(lane >= s, base, alt)


def _make_banded_kernel(Nr, Wr, n_chunks, n_iters, dia_offs, model,
                        newton_iters, cg_iters, dt, dt2, gvec,
                        coll_shapes, coll_w2, halves, interpret, uell_meta,
                        sweep=False, collect=False, collect_dual=False,
                        mg_meta=None, uamg_meta=None):
    has_coll = len(coll_shapes) > 0
    SOLVE = n_chunks
    # dual-residual collection: two extra 3-plane vertex accumulators —
    # SZC = D^T W^2 z of the CURRENT iteration (rebuilt each iteration by
    # a second scatter accumulation), SZP = the previous iteration's, so
    # s = dt^2 ||SZC - SZP|| (System.cpp:65). Zeroed per timestep like the
    # general path's carry.
    SZC, SZP = 27, 30
    precond = mg_meta is not None or uamg_meta is not None
    # Row-half chunking of the local-step body: Mosaic stack-allocates
    # scoped VMEM for every live (HS,128) temporary, and the gather +
    # 3x3 SVD + Newton prox + scatter pipeline holds ~100 of them — at
    # SUB=64 that alone is ~3 MB and the 100k-tet kernel exceeds the
    # 16 MB cap by ~2 MB. Processing the chunk's SUB element rows in
    # `halves` passes divides the peak stack accordingly; results are
    # bit-identical (elements are independent in the local step).
    HS = SUB // halves

    def srows(plane):
        return slice(plane * Nr, (plane + 1) * Nr)

    def frows(plane):
        return slice(plane * SUB, (plane + 1) * SUB)

    def hrows(plane, h):
        return slice(plane * SUB + h * HS, plane * SUB + (h + 1) * HS)

    NP2 = 4  # packed coarsest-vector rows (core/mg.NP2_ROWS)

    def kernel(*refs):
        (p2d_ref, dia_ref, ucc_ref, rbase_ref,
         fblk_hbm, matv_ref, x0_hbm, v0_hbm, au0_hbm, cu0_hbm,
         d_hbm) = refs[:11]
        k = 11
        if precond:
            mgf_ref, mgi_ref, a2b_ref = refs[11:14]
            k = 14
        n_out = 7 if collect_dual else 6
        rd_out = None
        if collect_dual:
            (x_out, v_out, d_out, au_out, cu_out, res_out,
             rd_out) = refs[k:k + n_out]
        else:
            (x_out, v_out, d_out, au_out, cu_out, res_out) = refs[k:k + n_out]
        ST, FB, DB, BW, racc, sem = refs[k + n_out:]
        # sweep mode: a leading SCENARIO grid axis — every scenario runs
        # the identical single-scenario program against its own state/
        # material/matrix planes (p2d/dia2d/matv/x0.../d are per-scenario;
        # topology planes fblk/ucc/rbase are shared). The VMEM state
        # scratch is re-seeded at each scenario's first grid step.
        if sweep:
            sc = pl.program_id(0)
            st = pl.program_id(1)
            i = pl.program_id(2)
            p1 = pl.program_id(3)
        else:
            st = pl.program_id(0)
            i = pl.program_id(1)
            p1 = pl.program_id(2)

        def matp(p, h):
            """Material plane p (0 w2, 1 mu, 2 lam, 3 k) for row-half h:
            per-scenario matv planes in sweep mode, static FB planes
            otherwise."""
            if sweep:
                return matv_ref[slice(p * SUB + h * HS,
                                      p * SUB + (h + 1) * HS)]
            return FB[hrows((W2P, MUP, LAMP, KP)[p], h)]

        def plane(pref, p):
            return pref[srows(p)]

        # ---- very first grid step (per scenario in sweep mode): seed the
        # live state. Non-sweep: x0... are HBM refs — DMA whole aligned
        # buffers only (sub-tile VMEM slices are not DMA-able), staged
        # through the VMEM outputs. Sweep: x0... arrive as per-scenario
        # blocked VMEM inputs (squeezed block refs are not DMA targets on
        # Mosaic), so the seed is plain vector copies.
        @pl.when(jnp.logical_and(st == 0, jnp.logical_and(i == 0, p1 == 0)))
        def _seed():
            if sweep:
                ST[slice(SX * Nr, (SX + 3) * Nr)] = x0_hbm[:, :]
                ST[slice(SV * Nr, (SV + 3) * Nr)] = v0_hbm[:, :]
                ST[slice(SAU * Nr, (SAU + 3) * Nr)] = au0_hbm[:, :]
                ST[slice(SCU * Nr, (SCU + 3) * Nr)] = cu0_hbm[:, :]
                return
            for src, dst in ((x0_hbm, x_out), (v0_hbm, v_out),
                             (au0_hbm, au_out), (cu0_hbm, cu_out)):
                c = pltpu.make_async_copy(src, dst, sem)
                c.start()
                c.wait()
            ST[slice(SX * Nr, (SX + 3) * Nr)] = x_out[:, :]
            ST[slice(SV * Nr, (SV + 3) * Nr)] = v_out[:, :]
            ST[slice(SAU * Nr, (SAU + 3) * Nr)] = au_out[:, :]
            ST[slice(SCU * Nr, (SCU + 3) * Nr)] = cu_out[:, :]

        # ---- per-timestep prologue: gravity kick, park pre-step x,
        # xbar = x + dt v', M xbar
        @pl.when(jnp.logical_and(i == 0, p1 == 0))
        def _prologue():
            mass = plane(p2d_ref, PMASS)
            # gravity gated to real vertices (mass > 0): pad lanes
            # otherwise free-fall forever (round-4 soak finding on the
            # cloth kernel; same pattern here)
            for a in range(3):
                va = ST[srows(SV + a)] + jnp.where(
                    mass > 0, dt * gvec[a], 0.0
                )
                ST[srows(SV + a)] = va
                xst = ST[srows(SX + a)]
                ST[srows(SXT + a)] = xst
                xs = xst + dt * va
                ST[srows(SX + a)] = xs
                ST[srows(SMXB + a)] = mass * xs

        @pl.when(p1 == 0)
        def _reset_b():
            ST[slice(SB * Nr, (SB + 3) * Nr)] = jnp.zeros(
                (3 * Nr, LANES), ST.dtype
            )
            if collect_dual:
                ST[slice(SZC * Nr, (SZC + 3) * Nr)] = jnp.zeros(
                    (3 * Nr, LANES), ST.dtype
                )
            if collect:
                racc[0] = jnp.asarray(0.0, ST.dtype)

        # ---- chunk phase: gather -> local prox -> dual update -> scatter
        @pl.when(p1 < SOLVE)
        def _chunk():
            c = p1
            cf = pltpu.make_async_copy(fblk_hbm.at[c], FB, sem)
            cf.start()
            cf.wait()
            first = jnp.logical_and(st == 0, i == 0)

            @pl.when(first)
            def _din0():
                cd = pltpu.make_async_copy(
                    d_hbm.at[sc, c] if sweep else d_hbm.at[c], DB, sem
                )
                cd.start()
                cd.wait()

            @pl.when(jnp.logical_not(first))
            def _din():
                cd = pltpu.make_async_copy(
                    d_out.at[sc, c] if sweep else d_out.at[c], DB, sem
                )
                cd.start()
                cd.wait()

            rbase = rbase_ref[c]

            # window of live x rows shared by all halves
            xw = [
                ST[pl.ds((SX + a) * Nr + rbase, Wr), :] for a in range(3)
            ]
            BW[:, :] = jnp.zeros(((6 if collect_dual else 3) * Wr, LANES),
                                 BW.dtype)

            for h in range(halves):
                # gathered corner positions xg[k][a] (HS,128)
                cc = [FB[hrows(CCP0 + k, h)].astype(jnp.int32)
                      for k in range(4)]
                rr = [FB[hrows(RRP0 + k, h)] for k in range(4)]
                xg = [[jnp.zeros((HS, LANES), FB.dtype) for _ in range(3)]
                      for _ in range(4)]
                for k in range(4):
                    for r in range(Wr):
                        m = rr[k] == float(r)
                        for a in range(3):
                            t = jnp.take_along_axis(
                                jnp.broadcast_to(xw[a][r : r + 1, :],
                                                 (HS, LANES)),
                                cc[k], axis=1,
                            )
                            xg[k][a] = xg[k][a] + jnp.where(m, t, 0.0)

                cp = [FB[hrows(CP0 + p, h)] for p in range(12)]
                u = [DB[hrows(p, h)] for p in range(9)]
                f = []
                for a in range(3):
                    for b in range(3):
                        acc = u[3 * a + b]
                        for k in range(4):
                            acc = acc + cp[4 * b + k] * xg[k][a]
                        f.append(acc)

                eps = jnp.asarray(jnp.finfo(f[0].dtype).eps, f[0].dtype)
                U, V, s = _svd_columns(f, eps)

                up = [None] * 9
                if model in ("nh", "stvk"):
                    # warm-start guards (TetForce.cpp:339-347)
                    w1 = DB[hrows(9, h)]
                    w2_ = DB[hrows(10, h)]
                    neg3 = DB[hrows(11, h)] < 0.0
                    w3 = jnp.abs(DB[hrows(11, h)])
                    collapsed = (~neg3) & (
                        (jnp.abs(w1) < 1e-3) & (jnp.abs(w2_) < 1e-3)
                        & (jnp.abs(w3) < 1e-3)
                    )
                    w1 = jnp.where(collapsed, 1e-3, w1)
                    w2_ = jnp.where(collapsed, 1e-3, w2_)
                    w3 = jnp.where(collapsed, 1e-3, w3)
                    mu = matp(1, h)
                    lam = matp(2, h)
                    kp = matp(3, h)
                    x1, x2, x3 = _newton_hyper(
                        s, (w1, w2_, w3), mu, lam, kp, newton_iters, model
                    )
                    DB[hrows(9, h)] = x1
                    DB[hrows(10, h)] = x2
                    DB[hrows(11, h)] = x3
                    sig = (x1, x2, x3)
                    for r in range(3):
                        for c2 in range(3):
                            z = (
                                U[0][r] * sig[0] * V[0][c2]
                                + U[1][r] * sig[1] * V[1][c2]
                                + U[2][r] * sig[2] * V[2][c2]
                            )
                            up[3 * r + c2] = f[3 * r + c2] - z
                else:  # arap: sigma -> (1,1,±1); z = (k P + w2 F)/(w2 + k)
                    one = jnp.ones_like(s[0])
                    s3 = jnp.where(s[2] < 0, -one, one)
                    sig = (one, one, s3)
                    w2e = matp(0, h)
                    kp = matp(3, h)
                    mix = 1.0 / (w2e + jnp.where(w2e + kp > 0, kp, 1.0))
                    for r in range(3):
                        for c2 in range(3):
                            proj = (
                                U[0][r] * sig[0] * V[0][c2]
                                + U[1][r] * sig[1] * V[1][c2]
                                + U[2][r] * sig[2] * V[2][c2]
                            )
                            z = (kp * proj + w2e * f[3 * r + c2]) * mix
                            up[3 * r + c2] = f[3 * r + c2] - z
                if collect:
                    # primal piece ||W(Dx - z)||^2 = sum w2 (u' - u)^2
                    # (dual-update identity; System.cpp:64). Pad lanes
                    # have w2 = 0.
                    w2r = matp(0, h)
                    r2h = sum(
                        jnp.sum(w2r * (up[p] - u[p]) * (up[p] - u[p]))
                        for p in range(9)
                    )
                    racc[0] = racc[0] + r2h
                for p in range(9):
                    DB[hrows(p, h)] = up[p]

                # scatter b += w2 D^T (z - u'); (z - u') = F - 2 u'
                w2e = matp(0, h)
                zu = [w2e * (f[p] - 2.0 * up[p]) for p in range(9)]
                # dual residual needs D^T W^2 z too; z = F - u'
                zz = ([w2e * (f[p] - up[p]) for p in range(9)]
                      if collect_dual else None)
                for k in range(4):
                    Pk = FB[hrows(PP0 + k, h)].astype(jnp.int32)
                    rrp = FB[hrows(RRPP0 + k, h)]
                    for a in range(3):
                        acc = cp[4 * 0 + k] * zu[3 * a + 0]
                        for b in range(1, 3):
                            acc = acc + cp[4 * b + k] * zu[3 * a + b]
                        sp = jnp.take_along_axis(acc, Pk, axis=1)
                        if collect_dual:
                            acc2 = cp[4 * 0 + k] * zz[3 * a + 0]
                            for b in range(1, 3):
                                acc2 = acc2 + cp[4 * b + k] * zz[3 * a + b]
                            sp2 = jnp.take_along_axis(acc2, Pk, axis=1)
                        for vr in range(Wr):
                            m = rrp == float(vr)
                            add = jnp.sum(
                                jnp.where(m, sp, 0.0),
                                axis=0, keepdims=True,
                            )
                            BW[a * Wr + vr : a * Wr + vr + 1, :] += add
                            if collect_dual:
                                add2 = jnp.sum(
                                    jnp.where(m, sp2, 0.0),
                                    axis=0, keepdims=True,
                                )
                                BW[(3 + a) * Wr + vr :
                                   (3 + a) * Wr + vr + 1, :] += add2
            for a in range(3):
                ST[pl.ds((SB + a) * Nr + rbase, Wr), :] += BW[
                    a * Wr : (a + 1) * Wr, :
                ]
                if collect_dual:
                    ST[pl.ds((SZC + a) * Nr + rbase, Wr), :] += BW[
                        (3 + a) * Wr : (4 + a) * Wr, :
                    ]

            cd = pltpu.make_async_copy(
                DB, d_out.at[sc, c] if sweep else d_out.at[c], sem
            )
            cd.start()
            cd.wait()

        # ---- solve phase: anchors + floor + whole Jacobi-PCG dia solve
        @pl.when(p1 == SOLVE)
        def _solve():
            aw2 = plane(p2d_ref, PAW2)
            invd = plane(p2d_ref, PINVD)
            for a in range(3):
                ancz = plane(p2d_ref, PANCZ + a)
                dlt = ST[srows(SX + a)] - ancz  # = au' - au
                # gated: non-anchor lanes otherwise accumulate x - ancz
                # forever (unbounded dual state; round-4 soak fix class)
                au = jnp.where(aw2 > 0, ST[srows(SAU + a)] + dlt, 0.0)
                ST[srows(SAU + a)] = au
                ST[srows(SB + a)] += aw2 * (ancz - au)
                if collect_dual:
                    ST[srows(SZC + a)] += aw2 * ancz
                if collect:
                    racc[0] = racc[0] + jnp.sum(aw2 * dlt * dlt)

            if has_coll:
                vmask = plane(p2d_ref, PVM)
                zc = [
                    ST[srows(SX + a)] + ST[srows(SCU + a)] for a in range(3)
                ]
                # sequential declaration-order projection, matching the
                # general path (models/collision.py project) and the
                # reference loop (CollisionForce.cpp:53-70). Shapes are
                # static Python values -> the loop unrolls to vector ops
                for kind, prm in coll_shapes:
                    if kind == "floor":
                        zc[1] = jnp.maximum(zc[1], prm[0])
                    elif kind == "sphere":
                        cx, cy, cz, r = prm
                        dx = zc[0] - cx
                        dy = zc[1] - cy
                        dz = zc[2] - cz
                        d2 = dx * dx + dy * dy + dz * dz
                        inside = d2 < r * r
                        # at the exact center (d2=0) the general path
                        # leaves the point at the center; the huge rsqrt
                        # times zero displacement reproduces that
                        s_ = r * jax.lax.rsqrt(jnp.maximum(d2, 1e-30))
                        zc[0] = jnp.where(inside, cx + dx * s_, zc[0])
                        zc[1] = jnp.where(inside, cy + dy * s_, zc[1])
                        zc[2] = jnp.where(inside, cz + dz * s_, zc[2])
                    elif kind == "cylinder":  # axis ∥ z through (cx,cy)
                        cx, cy, r = prm
                        dx = zc[0] - cx
                        dy = zc[1] - cy
                        d2 = dx * dx + dy * dy
                        inside = d2 < r * r
                        s_ = r * jax.lax.rsqrt(jnp.maximum(d2, 1e-30))
                        zc[0] = jnp.where(inside, cx + dx * s_, zc[0])
                        zc[1] = jnp.where(inside, cy + dy * s_, zc[1])
                for a in range(3):
                    dlt = ST[srows(SX + a)] - zc[a]  # = cu' - cu
                    un = ST[srows(SCU + a)] + dlt
                    ST[srows(SCU + a)] = un
                    ST[srows(SB + a)] += coll_w2 * vmask * (zc[a] - un)
                    if collect_dual:
                        ST[srows(SZC + a)] += coll_w2 * vmask * zc[a]
                    if collect:
                        racc[0] = racc[0] + jnp.sum(
                            coll_w2 * vmask * dlt * dlt
                        )

            if collect:
                if sweep:
                    res_out[sc, st, i] = jnp.sqrt(racc[0])
                else:
                    res_out[st, i] = jnp.sqrt(racc[0])

            if uell_meta is not None:
                slot_qs = uell_meta["slot_qs"]
                fold_qs = uell_meta["fold_qs"]

                def uval(k):
                    vp = plane(dia_ref, k)
                    return (vp.astype(ST.dtype)
                            if vp.dtype != ST.dtype else vp)

                def ucc(k):
                    if uell_meta["packed"]:
                        w = plane(ucc_ref, k // 4)
                        sh = 8 * (k % 4)
                        if sh:
                            w = jax.lax.shift_right_logical(
                                w, jnp.int32(sh)
                            )
                        return jax.lax.bitwise_and(w, jnp.int32(0x7F))
                    return plane(ucc_ref, k)

                def rshift(xv, qq):
                    return (_row_shift_up(xv, qq, Nr) if qq >= 0
                            else _row_shift_down(xv, -qq, Nr))

                vmask_mv = plane(p2d_ref, PVM)

                # slots arrive grouped by q (core/uell.pack_uell emits
                # them in q order); scoping each shifted plane to its
                # group keeps at most ONE shifted copy of x live at a
                # time (a dict cache held ~2 MB of planes alive across
                # the whole slot loop and overflowed the VMEM stack)
                q_groups = []
                for k, qq in enumerate(slot_qs):
                    if q_groups and q_groups[-1][0] == qq:
                        q_groups[-1][1].append(k)
                    else:
                        q_groups.append((qq, [k]))

                def uell_mv(xv):
                    """A @ xv via per-row-offset ELL slots + layered fold
                    ops (core/uell.py format). The valid mask zeroes
                    copy/spare positions so the CG never sees phantom
                    dofs."""
                    acc = None
                    for qq, ks in q_groups:
                        sh = rshift(xv, qq)
                        for k in ks:
                            term = uval(k) * jnp.take_along_axis(
                                sh, ucc(k), axis=1
                            )
                            acc = term if acc is None else acc + term
                    kf = len(slot_qs)
                    for layer in fold_qs:
                        for qq in layer:
                            acc = acc + uval(kf) * jnp.take_along_axis(
                                rshift(acc, qq), ucc(kf), axis=1
                            )
                            kf += 1
                    return acc * vmask_mv

                def matvec(src_plane):
                    for a in range(3):
                        ST[srows(SAP + a)] = uell_mv(
                            ST[srows(src_plane + a)]
                        )
            else:
                def matvec(src_plane):
                    """A @ ST[src_plane..+3] into the SAP planes."""
                    for a in range(3):
                        xv = ST[srows(src_plane + a)]
                        acc = None
                        for d, off in enumerate(dia_offs):
                            term = plane(dia_ref, d) * _shifted(
                                xv, off, Nr, interpret
                            )
                            acc = term if acc is None else acc + term
                        ST[srows(SAP + a)] = acc

            if mg_meta is not None:
                # ---- in-kernel geometric multigrid preconditioner
                # (core/mg.py builds the planes; vcycle_np is the tested
                # numpy reference of this exact op sequence). All ops are
                # the kernel's own primitives: masked static-shift
                # matvecs, per-corner-mask transfers, one packed dense
                # MXU solve at the coarsest level. SV planes are dead
                # during ADMM iterations (the epilogue overwrites them),
                # so they hold z = M(r).
                l1_offs = mg_meta["l1_offs"]
                t0_offs = mg_meta["t0_offs"]
                t1_offs = mg_meta["t1_offs"]
                ranges = (mg_meta["rangesA"], mg_meta["rangesB"])
                d1 = len(l1_offs)
                R_OM0 = d1 * Nr
                R_OM1 = R_OM0 + Nr
                R_T0 = R_OM1 + Nr
                R_T1 = R_T0 + 8 * Nr
                R_PM = R_T1 + 8 * Nr          # pack masks (2 x Nr rows)
                R_UM = R_PM + 2 * Nr          # unpack masks (2 x Nr rows)

                def mgrow(base, ki, rows=Nr):
                    return slice(base + ki * rows, base + (ki + 1) * rows)

                def mv_fine(z):
                    acc = None
                    for dd, off in enumerate(dia_offs):
                        t = plane(dia_ref, dd) * _shifted(
                            z, off, Nr, interpret
                        )
                        acc = t if acc is None else acc + t
                    return acc

                def mv_l1(z):
                    acc = None
                    for dd, off in enumerate(l1_offs):
                        t = mgf_ref[mgrow(0, dd)] * _shifted(
                            z, off, Nr, interpret
                        )
                        acc = t if acc is None else acc + t
                    return acc

                def mg_restrict(x, base, offs):
                    acc = None
                    for ci, c in enumerate(offs):
                        t = mgf_ref[mgrow(base, ci)] * _shifted(
                            x, c, Nr, interpret
                        )
                        acc = t if acc is None else acc + t
                    return acc

                def mg_prolong(x, base, offs):
                    acc = None
                    for ci, c in enumerate(offs):
                        t = _shifted(
                            mgf_ref[mgrow(base, ci)] * x, -c, Nr, interpret
                        )
                        acc = t if acc is None else acc + t
                    return acc

                def vcycle(r):
                    om0 = mgf_ref[mgrow(R_OM0, 0)]
                    om1 = mgf_ref[mgrow(R_OM1, 0)]
                    z = om0 * r
                    r1 = mg_restrict(r - mv_fine(z), R_T0, t0_offs)
                    z1 = om1 * r1
                    r2 = mg_restrict(r1 - mv_l1(z1), R_T1, t1_offs)
                    # pack the coarsest residual to (NP2, 128): the
                    # rank-ordered coarse numbering makes c_row
                    # non-decreasing across fine rows, so TWO full-plane
                    # lane-gathers (assignments A/B) + static row-range
                    # sums suffice
                    rp_rows = [
                        jnp.zeros((1, LANES), r2.dtype)
                        for _ in range(NP2)
                    ]
                    for w in range(2):
                        if all(hi <= lo for lo, hi in ranges[w]):
                            continue  # no B-assignment rows (small nc2)
                        g = mgf_ref[mgrow(R_PM, w)] * jnp.take_along_axis(
                            r2, mgi_ref[mgrow(0, w)], axis=1
                        )
                        for cr, (lo, hi) in enumerate(ranges[w]):
                            if hi > lo:
                                rp_rows[cr] = rp_rows[cr] + jnp.sum(
                                    g[lo:hi, :], axis=0, keepdims=True
                                )
                    rp = jnp.concatenate(rp_rows, 0)
                    # exact coarse solve: 16 (1,128)@(128,128) MXU blocks
                    zrows = []
                    for tr in range(NP2):
                        acc = None
                        for sr in range(NP2):
                            blk = a2b_ref[
                                (sr * 4 + tr) * LANES:
                                (sr * 4 + tr + 1) * LANES, :
                            ]
                            t = jnp.dot(
                                rp[sr:sr + 1, :], blk,
                                preferred_element_type=r2.dtype,
                            )
                            acc = t if acc is None else acc + t
                        zrows.append(acc)
                    zp = jnp.concatenate(zrows, 0)
                    # unpack: static row-range broadcasts + two
                    # full-plane lane-gathers (transpose of pack)
                    z2 = None
                    for w in range(2):
                        if all(hi <= lo for lo, hi in ranges[w]):
                            continue
                        segs = []
                        row = 0
                        for cr, (lo, hi) in enumerate(ranges[w]):
                            if hi > lo:
                                if lo > row:
                                    segs.append(jnp.zeros(
                                        (lo - row, LANES), zp.dtype
                                    ))
                                segs.append(jnp.broadcast_to(
                                    zp[cr:cr + 1, :], (hi - lo, LANES)
                                ))
                                row = hi
                        if row < Nr:
                            segs.append(jnp.zeros(
                                (Nr - row, LANES), zp.dtype
                            ))
                        exp = jnp.concatenate(segs, 0)
                        t = mgf_ref[mgrow(R_UM, w)] * jnp.take_along_axis(
                            exp, mgi_ref[mgrow(0, 2 + w)], axis=1
                        )
                        z2 = t if z2 is None else z2 + t
                    z1 = z1 + mg_prolong(z2, R_T1, t1_offs)
                    z1 = z1 + om1 * (r1 - mv_l1(z1))
                    z = z + mg_prolong(z1, R_T0, t0_offs)
                    z = z + om0 * (r - mv_fine(z))
                    return z

                def apply_M():
                    for a in range(3):
                        ST[srows(SV + a)] = vcycle(ST[srows(SB + a)])

            if uamg_meta is not None:
                # ---- in-kernel ALGEBRAIC multigrid (unstructured / uell
                # meshes; core/uamg.py builds the planes and vcycle_np is
                # the tested numpy reference of this exact op sequence).
                # Fine smoothing/residuals reuse uell_mv; the level-1
                # Galerkin operator is a second (small) uell packing over
                # a compact coarse layout; transfers are full-plane
                # lane-gathers + static row-range sums/broadcasts; the
                # coarsest level is a packed dense MXU solve.
                segs0 = uamg_meta["segs0"]
                segs1 = uamg_meta["segs1"]
                l1_slot_qs = uamg_meta["l1_slot_qs"]
                l1_fold_qs = uamg_meta["l1_fold_qs"]
                NP2u = uamg_meta["np2"]
                NC = uamg_meta["nc_rows"]
                O0, O1 = len(segs0), len(segs1)
                # mgf (float) row layout
                F_R0M = Nr
                F_P0M = F_R0M + O0 * Nr
                F_OM1 = F_P0M + O0 * Nr
                F_VM1 = F_OM1 + NC
                F_R1M = F_VM1 + NC
                F_P1M = F_R1M + O1 * NC
                F_L1V = F_P1M + O1 * NC
                # mgi (int32) row layout
                I_P0 = O0 * Nr
                I_R1 = 2 * O0 * Nr
                I_P1 = I_R1 + O1 * NC
                I_L1 = I_P1 + O1 * NC

                def fsl(base, k, rows):
                    return slice(base + k * rows, base + (k + 1) * rows)

                def rshift_c(xv, qq):
                    return (_row_shift_up(xv, qq, NC) if qq >= 0
                            else _row_shift_down(xv, -qq, NC))

                l1_groups = []
                for k, qq in enumerate(l1_slot_qs):
                    if l1_groups and l1_groups[-1][0] == qq:
                        l1_groups[-1][1].append(k)
                    else:
                        l1_groups.append((qq, [k]))

                def l1_mv(xc):
                    acc = None
                    for qq, ks in l1_groups:
                        sh = rshift_c(xc, qq)
                        for k in ks:
                            term = mgf_ref[fsl(F_L1V, k, NC)] \
                                * jnp.take_along_axis(
                                    sh, mgi_ref[fsl(I_L1, k, NC)], axis=1
                                )
                            acc = term if acc is None else acc + term
                    kf = len(l1_slot_qs)
                    for layer in l1_fold_qs:
                        for qq in layer:
                            acc = acc + mgf_ref[fsl(F_L1V, kf, NC)] \
                                * jnp.take_along_axis(
                                    rshift_c(acc, qq),
                                    mgi_ref[fsl(I_L1, kf, NC)], axis=1
                                )
                            kf += 1
                    return acc * mgf_ref[F_VM1:F_VM1 + NC]

                def apply_Ru(src, mbase, ibase, segs, Ns_rows, Nt):
                    rows = [
                        jnp.zeros((1, LANES), src.dtype)
                        for _ in range(Nt)
                    ]
                    for k, seg in enumerate(segs):
                        g = mgf_ref[fsl(mbase, k, Ns_rows)] \
                            * jnp.take_along_axis(
                                src, mgi_ref[fsl(ibase, k, Ns_rows)],
                                axis=1,
                            )
                        for (tr, lo, hi) in seg:
                            rows[tr] = rows[tr] + jnp.sum(
                                g[lo:hi], axis=0, keepdims=True
                            )
                    return jnp.concatenate(rows, 0)

                def apply_Pu(z, mbase, ibase, segs, Ns_rows):
                    out = None
                    for k, seg in enumerate(segs):
                        pieces, row = [], 0
                        for (tr, lo, hi) in sorted(
                                seg, key=lambda t3: t3[1]):
                            if lo > row:
                                pieces.append(jnp.zeros(
                                    (lo - row, LANES), z.dtype
                                ))
                            pieces.append(jnp.broadcast_to(
                                z[tr:tr + 1, :], (hi - lo, LANES)
                            ))
                            row = hi
                        if row < Ns_rows:
                            pieces.append(jnp.zeros(
                                (Ns_rows - row, LANES), z.dtype
                            ))
                        exp = jnp.concatenate(pieces, 0)
                        t = mgf_ref[fsl(mbase, k, Ns_rows)] \
                            * jnp.take_along_axis(
                                exp, mgi_ref[fsl(ibase, k, Ns_rows)],
                                axis=1,
                            )
                        out = t if out is None else out + t
                    return out

                def coarse_solve(rp):
                    zrows = []
                    for tr in range(NP2u):
                        acc = None
                        for sr in range(NP2u):
                            blk = a2b_ref[
                                (sr * NP2u + tr) * LANES:
                                (sr * NP2u + tr + 1) * LANES, :
                            ]
                            t = jnp.dot(
                                rp[sr:sr + 1, :], blk,
                                preferred_element_type=rp.dtype,
                            )
                            acc = t if acc is None else acc + t
                        zrows.append(acc)
                    return jnp.concatenate(zrows, 0)

                def vcycle_u(r):
                    om0 = mgf_ref[0:Nr]
                    om1 = mgf_ref[F_OM1:F_OM1 + NC]
                    z = om0 * r
                    res = r - uell_mv(z)
                    r1 = apply_Ru(res, F_R0M, 0, segs0, Nr, NC)
                    z1 = om1 * r1
                    res1 = r1 - l1_mv(z1)
                    rp = apply_Ru(res1, F_R1M, I_R1, segs1, NC, NP2u)
                    z2 = apply_Pu(coarse_solve(rp), F_P1M, I_P1,
                                  segs1, NC)
                    z1 = z1 + z2
                    z1 = z1 + om1 * (r1 - l1_mv(z1))
                    z = z + apply_Pu(z1, F_P0M, I_P0, segs0, Nr)
                    z = z + om0 * (r - uell_mv(z))
                    return z

                def apply_M():
                    for a in range(3):
                        ST[srows(SV + a)] = vcycle_u(ST[srows(SB + a)])

            if collect_dual:
                # s = dt^2 ||D^T W^2 (z - z_prev)|| (System.cpp:65). At
                # iteration 0 the previous z is the step's z init
                # z_prev = D x_pre (System.cpp:43), whose transpose image
                # is recovered algebraically from planes the kernel
                # already holds: D^T W^2 D x = (A_hat - M) x / dt^2.
                @pl.when(i == 0)
                def _seed_zprev():
                    matvec(SXT)
                    massp = plane(p2d_ref, PMASS)
                    for a in range(3):
                        ST[srows(SZP + a)] = (
                            ST[srows(SAP + a)]
                            - massp * ST[srows(SXT + a)]
                        ) * (1.0 / dt2)

                sd = sum(
                    jnp.sum(
                        (ST[srows(SZC + a)] - ST[srows(SZP + a)]) ** 2
                    )
                    for a in range(3)
                )
                if sweep:
                    rd_out[sc, st, i] = dt2 * jnp.sqrt(sd)
                else:
                    rd_out[st, i] = dt2 * jnp.sqrt(sd)
                for a in range(3):
                    ST[srows(SZP + a)] = ST[srows(SZC + a)]

            matvec(SX)
            for a in range(3):
                r_ = (
                    ST[srows(SMXB + a)] + dt2 * ST[srows(SB + a)]
                    - ST[srows(SAP + a)]
                )
                ST[srows(SB + a)] = r_  # b is dead; reuse as CG residual
                if not precond:
                    ST[srows(SP_ + a)] = invd * r_
            if precond:
                apply_M()
                for a in range(3):
                    ST[srows(SP_ + a)] = ST[srows(SV + a)]
                rz0 = sum(
                    jnp.sum(ST[srows(SB + a)] * ST[srows(SV + a)])
                    for a in range(3)
                )
            else:
                rz0 = sum(
                    jnp.sum(ST[srows(SB + a)] * ST[srows(SP_ + a)])
                    for a in range(3)
                )

            def body(_, rz):
                matvec(SP_)
                pAp = sum(
                    jnp.sum(ST[srows(SP_ + a)] * ST[srows(SAP + a)])
                    for a in range(3)
                )
                alpha = rz / jnp.where(pAp > 0, pAp, 1.0)
                for a in range(3):
                    ST[srows(SX + a)] += alpha * ST[srows(SP_ + a)]
                    ST[srows(SB + a)] -= alpha * ST[srows(SAP + a)]
                if precond:
                    apply_M()
                    rz_new = sum(
                        jnp.sum(ST[srows(SB + a)] * ST[srows(SV + a)])
                        for a in range(3)
                    )
                    beta = rz_new / jnp.where(rz > 0, rz, 1.0)
                    for a in range(3):
                        ST[srows(SP_ + a)] = (
                            ST[srows(SV + a)] + beta * ST[srows(SP_ + a)]
                        )
                    return rz_new
                rz_new = sum(
                    jnp.sum(ST[srows(SB + a)] * invd * ST[srows(SB + a)])
                    for a in range(3)
                )
                beta = rz_new / jnp.where(rz > 0, rz, 1.0)
                for a in range(3):
                    ST[srows(SP_ + a)] = (
                        invd * ST[srows(SB + a)] + beta * ST[srows(SP_ + a)]
                    )
                return rz_new

            jax.lax.fori_loop(0, cg_iters, body, rz0)

            # per-timestep epilogue on the last ADMM iteration
            @pl.when(i == n_iters - 1)
            def _epilogue():
                for a in range(3):
                    vn = (ST[srows(SX + a)] - ST[srows(SXT + a)]) * (1.0 / dt)
                    ST[srows(SV + a)] = vn
                    v_out[srows(a)] = vn
                    x_out[srows(a)] = ST[srows(SX + a)]
                    au_out[srows(a)] = ST[srows(SAU + a)]
                    cu_out[srows(a)] = ST[srows(SCU + a)]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "dia_offs", "model", "newton_iters", "cg_iters", "dt", "dt2",
        "gvec", "n_iters", "n_steps", "Wr", "coll_shapes", "coll_w2",
        "halves", "interpret", "uell_meta_static", "n_scen", "collect",
        "mg_meta_static", "uamg_meta_static",
    ),
    donate_argnums=(10,),
)
def _banded_call(p2d, dia2d, ucc2d, rbase, fblk, matv, x0, v0, au0, cu0, d,
                 mgf, mgi, a2b,
                 dia_offs, model, newton_iters, cg_iters, dt, dt2, gvec,
                 n_iters, n_steps, Wr, coll_shapes, coll_w2, halves,
                 interpret, uell_meta_static, n_scen, collect,
                 mg_meta_static, uamg_meta_static):
    sweep = n_scen is not None
    collect_dual = collect == "full"
    collect = bool(collect)
    Nr = x0.shape[-2] // 3
    n_chunks = fblk.shape[0]
    uell_meta = None
    if uell_meta_static is not None:
        slot_qs, fold_qs, packed = uell_meta_static
        uell_meta = {
            "slot_qs": slot_qs, "fold_qs": fold_qs, "packed": packed,
        }
    mg_meta = None
    if mg_meta_static is not None:
        if sweep or uell_meta is not None:
            raise NotImplementedError(
                "in-kernel multigrid: dia mode, non-sweep only"
            )
        l1_offs, t0_offs, t1_offs, rangesA, rangesB = mg_meta_static
        mg_meta = {
            "l1_offs": l1_offs, "t0_offs": t0_offs,
            "t1_offs": t1_offs, "rangesA": rangesA, "rangesB": rangesB,
        }
    uamg_meta = None
    if uamg_meta_static is not None:
        if sweep or uell_meta is None or mg_meta is not None:
            raise NotImplementedError(
                "in-kernel algebraic multigrid: uell mode, non-sweep only"
            )
        segs0, segs1, l1_slot_qs, l1_fold_qs, np2u, nc_rows = \
            uamg_meta_static
        uamg_meta = {
            "segs0": segs0, "segs1": segs1, "l1_slot_qs": l1_slot_qs,
            "l1_fold_qs": l1_fold_qs, "np2": np2u, "nc_rows": nc_rows,
        }
    kern = _make_banded_kernel(
        Nr, Wr, n_chunks, n_iters, dia_offs, model, newton_iters,
        cg_iters, dt, dt2, gvec, coll_shapes, coll_w2, halves, interpret,
        uell_meta, sweep=sweep, collect=collect, collect_dual=collect_dual,
        mg_meta=mg_meta, uamg_meta=uamg_meta,
    )
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    sm = pl.BlockSpec(memory_space=pltpu.SMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    if sweep:
        grid = (n_scen, n_steps, n_iters, n_chunks + 1)

        def scb(shape):
            """Per-scenario VMEM block of a (S, ...) array."""
            return pl.BlockSpec(
                (None,) + shape, lambda sc, st, i, c: (sc,) + (0,) * len(shape)
            )

        matv_spec = pl.BlockSpec(
            (None, None, 4 * SUB, LANES),
            lambda sc, st, i, c: (sc, jnp.minimum(c, n_chunks - 1), 0, 0),
        )
        in_specs = [scb(p2d.shape[1:]), scb(dia2d.shape[1:]), vm, sm, hbm,
                    matv_spec, scb(x0.shape[1:]), scb(v0.shape[1:]),
                    scb(au0.shape[1:]), scb(cu0.shape[1:]), hbm]
        out_specs = [scb(x0.shape[1:]), scb(v0.shape[1:]), hbm,
                     scb(au0.shape[1:]), scb(cu0.shape[1:])]
    else:
        grid = (n_steps, n_iters, n_chunks + 1)
        in_specs = [vm, vm, vm, sm, hbm, vm, hbm, hbm, hbm, hbm, hbm]
        out_specs = [vm, vm, hbm, vm, vm]
    operands = (p2d, dia2d, ucc2d, rbase, fblk, matv,
                x0, v0, au0, cu0, d)
    if mg_meta is not None or uamg_meta is not None:
        in_specs = in_specs + [vm, vm, vm]
        operands = operands + (mgf, mgi, a2b)
    res_dims = ((n_scen, n_steps, n_iters) if sweep
                else (n_steps, n_iters))
    sm_out = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    res_shapes = [
        # per-(step, ADMM iteration) primal residual (leading scenario
        # axis in sweep mode); written only when collect (garbage
        # otherwise — callers discard)
        jax.ShapeDtypeStruct(res_dims, x0.dtype),
    ]
    if collect_dual:
        # per-(step, ADMM iteration) dual residual
        sm_out = sm_out + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        res_shapes = res_shapes + [
            jax.ShapeDtypeStruct(res_dims, x0.dtype)
        ]
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs + sm_out,
        out_shape=[
            jax.ShapeDtypeStruct(x0.shape, x0.dtype),
            jax.ShapeDtypeStruct(v0.shape, v0.dtype),
            jax.ShapeDtypeStruct(d.shape, d.dtype),
            jax.ShapeDtypeStruct(au0.shape, au0.dtype),
            jax.ShapeDtypeStruct(cu0.shape, cu0.dtype),
        ] + res_shapes,
        input_output_aliases={10: 2},
        scratch_shapes=[
            pltpu.VMEM(((STATE_PLANES + (6 if collect_dual else 0)) * Nr,
                        LANES), x0.dtype),
            pltpu.VMEM((FB_PLANES * SUB, LANES), x0.dtype),
            pltpu.VMEM((DB_PLANES * SUB, LANES), x0.dtype),
            pltpu.VMEM(((6 if collect_dual else 3) * Wr, LANES), x0.dtype),
            pltpu.SMEM((1,), x0.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        # the default scoped-VMEM cap is 16 MB — a compiler pipelining
        # default, not the hardware (v5e has 128 MB/core). This kernel IS
        # the whole program while it runs, so claim most of the chip's
        # VMEM; the uell value/lane planes at 100k-tet scale need it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(*operands)
    return out


def banded_rollout(p2d, dia2d, rbase, fblk, x0, v0, au0, cu0, d, *,
                   dia_offs, model, newton_iters, cg_iters, dt, gravity,
                   n_iters, n_steps, Wr, floor_y=None, floor_w2=0.0,
                   coll_shapes=None, coll_w2=None,
                   halves=None, interpret=None, ucc2d=None,
                   uell_slot_qs=None, uell_fold_qs=None,
                   uell_packed=False, matv=None, n_scen=None,
                   collect_residuals=False,
                   mgf=None, mgi=None, a2b=None, mg_meta_static=None,
                   uamg_meta_static=None):
    """n_steps whole timesteps in ONE kernel call.

    collect_residuals: "primal" also returns the per-(step, iteration)
    PRIMAL residual ||W(Dx - z)|| (computed in-kernel via the
    dual-update identity at ~zero cost); the return gains a
    (n_steps, n_iters) array. True additionally returns the DUAL
    residual ||dt^2 D^T W^2 (z - z_prev)|| (System.cpp:65) as a second
    (n_steps, n_iters) array — this one costs a second scatter
    accumulation per iteration (D^T W^2 z into dedicated vertex planes,
    differenced against the previous iteration's).

    p2d: (7*Nr,128) packed vertex planes [aw2, 1/diag, mass, vmask,
    ancz xyz]; dia2d: (D*Nr,128); rbase: (n_chunks,) int32 window base
    rows; fblk: (n_chunks, 32*64, 128) static element planes; x0/v0/
    au0/cu0: (3*Nr,128); d: (n_chunks, 12*64, 128) duals+warm. Returns
    (x, v, d, ancu, colu). Layouts are built by core/banded.BandedStepper.

    halves: row-half chunking factor for the local-step body (1, 2 or 4;
    bit-identical results). Default: 2 at >=8 chunks (the 16 MB
    scoped-VMEM stack limit binds at large scale), else 1.

    SWEEP mode (n_scen=S): run S independent scenarios of the SAME
    topology in one kernel (a leading scenario grid axis; each scenario
    is the identical single-scenario program). Per-scenario arrays gain
    a leading S axis: p2d, dia2d (matrix values), x0/v0/au0/cu0, d, and
    `matv` (S, n_chunks, 4*SUB, 128) — per-scenario element material
    planes [w2, mu, lam, k] (padding lanes: w2=0, mu=lam=k=1). Topology
    planes (fblk/ucc2d/rbase) stay shared.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if halves is None:
        halves = 2 if fblk.shape[0] >= 8 else 1
    # floor_y/floor_w2 are kept as sugar for the single-floor case;
    # coll_shapes generalizes to any static list of
    # ('floor',(y,)) | ('sphere',(cx,cy,cz,r)) | ('cylinder',(cx,cy,r))
    # applied in declaration order with one shared weight coll_w2
    if coll_shapes is None:
        coll_shapes = (
            (("floor", (float(floor_y),)),) if floor_y is not None else ()
        )
        coll_w2 = float(floor_w2)
    else:
        coll_shapes = tuple(
            (str(k), tuple(float(q) for q in prm)) for k, prm in coll_shapes
        )
        coll_w2 = float(coll_w2 if coll_w2 is not None else floor_w2)
    if uell_slot_qs is not None:
        uell_meta_static = (
            tuple(int(q) for q in uell_slot_qs),
            tuple(tuple(int(q) for q in layer) for layer in uell_fold_qs),
            bool(uell_packed),
        )
    else:
        uell_meta_static = None
        ucc2d = jnp.zeros((1, LANES), jnp.int32)
    if n_scen is None:
        matv = jnp.zeros((8, LANES), x0.dtype)  # unused dummy
    elif matv is None:
        raise ValueError("sweep mode (n_scen) requires matv planes")
    if mg_meta_static is None and uamg_meta_static is None:
        mgf = jnp.zeros((8, LANES), x0.dtype)
        mgi = jnp.zeros((8, LANES), jnp.int32)
        a2b = jnp.zeros((8, LANES), x0.dtype)
    out = _banded_call(
        p2d, dia2d, ucc2d, rbase, fblk, matv, x0, v0, au0, cu0, d,
        mgf, mgi, a2b,
        dia_offs=tuple(int(o) for o in dia_offs), model=str(model),
        newton_iters=int(newton_iters), cg_iters=int(cg_iters),
        dt=float(dt), dt2=float(dt) ** 2,
        gvec=tuple(float(q) for q in gravity),
        n_iters=int(n_iters), n_steps=int(n_steps), Wr=int(Wr),
        coll_shapes=coll_shapes,
        coll_w2=coll_w2, halves=int(halves),
        interpret=bool(interpret), uell_meta_static=uell_meta_static,
        n_scen=None if n_scen is None else int(n_scen),
        collect=("full" if collect_residuals is True
                 else ("primal" if collect_residuals else False)),
        mg_meta_static=mg_meta_static,
        uamg_meta_static=uamg_meta_static,
    )
    return out if collect_residuals else out[:5]
