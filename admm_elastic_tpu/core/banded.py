"""Banded-mesh fast path: whole-timestep single-kernel ADMM for ARBITRARY
banded tet meshes with per-element materials.

Generalizes the lattice fast path (core/lattice.py): no constant-offset
selector structure is required, only that the vertex numbering keeps the
global matrix's sparsity on a bounded set of diagonals (the same condition
as the single-kernel dia CG) and that each element's vertices fit a bounded
window of the numbering (elements sorted by minimum vertex index).

Host-side preparation (this module) packs the mesh for the kernel
(ops/pallas/banded_step.py):

1. `place_elements` sorts tets by min vertex index and packs them into
   sub-blocks of 128 with DISTINCT target lanes per corner slot — the
   property that turns the kernel's scatter into a conflict-free lane
   permutation. Packing is a sequential first-fit greedy with a 4x4
   corner->slot matching per element (corner order within a tet is a
   dummy index, so relabeling is free); a bounded lookback keeps
   elements near their sorted position, bounding the vertex window.
2. Sub-blocks are grouped 64 per chunk; per-chunk vertex windows (base row
   + static width Wr) cover every referenced vertex.
3. Per-chunk planes: selector coefficients, w2/mu/lam/k, window row/lane
   decompositions of the corner indices, the scatter lane permutation and
   its permuted target rows (see banded_step.py FB plane map).

Trajectories match the general System dia path to round-off
(tests/test_banded.py).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

LANES = 128
SUB = 64            # sub-blocks per chunk (chunk = 8192 elements)
MAX_WR = 40         # max vertex-window rows (gather scan length bound)
MAX_DIAGONALS = 48  # same budget as the dia solver


MAX_OPEN = 16  # greedy lookback in blocks (bounds window skew)


def _match_slots(bits, o):
    """Assign each of 4 corner lane bitmasks `bits` an exclusive slot of
    occupancy `o` (slot s usable for corner k iff o[s] & bits[k] == 0).
    Returns a 4-tuple slot assignment or None. Tiny DFS (4x4 matching);
    corner order within a tet is a dummy summation index, so any
    assignment is physically equivalent (F = sum_k cp[:,k] x[idx[k]])."""
    assign = [-1, -1, -1, -1]
    used = 0

    def dfs(k):
        nonlocal used
        if k == 4:
            return True
        for s in range(4):
            if not (used >> s) & 1 and not (o[s] & bits[k]):
                assign[k] = s
                used |= 1 << s
                if dfs(k + 1):
                    return True
                used &= ~(1 << s)
        return False

    return tuple(assign) if dfs(0) else None


def place_elements(idx):
    """Pack elements (sorted by min vertex index) into sub-blocks of 128
    such that within each sub-block every corner slot's 128 target lanes
    (vertex % 128) are distinct. Returns (subs, perm):
    subs (n_sub, 128) int64 element ids (-1 pads); perm (E, 4) int8 the
    corner->slot relabeling chosen per element (apply as idx[e, perm[e]]
    / coeff[e, :, perm[e]] — exactly the freedom that makes the packing
    tight: a cell's tets share vertices at the SAME canonical corner, but
    any corner can serve any slot).

    Sequential first-fit greedy over the sorted order with a 4x4 slot
    matching per candidate block; a lookback bound keeps every element
    near its sorted position, bounding the per-chunk vertex window. When
    the WHOLE mesh fits in the kernel's MAX_WR-row gather window there is
    no skew cost, so the lookback is unlimited (this is what keeps
    small/medium meshes tightly packed: their padding is driven by
    lane-class capacity, not ordering)."""
    idx = np.asarray(idx, np.int64)
    E = len(idx)
    order = np.argsort(idx.min(axis=1), kind="stable")
    lanes = (idx % LANES).astype(np.int64)
    n_rows = int(idx.max()) // LANES + 1
    lookback = E if n_rows <= MAX_WR else MAX_OPEN
    perm = np.zeros((E, 4), np.int8)
    blocks = []  # element-id lists
    occ = []     # per-block [slot0..slot3] lane bitmasks
    counts = []
    for e in order:
        bits = [1 << int(l) for l in lanes[e]]
        placed = False
        for bi in range(max(0, len(blocks) - lookback), len(blocks)):
            if counts[bi] == LANES:
                continue
            o = occ[bi]
            a = _match_slots(bits, o)
            if a is not None:
                blocks[bi].append(e)
                counts[bi] += 1
                for k in range(4):
                    o[a[k]] |= bits[k]
                # slot s takes corner inv(a)[s]: idx[e, perm[e]] is in
                # slot order
                pe = perm[e]
                for k in range(4):
                    pe[a[k]] = k
                placed = True
                break
        if not placed:
            blocks.append([e])
            counts.append(1)
            occ.append(list(bits))
            perm[e] = (0, 1, 2, 3)
    subs = np.asarray(
        [blk + [-1] * (LANES - len(blk)) for blk in blocks], np.int64
    )
    return subs, perm


class BandedStepper:
    """Single-kernel ADMM stepper for banded tet meshes.

    Matches System dia-path semantics for: one tet force — NeoHookean/StVK
    `HyperElasticTet` (per-element mu/lam, `newton_iters` warm-started
    local Newton iterations) or `LinearTetStrain` (model='arap') —
    StaticAnchors with per-node weights, an optional CollisionForce of
    analytic shapes (floor/sphere/cylinder, declaration-order projection),
    gravity velocity kicks, and the dia global solve with `cg_iters` fixed
    Jacobi-PCG iterations.

    All array arguments are in the INTERNAL vertex numbering (the caller
    applies any renumbering; see banded_from_system).
    """

    model_name = "banded"

    def __init__(self, vertices, masses, tet_idx, tet_coeff, tet_w2,
                 tet_mu, tet_lam, tet_k, model, newton_iters,
                 anchor_idx, anchor_w2, anchor_pos,
                 dia_offs, dia_vals, diag,
                 gravity=(0.0, -9.8, 0.0), dt=0.04, admm_iters=10,
                 cg_iters=25, dtype=jnp.float32,
                 floor_y=None, floor_w2=0.0,
                 coll_shapes=None, coll_w2=None,
                 positions=None, uell=None, collect_residuals=False,
                 mg=None, uamg=None):
        v = np.asarray(vertices, np.float64)
        n = len(v)
        E = len(tet_idx)
        self.n_nodes = n
        self.dt = float(dt)
        self.admm_iters = int(admm_iters)
        self.cg_iters = int(cg_iters)
        self.newton_iters = int(newton_iters)
        self.dtype = dtype
        self.model = str(model)
        # in-kernel per-iteration residual emission: "primal" emits the
        # primal residual (near-free: dual-update identity over planes
        # already in registers); True additionally emits the DUAL
        # residual via a second scatter accumulation
        self.collect_residuals = (
            collect_residuals if collect_residuals in (True, "primal")
            else bool(collect_residuals)
        )
        #: (n_steps, admm_iters) primal residuals of the last step()/run()
        #: window when collect_residuals is on
        self.last_primal = None
        #: (n_steps, admm_iters) dual residuals (collect_residuals=True)
        self.last_dual = None
        self.gravity = tuple(float(q) for q in gravity)
        # static analytic collision shapes, declaration-order projected
        # in-kernel (floor/sphere/cylinder); floor_y/floor_w2 are the
        # single-floor sugar form
        if coll_shapes is None:
            coll_shapes = ((("floor", (float(floor_y),)),)
                           if floor_y is not None else ())
            coll_w2 = float(floor_w2)
        self.coll_shapes = tuple(
            (str(k), tuple(float(q) for q in prm)) for k, prm in coll_shapes
        )
        self.coll_w2 = float(coll_w2 if coll_w2 is not None else floor_w2)
        if self.model not in ("nh", "stvk", "arap"):
            raise ValueError(f"unknown banded model {self.model!r}")
        if len(dia_offs) > MAX_DIAGONALS:
            raise ValueError("too many diagonals for the banded kernel")

        idx = np.asarray(tet_idx, np.int64).reshape(E, 4)
        coeff = np.asarray(tet_coeff, np.float64).reshape(E, 3, 4)
        w2 = np.broadcast_to(np.asarray(tet_w2, np.float64), (E,))
        mu = np.broadcast_to(np.asarray(tet_mu, np.float64), (E,))
        lam = np.broadcast_to(np.asarray(tet_lam, np.float64), (E,))
        kp = np.broadcast_to(np.asarray(tet_k, np.float64), (E,))

        # diluted vertex layout (unstructured / uell mode): every vertex
        # plane is indexed by positions[v]; copy/spare slots are padding
        if positions is None:
            self._positions = np.arange(n, dtype=np.int64)
            N = -(-n // (8 * LANES)) * (8 * LANES)
        else:
            self._positions = np.asarray(positions, np.int64)
            assert uell is not None, "positions requires uell planes"
            N = int(uell["n_pad"])
        self._uell = uell
        idx = self._positions[idx]
        self.N = N
        Nr = N // LANES
        self.Nr = Nr

        # ---- element placement + chunking (with per-element corner->slot
        # relabeling; physically equivalent, see place_elements)
        subs, perm = place_elements(idx)  # (n_sub, 128), (E, 4)
        idx = np.take_along_axis(idx, perm.astype(np.int64), axis=1)
        coeff = np.take_along_axis(coeff, perm[:, None, :].astype(np.int64),
                                   axis=2)
        n_sub = len(subs)
        n_chunks = -(-n_sub // SUB)
        subs = np.pad(subs, ((0, n_chunks * SUB - n_sub), (0, 0)),
                      constant_values=-1)
        self.n_chunks = n_chunks
        # chunk -> element-id map (pads -1), kept for per-scenario
        # material-plane refills (core/sweep.SweepStepper)
        self._subs = subs.reshape(n_chunks, SUB, LANES)

        rbase = np.zeros(n_chunks, np.int32)
        wr_need = 1
        for c in range(n_chunks):
            block = subs[c * SUB : (c + 1) * SUB]
            es = block[block >= 0]
            if not len(es):
                continue
            vs = idx[es]
            rb = (int(vs.min()) // LANES) // 8 * 8
            rbase[c] = rb
            wr_need = max(wr_need, int(vs.max()) // LANES - rb + 1)
        Wr = -(-wr_need // 8) * 8
        if Wr > MAX_WR:
            raise ValueError(
                f"vertex window {Wr} rows exceeds MAX_WR={MAX_WR} — "
                "numbering bandwidth too large for the banded kernel"
            )
        self.Wr = Wr

        # ---- per-chunk static planes (banded_step.FB layout)
        from ..ops.pallas.banded_step import (
            CCP0, CP0, FB_PLANES, KP, LAMP, MUP, PP0, RRP0, RRPP0, W2P,
        )

        fblk = np.zeros((n_chunks, FB_PLANES * SUB, LANES), np.float64)
        for c in range(n_chunks):
            block = subs[c * SUB : (c + 1) * SUB]  # (SUB, 128)
            real = block >= 0
            e = np.where(real, block, 0)
            rowof = lambda p: slice(p * SUB, (p + 1) * SUB)

            def setp(p, vals):
                fblk[c, rowof(p)] = np.where(real, vals, 0.0)

            for b in range(3):
                for k in range(4):
                    setp(CP0 + 4 * b + k, coeff[e, b, k])
            setp(W2P, w2[e])
            # pad material lanes get benign values (their w2 is 0)
            fblk[c, rowof(MUP)] = np.where(real, mu[e], 1.0)
            fblk[c, rowof(LAMP)] = np.where(real, lam[e], 1.0)
            fblk[c, rowof(KP)] = np.where(real, kp[e], 1.0)
            for k in range(4):
                rr = idx[e, k] // LANES - rbase[c]
                cc = idx[e, k] % LANES
                fblk[c, rowof(RRP0 + k)] = np.where(real, rr, 0)
                fblk[c, rowof(CCP0 + k)] = np.where(real, cc, 0)
                # scatter permutation: out-lane cc[j,l] <- element lane l
                P = np.zeros((SUB, LANES), np.int64)
                rrp = np.full((SUB, LANES), -1.0)
                jj, ll = np.nonzero(real)
                P[jj, cc[jj, ll]] = ll
                rrp[jj, cc[jj, ll]] = rr[jj, ll]
                fblk[c, rowof(PP0 + k)] = P
                fblk[c, rowof(RRPP0 + k)] = rrp

        self._fblk = jnp.asarray(fblk, dtype)
        self._rbase = jnp.asarray(rbase, jnp.int32)

        # ---- packed vertex planes + diagonals (2D row-major layout);
        # per-vertex values land at their (possibly diluted) positions
        def to2d(plane, fill=0.0):
            full = np.full(N, fill, np.float64)
            full[self._positions] = np.broadcast_to(
                np.asarray(plane, np.float64), (n,)
            )
            return full.reshape(Nr, LANES)

        aw2 = np.zeros(n)
        np.add.at(aw2, np.asarray(anchor_idx, np.int64),
                  np.asarray(anchor_w2, np.float64))
        ancz = v.copy()
        if len(anchor_idx):
            ancz[np.asarray(anchor_idx, np.int64)] = np.asarray(
                anchor_pos, np.float64
            )
        p2d = np.concatenate(
            [to2d(aw2), to2d(1.0 / diag, fill=1.0),
             to2d(np.broadcast_to(np.asarray(masses, np.float64), (n,))),
             to2d(np.ones(n)),  # valid-vertex mask
             to2d(ancz[:, 0]), to2d(ancz[:, 1]), to2d(ancz[:, 2])],
            axis=0,
        )
        self._p2d = jnp.asarray(p2d, dtype)
        if uell is None:
            self.dia_offs = tuple(int(o) for o in dia_offs)
            dv = np.asarray(dia_vals, np.float64)
            dia2d = np.concatenate(
                [to2d(dv[d]) for d in range(len(dv))], 0
            )
            self._dia2d = jnp.asarray(dia2d, dtype)
            self._ucc2d = None
            self._uell_slot_qs = None
            self._uell_fold_qs = None
        else:
            # per-row-offset ELL + fold planes (core/uell.py): val planes
            # (full precision — the CG solution error scales with
            # cond(A_hat) times any value quantization, so lossy storage
            # is NOT acceptable) stacked into the dia slot of the kernel;
            # 7-bit lane indices packed four per int32 word (lossless)
            self.dia_offs = ()
            all_planes = list(uell["slots"]) + [
                op for layer in uell["folds"] for op in layer
            ]
            self._uell_slot_qs = tuple(q for q, _, _ in uell["slots"])
            self._uell_fold_qs = tuple(
                tuple(q for q, _, _ in layer) for layer in uell["folds"]
            )
            self._uell_packed = bool(
                np.dtype(jnp.dtype(dtype)) == np.dtype(np.float32)
            )
            vals = np.concatenate([vp for _, _, vp in all_planes], 0)
            ccs = [cc for _, cc, _ in all_planes]
            self._dia2d = jnp.asarray(vals, dtype)
            if self._uell_packed:
                words = []
                for w in range(-(-len(ccs) // 4)):
                    word = np.zeros_like(ccs[0], np.int64)
                    for b in range(4):
                        k = 4 * w + b
                        if k < len(ccs):
                            word |= ccs[k].astype(np.int64) << (8 * b)
                    words.append(word.astype(np.int32))
                self._ucc2d = jnp.asarray(np.concatenate(words, 0))
            else:
                self._ucc2d = jnp.asarray(
                    np.concatenate(ccs, 0), jnp.int32
                )

        # ---- in-kernel multigrid preconditioner planes: geometric
        # (core/mg.build_grid_mg; dia mode) or algebraic
        # (core/uamg.build_uamg; uell mode)
        self._mg_meta_static = None
        self._uamg_meta_static = None
        self._mgf = self._mgi = self._a2b = None
        if uamg is not None:
            assert uell is not None, "in-kernel algebraic MG: uell mode"
            assert mg is None
            up, um = uamg
            self._mgf = jnp.asarray(np.concatenate([
                up["om_invd0"],
                up["r0_mask"].reshape(-1, LANES),
                up["p0_mask"].reshape(-1, LANES),
                up["om_invd1"],
                up["vmask1"],
                up["r1_mask"].reshape(-1, LANES),
                up["p1_mask"].reshape(-1, LANES),
                up["l1_vals"].reshape(-1, LANES),
            ], 0), dtype)
            self._mgi = jnp.asarray(np.concatenate([
                up["r0_idx"].reshape(-1, LANES),
                up["p0_idx"].reshape(-1, LANES),
                up["r1_idx"].reshape(-1, LANES),
                up["p1_idx"].reshape(-1, LANES),
                up["l1_cc"].reshape(-1, LANES),
            ], 0).astype(np.int32))
            self._a2b = jnp.asarray(
                up["a2inv_blocks"].reshape(-1, LANES), dtype
            )
            self._uamg_meta_static = (
                tuple(um["segs0"]), tuple(um["segs1"]),
                tuple(um["l1_slot_qs"]),
                tuple(tuple(l) for l in um["l1_fold_qs"]),
                int(um["np2"]), int(um["nc_rows"]),
            )
        if mg is not None:
            assert uell is None, "in-kernel MG: dia mode only"
            mgp, mgm = mg

            def pl2d(flat):
                return np.asarray(flat, np.float64).reshape(-1, LANES)

            self._mgf = jnp.asarray(np.concatenate([
                pl2d(mgp["l1_vals"]),
                pl2d(mgp["om_invd0"]),
                pl2d(mgp["om_invd1"]),
                pl2d(mgp["t0_masks"]),
                pl2d(mgp["t1_masks"]),
                mgp["pack_mask"].reshape(-1, LANES),
                mgp["unpack_mask"].reshape(-1, LANES),
            ], 0), dtype)
            self._mgi = jnp.asarray(np.concatenate([
                mgp["pack_idx"].reshape(-1, LANES),
                mgp["unpack_idx"].reshape(-1, LANES),
            ], 0).astype(np.int32))
            self._a2b = jnp.asarray(
                mgp["a2inv_blocks"].reshape(-1, LANES), dtype
            )
            self._mg_meta_static = (
                tuple(mgm["l1_offs"]), tuple(mgm["t0_offs"]),
                tuple(mgm["t1_offs"]),
                tuple(mgm["rangesA"]), tuple(mgm["rangesB"]),
            )

        def state3(arr):
            arr = np.asarray(arr, np.float64)
            return jnp.asarray(
                np.concatenate([to2d(arr[:, a]) for a in range(3)], 0),
                dtype,
            )

        self.state = {
            "x": state3(v),
            "v": jnp.zeros((3 * Nr, LANES), dtype),
            "d": jnp.concatenate(
                [jnp.zeros((n_chunks, 9 * SUB, LANES), dtype),
                 jnp.ones((n_chunks, 3 * SUB, LANES), dtype)], axis=1,
            ),
            "ancu": jnp.zeros((3 * Nr, LANES), dtype),
            "colu": jnp.zeros((3 * Nr, LANES), dtype),
            "t": jnp.asarray(0.0, dtype),
        }
        self._rollouts = {}

    # ------------------------------------------------------------ access

    def _planes_to_xyz(self, planes):
        a = np.asarray(planes).reshape(3, self.N)[:, self._positions]
        return a.T

    @property
    def x(self):
        return self._planes_to_xyz(self.state["x"])

    @property
    def v(self):
        return self._planes_to_xyz(self.state["v"])

    def set_positions(self, value):
        """Overwrite positions (internal numbering, (n,3))."""
        v = np.zeros((3, self.N))
        v[:, self._positions] = np.asarray(value, np.float64).T
        self.state["x"] = jnp.asarray(
            v.reshape(3 * self.Nr, LANES), self.dtype
        )

    def set_velocities(self, value):
        v = np.zeros((3, self.N))
        v[:, self._positions] = np.asarray(value, np.float64).T
        self.state["v"] = jnp.asarray(
            v.reshape(3 * self.Nr, LANES), self.dtype
        )

    # ---------------------------------------------------------- stepping

    ROLLOUT_WINDOW = 10

    def _roll_fn(self, n_steps):
        from ..ops.pallas.banded_step import banded_rollout

        if n_steps not in self._rollouts:
            dt = self.dt
            p2d, dia2d, rbase, fblk = (
                self._p2d, self._dia2d, self._rbase, self._fblk
            )
            collect = self.collect_residuals
            kw = dict(
                dia_offs=self.dia_offs, model=self.model,
                newton_iters=self.newton_iters, cg_iters=self.cg_iters,
                dt=dt, gravity=self.gravity, n_iters=self.admm_iters,
                Wr=self.Wr, coll_shapes=self.coll_shapes,
                coll_w2=self.coll_w2, collect_residuals=collect,
            )
            if self._uell is not None:
                kw.update(
                    ucc2d=self._ucc2d,
                    uell_slot_qs=self._uell_slot_qs,
                    uell_fold_qs=self._uell_fold_qs,
                    uell_packed=self._uell_packed,
                )
            if self._mg_meta_static is not None:
                kw.update(
                    mgf=self._mgf, mgi=self._mgi, a2b=self._a2b,
                    mg_meta_static=self._mg_meta_static,
                )
            if self._uamg_meta_static is not None:
                kw.update(
                    mgf=self._mgf, mgi=self._mgi, a2b=self._a2b,
                    uamg_meta_static=self._uamg_meta_static,
                )

            def roll(state):
                out = banded_rollout(
                    p2d, dia2d, rbase, fblk, state["x"], state["v"],
                    state["ancu"], state["colu"], state["d"],
                    n_steps=n_steps, **kw
                )
                x, v, d, au, cu = out[:5]
                new = {
                    "x": x, "v": v, "d": d, "ancu": au, "colu": cu,
                    "t": state["t"] + n_steps * dt,
                }
                if collect is True:
                    return (new, out[5], out[6])
                return (new, out[5]) if collect else new

            self._rollouts[n_steps] = jax.jit(roll, donate_argnums=(0,))
        return self._rollouts[n_steps]

    def _advance(self, n_steps):
        out = self._roll_fn(n_steps)(self.state)
        if self.collect_residuals is True:
            self.state, self.last_primal, self.last_dual = out
        elif self.collect_residuals:
            self.state, self.last_primal = out
        else:
            self.state = out

    def step(self):
        self._advance(1)
        return True

    def run(self, n_steps: int):
        """n_steps timesteps, chunked into ROLLOUT_WINDOW-step kernel
        calls (remainder as single steps). With collect_residuals,
        last_primal holds the final window's residuals."""
        W = self.ROLLOUT_WINDOW
        full, rem = divmod(n_steps, W)
        for _ in range(full):
            self._advance(W)
        for _ in range(rem):
            self._advance(1)
        return True


def banded_from_system(system, _pack_vals=None):
    """Build a BandedStepper equivalent to an initialized dia-mode System
    when its force set qualifies. Returns (stepper, to_canonical) or None.

    _pack_vals: optional (nnz,) override of the A_hat entry values (in the
    assembled CSR's data order) used ONLY to pick the uell packing
    structure (nz filter + slot layout) — sweep builders pass the UNION
    magnitude over scenarios so the shared structure covers every
    scenario's pattern.

    Qualifying configuration: one tet force (HyperElasticTet nh/stvk or
    LinearTetStrain — per-element materials allowed), StaticAnchors (any
    weights), at most one Collision holding any mix of Floor/Sphere/
    Cylinder shapes, all-node
    ExplicitForce kicks only, no residual collection, dia global solve
    (possibly via System's internal grid renumbering), bounded window.

    Uses the System's POST-reorder internals (params/_xi/_mi/_dia_offsets)
    so any renumbering System performed is inherited for free.
    """
    from ..models.anchor import StaticAnchor
    from ..models.collision import Collision, Cylinder, Floor, Sphere
    from ..models.explicit import ExplicitForce, WindForce
    from ..models.tet import HyperElasticTet, LinearTetStrain

    s = system.settings
    # collect_residuals="primal" emits the primal residual in-kernel
    # near-free; True emits primal AND dual (second in-kernel scatter
    # accumulation). Residual-driven early exit needs the general path.
    if s.collect_residuals not in (False, None, True, "primal") or (
            s.residual_tol is not None):
        return None
    # the kernel runs the plain α=1 reference iteration only
    if s.relaxation != 1.0 or s.acceleration is not None:
        return None
    if getattr(system, "_solver_mode", None) not in ("dia", "ell"):
        return None

    tet = None
    anchors = []
    floor = None
    for f in system.forces:
        if isinstance(f, HyperElasticTet):
            if tet is not None or f.model not in ("nh", "stvk"):
                return None
            tet = (f.model, f)
        elif isinstance(f, LinearTetStrain):
            if tet is not None:
                return None
            tet = ("arap", f)
        elif type(f) is StaticAnchor:
            anchors.append(f)
        elif isinstance(f, Collision):
            if (floor is not None or f.n_nodes != system.n_nodes
                    or not all(isinstance(s_, (Floor, Sphere, Cylinder))
                               for s_ in f.shapes)):
                return None
            floor = f
        else:
            return None
    if tet is None:
        return None

    gravity = np.zeros(3)
    for e in system.explicit_forces:
        if isinstance(e, WindForce) or not isinstance(e, ExplicitForce):
            return None
        if getattr(e, "indices", None) is not None:
            return None
        gravity = gravity + np.asarray(e.direction, np.float64)

    model, tf = tet
    p = {k: np.asarray(jax.device_get(v_), np.float64)
         if not isinstance(v_, np.ndarray) else np.asarray(v_, np.float64)
         for k, v_ in system.params[tf.name].items()
         if k in ("indices", "coeff", "weight", "k", "mu", "lam")}
    E = len(p["indices"])
    w2 = p["weight"] ** 2
    if model == "arap":
        mu = lam = np.ones(E)
        newton_iters = 1
    else:
        mu = np.broadcast_to(p["mu"], (E,))
        lam = np.broadcast_to(p["lam"], (E,))
        newton_iters = tf.max_iters
    kp = np.broadcast_to(p["k"], (E,))

    anchor_idx = []
    anchor_w2 = []
    anchor_pos = []
    for a in anchors:
        ap = system.params[a.name]
        anchor_idx.append(np.asarray(ap["indices"], np.int64).ravel())
        anchor_w2.append(np.asarray(ap["weight"], np.float64) ** 2)
        anchor_pos.append(np.asarray(ap["pos"], np.float64))
    anchor_idx = (np.concatenate(anchor_idx)
                  if anchors else np.zeros(0, np.int64))
    anchor_w2 = (np.concatenate(anchor_w2) if anchors else np.zeros(0))
    anchor_pos = (np.concatenate(anchor_pos)
                  if anchors else np.zeros((0, 3)))

    sv = system.params["_solver"]
    mg = None
    uamg = None
    if system._solver_mode == "dia":
        dia_offs = system._dia_offsets
        dia_vals = np.asarray(sv["dia_vals"], np.float64)
        diag = np.asarray(sv["diag"], np.float64)
        positions = None
        packed = None
        if s.preconditioner == "amg":
            # in-kernel geometric multigrid: exact-solve-MATCHED ADMM at
            # a small fixed budget (core/mg.py; docs/PERFORMANCE.md
            # "Matched-residual solves")
            from .mg import build_grid_mg
            from .solver import _assemble_A_hat_csr

            cparams = {
                k: {kk: np.asarray(jax.device_get(vv))
                    for kk, vv in system.params[k].items()}
                for k in system._constraint_names
            }
            A = _assemble_A_hat_csr(
                system.n_nodes, system._mi, s.timestep_s, cparams
            )
            n_pad = -(-system.n_nodes // (8 * LANES)) * (8 * LANES)
            mg = build_grid_mg(A, system._xi, n_pad, min_nodes=0)
            if mg is None:
                return None  # initialize() raises a config error
            if s.verbose:
                lv = mg[1]["levels"]
                print("Solver: in-kernel multigrid engaged "
                      f"({lv[0]} -> {lv[1]} -> {lv[2]})")
    else:
        # unstructured numbering: no diagonal structure exists — pack
        # A_hat into per-row-offset ELL slots over a spatially-ordered,
        # diluted vertex layout (core/uell.py)
        from .solver import _assemble_A_hat_csr
        from .uell import pack_uell_auto

        n = system.n_nodes
        cparams = {
            k: {kk: np.asarray(jax.device_get(vv))
                for kk, vv in system.params[k].items()}
            for k in system._constraint_names
        }
        A = _assemble_A_hat_csr(n, system._mi, s.timestep_s, cparams)
        diag = A.diagonal().copy()
        Ac = A.tocoo()
        pv = Ac.data if _pack_vals is None else np.asarray(_pack_vals)
        nz = pv != 0.0  # structural zeros would waste slot planes
        try:
            packed, positions = pack_uell_auto(
                Ac.row[nz], Ac.col[nz], pv[nz], system._xi)
        except ValueError:
            return None
        dia_offs = ()
        dia_vals = np.zeros((0, n))
        if s.preconditioner == "amg":
            # in-kernel ALGEBRAIC multigrid: exact-solve-MATCHED ADMM on
            # ARBITRARY topology at a small fixed budget (core/uamg.py;
            # docs/PERFORMANCE.md "Matched-residual solves")
            from .uamg import build_uamg

            try:
                uamg = build_uamg(A, positions, packed["n_pad"])
            except ValueError:
                return None  # caller falls back to the general-path AMG
            if s.verbose:
                lv = uamg[1]["levels"]
                print("Solver: in-kernel algebraic multigrid engaged "
                      f"({lv[0]} -> {lv[1]} -> {lv[2]}, "
                      f"{uamg[1]['n_ops'][0]}+{uamg[1]['n_ops'][1]} "
                      "transfer ops)")
        # VMEM budget estimate (plus ~45 planes of state/element scratch
        # and stack); reject and fall back to the general path rather
        # than fault the chip. The kernel raises the compiler's scoped
        # cap to ~100 MB (v5e has 128 MB/core), so the budget here is
        # generous — f32 value planes + packed int32 lane words
        n_planes = packed["n_slots"] + packed["n_fold_ops"]
        nr = packed["n_pad"] // 128
        a_bytes = nr * 128 * (4 * n_planes + 4 * (-(-n_planes // 4)))
        vmem = a_bytes + 45 * nr * 128 * 4
        if uamg is not None:
            up = uamg[0]
            vmem += sum(
                int(np.asarray(v_).size) * 4 for v_ in up.values()
            )
        if vmem > 85 * 2**20:
            if s.verbose:
                print(
                    f"Solver: uell planes need ~{vmem/2**20:.0f} MB VMEM"
                    " — banded kernel skipped"
                )
            return None
    try:
        stepper = BandedStepper(
            system._xi, system._mi,
            p["indices"], p["coeff"], w2, mu, lam, kp,
            model, newton_iters,
            anchor_idx, anchor_w2, anchor_pos,
            dia_offs, dia_vals, diag,
            gravity=tuple(gravity), dt=s.timestep_s,
            admm_iters=s.admm_iters,
            cg_iters=(s.cg_fixed_iters
                      if s.cg_fixed_iters is not None
                      else (8 if s.preconditioner == "amg" else 25)),
            dtype=s.dtype,
            coll_shapes=tuple(
                ("floor", (float(s_.center[1]),)) if isinstance(s_, Floor)
                else ("sphere", (*[float(q) for q in s_.center],
                                 float(s_.radius)))
                if isinstance(s_, Sphere)
                else ("cylinder", (float(s_.center[0]),
                                   float(s_.center[1]), float(s_.radius)))
                for s_ in (floor.shapes if floor is not None else ())
            ),
            coll_w2=(float(floor.weight_value) ** 2
                     if floor is not None else 0.0),
            positions=positions, uell=packed,
            collect_residuals=(s.collect_residuals
                               if s.collect_residuals in (True, "primal")
                               else False),
            mg=mg, uamg=uamg,
        )
    except ValueError:
        return None
    cid = (system._o2i if system._o2i is not None
           else np.arange(system.n_nodes))
    return stepper, np.asarray(cid)
