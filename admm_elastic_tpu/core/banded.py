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
   sub-blocks of 128 with DISTINCT target lanes per corner — the property
   that turns the kernel's scatter into a conflict-free lane permutation.
   Packing is a bounded-pool greedy wave sweep: each wave selects, among
   the next POOL unplaced elements in order, those that are the first
   occurrence of every one of their four (corner, vertex%128) lane
   classes. Selections within a wave cannot collide, so each wave forms a
   valid sub-block; the pool bound keeps elements near their sorted
   position, bounding the vertex window.
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
POOL = 1024         # greedy placement lookahead (bounds window growth)
MAX_WR = 40         # max vertex-window rows (gather scan length bound)
MAX_DIAGONALS = 48  # same budget as the dia solver


def place_elements(idx):
    """Pack elements (sorted by min vertex index) into sub-blocks of 128
    such that within each sub-block all four corners' target lanes
    (vertex % 128) are distinct. Returns (n_sub, 128) int64 of element
    ids, -1 for pad slots."""
    idx = np.asarray(idx, np.int64)
    order = np.argsort(idx.min(axis=1), kind="stable")
    lanes = (idx % LANES).astype(np.int64)
    subs = []
    remaining = order
    while len(remaining):
        pool = remaining[:POOL]
        sel = np.ones(len(pool), bool)
        for k in range(4):
            key = lanes[pool, k]
            first = np.zeros(len(pool), bool)
            _, fidx = np.unique(key, return_index=True)
            first[fidx] = True
            sel &= first
        pos = np.flatnonzero(sel)[:LANES]
        chosen = pool[pos]
        mask = np.ones(len(remaining), bool)
        mask[pos] = False
        remaining = remaining[mask]
        subs.append(
            np.pad(chosen, (0, LANES - len(chosen)), constant_values=-1)
        )
    return np.asarray(subs, np.int64)


class BandedStepper:
    """Single-kernel ADMM stepper for banded tet meshes.

    Matches System dia-path semantics for: one tet force — NeoHookean/StVK
    `HyperElasticTet` (per-element mu/lam, `newton_iters` warm-started
    local Newton iterations) or `LinearTetStrain` (model='arap') —
    StaticAnchors with per-node weights, an optional floor CollisionForce,
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
                 floor_y=None, floor_w2=0.0):
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
        self.gravity = tuple(float(q) for q in gravity)
        self.floor_y = None if floor_y is None else float(floor_y)
        self.floor_w2 = float(floor_w2)
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

        # vertex padding: multiples of 8 rows keep every plane slice and
        # dynamic window tile-aligned
        N = -(-n // (8 * LANES)) * (8 * LANES)
        self.N = N
        Nr = N // LANES
        self.Nr = Nr

        # ---- element placement + chunking
        subs = place_elements(idx)  # (n_sub, 128)
        n_sub = len(subs)
        n_chunks = -(-n_sub // SUB)
        subs = np.pad(subs, ((0, n_chunks * SUB - n_sub), (0, 0)),
                      constant_values=-1)
        self.n_chunks = n_chunks

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

        # ---- packed vertex planes + diagonals (2D row-major layout)
        def to2d(plane, fill=0.0):
            return np.pad(
                np.asarray(plane, np.float64), (0, N - n),
                constant_values=fill,
            ).reshape(Nr, LANES)

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
        self.dia_offs = tuple(int(o) for o in dia_offs)
        dv = np.asarray(dia_vals, np.float64)
        dia2d = np.concatenate([to2d(dv[d]) for d in range(len(dv))], 0)
        self._dia2d = jnp.asarray(dia2d, dtype)

        def state3(arr):
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
        a = np.asarray(planes).reshape(3, self.N)[:, : self.n_nodes]
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
        v[:, : self.n_nodes] = np.asarray(value, np.float64).T
        self.state["x"] = jnp.asarray(
            v.reshape(3 * self.Nr, LANES), self.dtype
        )

    def set_velocities(self, value):
        v = np.zeros((3, self.N))
        v[:, : self.n_nodes] = np.asarray(value, np.float64).T
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
            kw = dict(
                dia_offs=self.dia_offs, model=self.model,
                newton_iters=self.newton_iters, cg_iters=self.cg_iters,
                dt=dt, gravity=self.gravity, n_iters=self.admm_iters,
                Wr=self.Wr, floor_y=self.floor_y, floor_w2=self.floor_w2,
            )

            def roll(state):
                x, v, d, au, cu = banded_rollout(
                    p2d, dia2d, rbase, fblk, state["x"], state["v"],
                    state["ancu"], state["colu"], state["d"],
                    n_steps=n_steps, **kw
                )
                return {
                    "x": x, "v": v, "d": d, "ancu": au, "colu": cu,
                    "t": state["t"] + n_steps * dt,
                }

            self._rollouts[n_steps] = jax.jit(roll, donate_argnums=(0,))
        return self._rollouts[n_steps]

    def step(self):
        self.state = self._roll_fn(1)(self.state)
        return True

    def run(self, n_steps: int):
        """n_steps timesteps, chunked into ROLLOUT_WINDOW-step kernel
        calls (remainder as single steps)."""
        W = self.ROLLOUT_WINDOW
        full, rem = divmod(n_steps, W)
        for _ in range(full):
            self.state = self._roll_fn(W)(self.state)
        for _ in range(rem):
            self.state = self._roll_fn(1)(self.state)
        return True


def banded_from_system(system):
    """Build a BandedStepper equivalent to an initialized dia-mode System
    when its force set qualifies. Returns (stepper, to_canonical) or None.

    Qualifying configuration: one tet force (HyperElasticTet nh/stvk or
    LinearTetStrain — per-element materials allowed), StaticAnchors (any
    weights), at most one Collision holding exactly one Floor, all-node
    ExplicitForce kicks only, no residual collection, dia global solve
    (possibly via System's internal grid renumbering), bounded window.

    Uses the System's POST-reorder internals (params/_xi/_mi/_dia_offsets)
    so any renumbering System performed is inherited for free.
    """
    from ..models.anchor import StaticAnchor
    from ..models.collision import Collision, Floor
    from ..models.explicit import ExplicitForce, WindForce
    from ..models.tet import HyperElasticTet, LinearTetStrain

    s = system.settings
    if s.collect_residuals or s.residual_tol is not None:
        return None
    if getattr(system, "_solver_mode", None) != "dia":
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
            shapes = f.shapes
            if (floor is not None or len(shapes) != 1
                    or not isinstance(shapes[0], Floor)
                    or f.n_nodes != system.n_nodes):
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
    try:
        stepper = BandedStepper(
            system._xi, system._mi,
            p["indices"], p["coeff"], w2, mu, lam, kp,
            model, newton_iters,
            anchor_idx, anchor_w2, anchor_pos,
            system._dia_offsets, np.asarray(sv["dia_vals"], np.float64),
            np.asarray(sv["diag"], np.float64),
            gravity=tuple(gravity), dt=s.timestep_s,
            admm_iters=s.admm_iters,
            cg_iters=(s.cg_fixed_iters
                      if s.cg_fixed_iters is not None else 25),
            dtype=s.dtype,
            floor_y=(float(floor.shapes[0].center[1])
                     if floor is not None else None),
            floor_w2=(float(floor.weight_value) ** 2
                      if floor is not None else 0.0),
        )
    except ValueError:
        return None
    cid = (system._o2i if system._o2i is not None
           else np.arange(system.n_nodes))
    return stepper, np.asarray(cid)
