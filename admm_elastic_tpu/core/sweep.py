"""Scenario-sweep whole-timestep fast path: N independent simulations of
the SAME topology (varied materials / weights / initial state) in ONE
Pallas kernel per rollout window.

The BASELINE "64 parallel armadillo drops with varied stiffness" workload
previously ran as a vmapped general-path step (per-scenario re-assembled
ELL matrices): tens of ms per scenario-step, dominated by kernel launches
and gather lowering at small mesh sizes. This module instead gives the
banded whole-timestep kernel (ops/pallas/banded_step.py) a leading
SCENARIO grid axis: every scenario runs the identical single-scenario
program — same chunk loop, same windowed gathers, same per-scenario CG
dot products — against its own state/material/matrix planes, while the
topology planes (element packing, scatter permutations, uell lane
indices) are shared across scenarios. Per-scenario results are therefore
bit-identical to running each scenario through its own BandedStepper
(tests/test_sweep_kernel.py), which in turn matches the general System
path to round-off.

Equivalent reference behavior: running the C++ sample N times with edited
material XML blocks (there is no batch facility in the reference;
/root/reference/deps/admm-elastic-sca/src/system/System.cpp:26-75 is one
simulation per process).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .banded import LANES, SUB, BandedStepper, banded_from_system
from .uell import refill_uell_values

__all__ = ["SweepStepper", "sweep_from_system"]


def _get_sweep(sweep, name, key, base, S, E):
    """Per-scenario (S, E) array for force `name`'s param `key`."""
    v = sweep.get((name, key))
    if v is None:
        return np.broadcast_to(np.broadcast_to(
            np.asarray(base, np.float64), (E,)), (S, E))
    v = np.asarray(v, np.float64)
    if v.ndim == 1:
        v = v[:, None]
    return np.broadcast_to(v, (S, E))


class SweepStepper:
    """Batched-scenario wrapper around a base BandedStepper: shared
    topology planes, per-scenario state / material / global-matrix
    planes, stepped by the sweep-mode banded kernel."""

    model_name = "sweep"

    def __init__(self, base: BandedStepper, n_scen: int, p2d_b, dia2d_b,
                 matv_b, mesh=None, data_axis: str = "data"):
        self.base = base
        self.n_scen = int(n_scen)
        self.dt = base.dt
        self.dtype = base.dtype
        self.mesh = mesh
        self.data_axis = data_axis
        if mesh is not None and self.n_scen % mesh.shape[data_axis]:
            raise ValueError(
                f"n_scen={self.n_scen} not divisible by mesh axis "
                f"{data_axis!r} ({mesh.shape[data_axis]} devices)"
            )
        self._p2d = self._shard(jnp.asarray(p2d_b, base.dtype))
        self._dia2d = self._shard(jnp.asarray(dia2d_b, base.dtype))
        self._matv = self._shard(jnp.asarray(matv_b, base.dtype))
        S = self.n_scen

        def tile(a):
            return self._shard(
                jnp.array(jnp.broadcast_to(a[None], (S,) + a.shape))
            )

        self.state = {
            "x": tile(base.state["x"]),
            "v": tile(base.state["v"]),
            "d": tile(base.state["d"]),
            "ancu": tile(base.state["ancu"]),
            "colu": tile(base.state["colu"]),
            "t": base.state["t"],
        }
        self._rollouts = {}
        #: (S, n_steps, admm_iters) residuals of the last step()/run()
        #: window when base.collect_residuals is on
        self.last_primal = None
        self.last_dual = None

    def _shard(self, a):
        """Place a leading-scenario-axis array sharded over the data
        mesh axis (no-op without a mesh)."""
        if self.mesh is None:
            return a
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(
            a,
            NamedSharding(self.mesh,
                          P(self.data_axis, *([None] * (a.ndim - 1)))),
        )

    # ------------------------------------------------------------ access

    def _planes_to_xyz(self, planes):
        b = self.base
        a = np.asarray(planes).reshape(self.n_scen, 3, b.N)
        return a[:, :, b._positions].transpose(0, 2, 1)

    @property
    def x(self):
        """(S, n, 3) positions, internal numbering."""
        return self._planes_to_xyz(self.state["x"])

    @property
    def v(self):
        return self._planes_to_xyz(self.state["v"])

    def set_positions(self, value):
        """Overwrite per-scenario positions (internal numbering,
        (S, n, 3) or (n, 3) broadcast)."""
        b = self.base
        value = np.asarray(value, np.float64)
        if value.ndim == 2:
            value = np.broadcast_to(value, (self.n_scen,) + value.shape)
        v = np.zeros((self.n_scen, 3, b.N))
        v[:, :, b._positions] = value.transpose(0, 2, 1)
        self.state["x"] = self._shard(jnp.asarray(
            v.reshape(self.n_scen, 3 * b.Nr, LANES), self.dtype
        ))

    def set_velocities(self, value):
        b = self.base
        value = np.asarray(value, np.float64)
        if value.ndim == 2:
            value = np.broadcast_to(value, (self.n_scen,) + value.shape)
        v = np.zeros((self.n_scen, 3, b.N))
        v[:, :, b._positions] = value.transpose(0, 2, 1)
        self.state["v"] = self._shard(jnp.asarray(
            v.reshape(self.n_scen, 3 * b.Nr, LANES), self.dtype
        ))

    # ---------------------------------------------------------- stepping

    ROLLOUT_WINDOW = 10

    def _roll_fn(self, n_steps):
        from ..ops.pallas.banded_step import banded_rollout

        if n_steps not in self._rollouts:
            b = self.base
            dt = b.dt
            n_loc = (self.n_scen if self.mesh is None
                     else self.n_scen // self.mesh.shape[self.data_axis])
            collect = b.collect_residuals
            kw = dict(
                dia_offs=b.dia_offs, model=b.model,
                newton_iters=b.newton_iters, cg_iters=b.cg_iters,
                dt=dt, gravity=b.gravity, n_iters=b.admm_iters,
                Wr=b.Wr, coll_shapes=b.coll_shapes, coll_w2=b.coll_w2,
                n_scen=n_loc, collect_residuals=collect,
            )
            if b._uell is not None:
                kw.update(
                    ucc2d=b._ucc2d,
                    uell_slot_qs=b._uell_slot_qs,
                    uell_fold_qs=b._uell_fold_qs,
                    uell_packed=b._uell_packed,
                )

            def roll(p2d, dia2d, matv, rbase, fblk, state):
                out = banded_rollout(
                    p2d, dia2d, rbase, fblk, state["x"], state["v"],
                    state["ancu"], state["colu"], state["d"],
                    matv=matv, n_steps=n_steps, **kw
                )
                x, v, d, au, cu = out[:5]
                new = {
                    "x": x, "v": v, "d": d, "ancu": au, "colu": cu,
                    "t": state["t"] + n_steps * dt,
                }
                # per-scenario in-kernel residuals ride along in the
                # state dict so the shard_map specs stay uniform
                if collect:
                    new["res_p"] = out[5]
                    if collect is True:
                        new["res_d"] = out[6]
                return new

            if self.mesh is not None:
                # scenarios are embarrassingly parallel: shard the
                # scenario axis over the data mesh axis, replicate the
                # topology planes — each device runs the whole-timestep
                # sweep kernel on its own scenario slice, zero
                # collectives (SURVEY §2.6 scenario-batch parallelism
                # through the fastest path)
                from jax.sharding import PartitionSpec as P

                ax = self.data_axis
                sp = P(ax)
                st_specs = {
                    "x": sp, "v": sp, "d": sp, "ancu": sp, "colu": sp,
                    "t": P(),
                }
                out_st_specs = dict(st_specs)
                if collect:
                    out_st_specs["res_p"] = sp
                    if collect is True:
                        out_st_specs["res_d"] = sp
                roll = jax.shard_map(
                    roll, mesh=self.mesh,
                    in_specs=(sp, sp, sp, P(), P(), st_specs),
                    out_specs=out_st_specs,
                    # pallas_call out_shapes carry no vma annotation
                    check_vma=False,
                )

            fn = jax.jit(roll, donate_argnums=(5,))
            p2d, dia2d, matv = self._p2d, self._dia2d, self._matv
            rbase, fblk = b._rbase, b._fblk
            self._rollouts[n_steps] = lambda state: fn(
                p2d, dia2d, matv, rbase, fblk, state
            )
        return self._rollouts[n_steps]

    def _advance(self, n_steps):
        out = self._roll_fn(n_steps)(self.state)
        # residual arrays ride in the dict for spec uniformity; pop
        # them so the next window's input pytree matches in_specs
        self.last_primal = out.pop("res_p", None)
        self.last_dual = out.pop("res_d", None)
        self.state = out

    def step(self):
        self._advance(1)
        return True

    def run(self, n_steps: int):
        W = self.ROLLOUT_WINDOW
        full, rem = divmod(n_steps, W)
        for _ in range(full):
            self._advance(W)
        for _ in range(rem):
            self._advance(1)
        return True


def sweep_from_system(system, sweep, n_scenarios, x0=None, v0=None,
                      mesh=None, data_axis="data"):
    """Build a SweepStepper for `n_scenarios` variants of an initialized
    qualifying System (same qualification as core/banded.banded_from_system).

    sweep: {(force_name, key): (S,) or (S, E) arrays} — keys 'weight'
    (changes both the local prox mix and the global matrix), and for the
    tet force 'mu'/'lam'/'k'. Matches parallel/scenarios.batch_params
    sweep-dict semantics for those keys.
    x0/v0: optional per-scenario initial positions/velocities
    (S, n, 3), ORIGINAL (pre-reorder) numbering.
    mesh/data_axis: optional jax.sharding.Mesh — scenarios shard over
    `data_axis` (must divide n_scenarios) and each device runs the sweep
    kernel on its slice under shard_map (zero collectives).

    Returns (stepper, to_canonical) or None when the scene does not
    qualify.
    """
    from ..parallel.scenarios import batched_A_values, sweep_w2_b

    S = int(n_scenarios)
    w2_b = sweep_w2_b(system, sweep, S)
    A, vals, diag_b = batched_A_values(system, w2_b)
    union = np.abs(vals).max(axis=0)

    out = banded_from_system(system, _pack_vals=union)
    if out is None:
        return None
    base, cid = out
    n = system.n_nodes
    Nr, N = base.Nr, base.N
    pos = base._positions
    n_chunks = base.n_chunks

    # ---- per-scenario global-matrix planes
    def to2d_b(vals_sn, fill=0.0):
        full = np.full((S, N), fill, np.float64)
        full[:, pos] = vals_sn
        return full.reshape(S, Nr, LANES)

    if base._uell is not None:
        packed = base._uell
        nz = union != 0.0
        slots_b = refill_uell_values(packed, vals[:, nz])  # (S,P,Nr,128)
        parts = [slots_b.reshape(S, -1, LANES)]
        fold_planes = [vp for layer in packed["folds"] for (_, _, vp)
                       in layer]
        if fold_planes:
            fv = np.concatenate(fold_planes, 0)
            parts.append(np.broadcast_to(fv[None], (S,) + fv.shape))
        dia2d_b = np.concatenate(parts, axis=1)
    else:
        offs = np.asarray(base.dia_offs)
        coo = A.tocoo()
        d_idx = np.searchsorted(offs, coo.col - coo.row)
        assert (offs[d_idx] == coo.col - coo.row).all(), \
            "A entry off the dia offset set"
        dia_b = np.zeros((S, len(offs), n))
        dia_b[:, d_idx, coo.row] = vals
        dia2d_b = np.concatenate(
            [to2d_b(dia_b[:, d]) for d in range(len(offs))], axis=1
        )

    # ---- per-scenario vertex planes: p2d with swept 1/diag (+ anchor w2)
    p2d_b = np.broadcast_to(
        np.asarray(jax.device_get(base._p2d), np.float64)[None],
        (S, 7 * Nr, LANES),
    ).copy()
    safe_diag = np.where(diag_b > 0, diag_b, 1.0)
    p2d_b[:, Nr : 2 * Nr] = to2d_b(1.0 / safe_diag, fill=1.0)

    from ..models.anchor import StaticAnchor

    anchors = [f for f in system.forces if type(f) is StaticAnchor]
    if any((a.name, "weight") in sweep for a in anchors):
        aw2_b = np.zeros((S, n))
        for a in anchors:
            ap = system.params[a.name]
            aidx = np.asarray(ap["indices"], np.int64).ravel()
            w = _get_sweep(sweep, a.name, "weight",
                           np.asarray(ap["weight"], np.float64), S,
                           len(aidx))
            np.add.at(aw2_b, (slice(None), aidx), w**2)
        p2d_b[:, 0:Nr] = to2d_b(aw2_b)

    # ---- per-scenario element material planes [w2, mu, lam, k]
    from ..models.tet import HyperElasticTet, LinearTetStrain

    tf = next(f for f in system.forces
              if isinstance(f, (HyperElasticTet, LinearTetStrain)))
    tp = system.params[tf.name]
    E = len(np.asarray(tp["indices"]))
    w2_s = _get_sweep(sweep, tf.name, "weight",
                      np.asarray(jax.device_get(tp["weight"])), S, E) ** 2
    if base.model == "arap":
        mu_s = lam_s = np.ones((S, E))
    else:
        mu_s = _get_sweep(sweep, tf.name, "mu",
                          np.asarray(jax.device_get(tp["mu"])), S, E)
        lam_s = _get_sweep(sweep, tf.name, "lam",
                           np.asarray(jax.device_get(tp["lam"])), S, E)
    k_s = _get_sweep(sweep, tf.name, "k",
                     np.asarray(jax.device_get(tp["k"])), S, E)

    matv_b = np.zeros((S, n_chunks, 4 * SUB, LANES))
    for c in range(n_chunks):
        blk = base._subs[c]           # (SUB, 128) element ids, -1 pads
        real = blk >= 0
        e = np.where(real, blk, 0)
        for p, (arr, pad) in enumerate(
            ((w2_s, 0.0), (mu_s, 1.0), (lam_s, 1.0), (k_s, 1.0))
        ):
            matv_b[:, c, p * SUB : (p + 1) * SUB] = np.where(
                real[None], arr[:, e], pad
            )

    stepper = SweepStepper(base, S, p2d_b, dia2d_b, matv_b,
                           mesh=mesh, data_axis=data_axis)
    cid = np.asarray(cid)

    def to_internal(value):
        value = np.asarray(value, np.float64)
        if value.ndim == 2:
            value = np.broadcast_to(value, (S,) + value.shape)
        out_ = np.empty_like(value)
        out_[:, cid] = value
        return out_

    if x0 is not None:
        stepper.set_positions(to_internal(x0))
    if v0 is not None:
        stepper.set_velocities(to_internal(v0))
    return stepper, cid
