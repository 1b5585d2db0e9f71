"""Lattice fast path: whole-timestep single-kernel ADMM for beam lattices.

LatticeStepper runs the same algorithm as a System configured with
{HyperElasticTet(model='nh', backend='pallas'), StaticAnchor, gravity,
global_solver='dia'} on a `make_beam_tets` mesh — but executes the ENTIRE
timestep (10 ADMM iterations: local prox steps, dual updates, RHS, CG
solves) as ONE Pallas kernel (ops/pallas/lattice_step.py), exploiting the
lattice's constant-offset selector structure to replace every gather and
scatter with static lane shifts.

Use when the mesh is a uniform-cell lattice and the force set fits the
restrictions; fall back to the general System otherwise. Trajectories match
the general dia path to f32 round-off (tests/test_lattice.py).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..geometry.primitives import make_beam_tets
from ..models.anchor import StaticAnchor
from ..models.tet import HyperElasticTet
from .solver import assemble_A_hat_dia


class LatticeStepper:
    """Single-kernel ADMM stepper for an (nx,ny,nz)-cell uniform beam.

    Matches System semantics for: NeoHookean HyperElasticTet (uniform
    mu/lam, `newton_iters` local iterations, warm-started), StaticAnchor
    on `anchor_idx` (uniform `anchor_weight`), a gravity velocity kick,
    dia global solve with `cg_iters` fixed Jacobi-PCG iterations.
    """

    def __init__(self, nx, ny, nz, size, masses, mu, lam, anchor_idx,
                 gravity=(0.0, -9.8, 0.0), dt=0.04, admm_iters=10,
                 newton_iters=5, cg_iters=25, anchor_weight=1000.0,
                 dtype=jnp.float32):
        from ..ops.pallas.lattice_step import corner_offsets, group_tables

        self.mesh = make_beam_tets(nx, ny, nz, size)
        gx, gy, gz = nx + 1, ny + 1, nz + 1
        n = gx * gy * gz
        assert self.mesh.n_vertices == n
        self.n_nodes = n
        self.dt = float(dt)
        self.admm_iters = int(admm_iters)
        self.cg_iters = int(cg_iters)
        self.newton_iters = int(newton_iters)
        self.dtype = dtype
        self.gravity = jnp.asarray(gravity, dtype)
        masses = np.broadcast_to(np.asarray(masses, np.float64), (n,)).copy()

        kprox = float(min(mu, lam))
        self._mu, self._lam, self._kprox = float(mu), float(lam), kprox

        # group tables (per-group selector coefficients + w2 = k*vol)
        self.offs = tuple(corner_offsets(gy, gz))
        raw = group_tables(size)
        self.groups = tuple(
            (corners, parity, tuple(np.asarray(cp).ravel().tolist()),
             kprox * vol)
            for (corners, parity, cp, vol) in raw
        )
        self.n_groups = len(self.groups)

        # exact same global matrix as the general path
        het = HyperElasticTet(self.mesh.tets, mu, lam,
                              max_iters=newton_iters, model="nh")
        p_het, _ = het.build(self.mesh.vertices, masses, self.dt)
        anc = StaticAnchor(anchor_idx, weight=anchor_weight)
        p_anc, _ = anc.build(self.mesh.vertices, masses, self.dt)
        out = assemble_A_hat_dia(
            n, masses, self.dt, {"het": p_het, "anchor": p_anc}
        )
        if out is None:
            raise ValueError("mesh is not dia-structured (not a lattice?)")
        self.dia_offs, dia_vals, diag = out

        self.N = -(-n // 128) * 128
        pad = self.N - n

        def padp(a, fill=0.0):
            return np.pad(np.asarray(a, np.float64), ((0, 0), (0, pad)),
                          constant_values=fill)

        self._dia = jnp.asarray(padp(dia_vals), dtype)
        self._invd = jnp.asarray(
            padp(1.0 / diag[None, :], fill=1.0), dtype
        )

        # masks: [anchor w2 plane, even-parity validity, odd-parity validity]
        aw2 = np.zeros(n)
        aw2[np.asarray(anchor_idx, np.int64)] = anchor_weight ** 2
        I, J, K = np.meshgrid(
            np.arange(gx), np.arange(gy), np.arange(gz), indexing="ij"
        )
        valid = (I < nx) & (J < ny) & (K < nz)
        even = (valid & (((I + J + K) % 2) == 0)).ravel().astype(np.float64)
        odd = (valid & (((I + J + K) % 2) == 1)).ravel().astype(np.float64)
        self._masks = jnp.asarray(
            padp(np.stack([aw2, even, odd])), dtype
        )
        self._ancz = jnp.asarray(
            padp(self.mesh.vertices.T), dtype
        )
        self._mpad = jnp.asarray(
            np.pad(masses, (0, pad))[None, :], dtype
        )

        self.state = {
            # x/v live in padded plane layout (3,N) — the kernel does the
            # whole step (incl. velocity kick + update) in that layout, so
            # rollouts run with zero per-step relayout work
            "x": jnp.asarray(
                np.pad(self.mesh.vertices.T, ((0, 0), (0, pad))), dtype
            ),
            "v": jnp.zeros((3, self.N), dtype),
            # second-minor dim padded to the (8,128) HBM tile so the
            # per-group DMA slices are tiling-aligned (planes 0-8 / 0-2 used)
            "u": jnp.zeros((self.n_groups, 16, self.N), dtype),
            "warm": jnp.ones((self.n_groups, 8, self.N), dtype),
            "ancu": jnp.zeros((3, self.N), dtype),
            "t": jnp.asarray(0.0, dtype),
        }
        self._rollouts = {}

    @property
    def x(self):
        """(n,3) positions (converted from the internal plane layout)."""
        return self.state["x"][:, : self.n_nodes].T

    @property
    def v(self):
        return self.state["v"][:, : self.n_nodes].T

    def _kernel_kwargs(self):
        dt = self.dt
        return dict(
            offs=self.offs, groups=self.groups, dia_offs=self.dia_offs,
            mu=self._mu, lam=self._lam, kprox=self._kprox,
            newton_iters=self.newton_iters, cg_iters=self.cg_iters,
            dt=dt, gravity=tuple(float(q) for q in np.asarray(self.gravity)),
            n_iters=self.admm_iters,
        )

    ROLLOUT_WINDOW = 10

    def _roll_fn(self, n_steps):
        from ..ops.pallas.lattice_step import lattice_rollout

        if n_steps not in self._rollouts:
            dt = self.dt
            masks, ancz, dia, invd, mpad = (
                self._masks, self._ancz, self._dia, self._invd, self._mpad
            )
            kw = self._kernel_kwargs()

            def roll(state):
                x3, v3, u, warm, ancu = lattice_rollout(
                    masks, ancz, dia, invd, mpad, state["x"], state["v"],
                    state["u"], state["warm"], state["ancu"],
                    n_steps=n_steps, **kw
                )
                return {
                    "x": x3, "v": v3, "u": u, "warm": warm, "ancu": ancu,
                    "t": state["t"] + n_steps * dt,
                }

            self._rollouts[n_steps] = jax.jit(roll, donate_argnums=(0,))
        return self._rollouts[n_steps]

    def step(self):
        """One timestep (the 1-step rollout kernel)."""
        self.state = self._roll_fn(1)(self.state)
        return True

    def run(self, n_steps: int):
        """n_steps timesteps via whole-rollout kernel calls, chunked into
        fixed ROLLOUT_WINDOW-step windows (remainder as single steps) so
        any n_steps reuses at most two compiled kernels (remote compiles
        are expensive)."""
        W = self.ROLLOUT_WINDOW
        full, rem = divmod(n_steps, W)
        for _ in range(full):
            self.state = self._roll_fn(W)(self.state)
        for _ in range(rem):
            self.state = self._roll_fn(1)(self.state)
        return True
