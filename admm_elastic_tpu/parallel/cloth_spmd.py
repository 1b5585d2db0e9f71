"""Element-sharded cloth fast path: the whole-timestep cloth kernel's
algorithm distributed over a device mesh with boundary-halo exchange.

The single-device cloth kernel (ops/pallas/cloth_step.py) fuses every
phase of every ADMM iteration (wind/gravity kicks, per-group triangle/
bend prox steps via constant-offset shifts, dual updates, RHS reverse
shifts, anchors, the whole Jacobi-PCG dia solve) into one pallas_call —
optimal on one chip, unshardable (in-kernel CG scalars). This module
splits the SAME algorithm at the slab boundary of its flat-lane index
space:

  * the flat vertex index space [0, N) — which IS mesh-local under the
    interleaved-column cloth numbering — is cut into contiguous slabs
    of `nbf` lanes per device;
  * every constant-offset group element is owned by the slab of its
    BASE lane (group offsets are non-negative: stencils and scatters
    reach only UP, at most max-offset lanes into the next slab);
  * per ADMM iteration each device evaluates its groups on its slab
    with a +/-Hf-lane halo of x (one neighbor `ppermute` pair), using
    the SAME math bodies as the kernel (`_tri_body` is imported; the
    bend/wind/anchor bodies are the kernel's formulas verbatim), then
    one reverse exchange returns top-halo RHS partials to their owner;
  * the Jacobi-PCG dia solve runs at the JAX level: the symmetric-dia
    matvec is row-local given the halo, the two CG scalars are psums.

Per-device traffic per CG iteration is O(halo) = O(grid row length),
independent of N — the same boundary-halo design as the sharded banded
tet kernel (parallel/banded_spmd.py; SURVEY §2.7). The in-kernel 2D
multigrid stays single-device (use the sharded path with a deeper
cg budget for matched solves, or the single-chip kernel).

Trajectory parity vs the single-device whole-timestep cloth kernel:
tests/test_cloth_spmd.py.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.pallas.tri_local import _tri_body


def _roundup(x, m):
    return -(-int(x) // m) * m


class ShardedClothStepper:
    """Distribute an initialized single-device ClothStepper over a mesh
    axis. Build via `sharded_cloth_from_system` or directly.

        mesh = jax.make_mesh((8,), ("elem",))
        spmd = ShardedClothStepper(cloth_stepper, mesh)
        spmd.run(10); x = spmd.x
    """

    model_name = "cloth_spmd"
    #: steps fused into one lax.scan program by run() — amortizes the
    #: per-dispatch relay/launch overhead like the mega kernel's
    #: rollout grid (docs/PERFORMANCE.md)
    ROLLOUT_WINDOW = 10

    def __init__(self, base, mesh, axis: str = "elem"):
        if base._mg_meta_static is not None:
            raise ValueError(
                "sharded cloth path: in-kernel multigrid not supported; "
                "use a deeper cg_iters budget for matched solves"
            )
        self.base = base
        self.mesh = mesh
        self.axis = axis
        self.D = int(mesh.shape[axis])
        self.dt = base.dt
        self.admm_iters = base.admm_iters
        self.cg_iters = base.cg_iters
        self.collect_residuals = base.collect_residuals
        #: (admm_iters,) residuals of the last step (collect modes)
        self.last_primal = None
        self.last_dual = None
        self._build()
        self._stepf = None
        self._runf = {}

    # ------------------------------------------------------------- build

    def _build(self):
        base = self.base
        D = self.D
        N = base.N
        dtype = base.dtype

        offs_all = [1]
        for spec in base.groups:
            offs_all += list(spec[1])
        for offs, _ in base.wind_groups:
            offs_all += list(offs)
        offs_all += list(base.dia_offs)
        Hf = _roundup(max(offs_all), 8)
        nbf = _roundup(-(-N // D), 128)
        if Hf > nbf:
            raise ValueError(
                f"sharded cloth path: halo {Hf} lanes exceeds the "
                f"{nbf}-lane slab — too many devices for this mesh"
            )
        Nf = D * nbf
        L = nbf + 2 * Hf
        self.Hf, self.nbf, self.L = Hf, nbf, L

        def slab(arr, fills=0.0, halo=True):
            """(P, N) -> (D, P, nbf[+2Hf]) slabs; out-of-range lanes get
            the per-plane fill."""
            a = np.asarray(arr, np.float64)
            if a.ndim == 1:
                a = a[None]
            Pn = a.shape[0]
            fills = np.broadcast_to(np.asarray(fills, np.float64), (Pn,))
            full = np.empty((Pn, Nf + 2 * Hf))
            for p in range(Pn):
                full[p] = fills[p]
                full[p, Hf:Hf + N] = a[p]
            w = L if halo else nbf
            off0 = 0 if halo else Hf
            out = np.empty((D, Pn, w))
            for d in range(D):
                lo = d * nbf + off0
                out[d] = full[:, lo:lo + w]
            return out

        # masks: row 0 aw2 (own-gated), 1 masses (own), 2 invd (own,
        # pad 1), 3+ group validity (own-gated). Gating outside own rows
        # makes each element/anchor computed exactly once fleet-wide.
        masks = np.asarray(base._masks, np.float64)
        m_own = slab(masks, fills=[0.0, 0.0, 1.0] + [0.0] * (
            masks.shape[0] - 3), halo=False)
        self._masks = jnp.asarray(m_own, dtype)
        self._ancz = jnp.asarray(
            slab(np.asarray(base._ancz, np.float64), halo=False), dtype
        )
        self._dia = jnp.asarray(
            slab(np.asarray(base._dia, np.float64)), dtype
        )

        st = base.state
        self.state = {
            "x": jnp.asarray(
                slab(np.asarray(st["x"], np.float64), halo=False), dtype),
            "v": jnp.asarray(
                slab(np.asarray(st["v"], np.float64), halo=False), dtype),
            "ancu": jnp.asarray(
                slab(np.asarray(st["ancu"], np.float64), halo=False),
                dtype),
            "u": jnp.asarray(
                np.stack([
                    slab(np.asarray(st["u"], np.float64)[g], halo=False)
                    for g in range(base.n_groups)
                ], axis=1), dtype) if base.n_groups else
                jnp.zeros((D, 0, 16, nbf), dtype),
            "t": jnp.asarray(np.asarray(st["t"]), dtype),
        }
        shd = NamedSharding(self.mesh, P(self.axis))
        self.state = {
            k: (jax.device_put(v, shd) if k != "t" else v)
            for k, v in self.state.items()
        }
        for nm in ("_masks", "_ancz", "_dia"):
            setattr(self, nm, jax.device_put(getattr(self, nm), shd))

    # ------------------------------------------------------------ access

    @property
    def x(self):
        return self._gather(self.state["x"])

    @property
    def v(self):
        return self._gather(self.state["v"])

    def _gather(self, planes):
        a = np.asarray(planes)                      # (D, 3, nbf)
        flat = a.transpose(1, 0, 2).reshape(3, self.D * self.nbf)
        return flat[:, :self.base.n_nodes].T

    def detach(self):
        """Write the slab state back into the single-device ClothStepper
        (bitwise relayout) so its kernel stepping / checkpointing
        continue exactly from here. Returns the base stepper."""
        base = self.base
        N, nbf = base.N, self.nbf

        def unslab(a):
            a = np.asarray(a)
            flat = np.moveaxis(a, 0, -2).reshape(
                a.shape[1:-1] + (self.D * nbf,)
            )
            return flat[..., :N]

        u = np.asarray(self.state["u"])              # (D, G, 16, nbf)
        u_g = u.transpose(1, 2, 0, 3).reshape(
            base.n_groups, 16, self.D * nbf)[..., :N]
        base.state = {
            "x": jnp.asarray(unslab(self.state["x"]), base.dtype),
            "v": jnp.asarray(unslab(self.state["v"]), base.dtype),
            "u": jnp.asarray(u_g, base.dtype),
            "ancu": jnp.asarray(unslab(self.state["ancu"]),
                                base.dtype),
            "t": jnp.asarray(np.asarray(self.state["t"]), base.dtype),
        }
        return base

    # --------------------------------------------------------- stepping

    def _make_step(self):
        base = self.base
        D, Hf, nbf, L = self.D, self.Hf, self.nbf, self.L
        dt = self.dt
        dt2 = dt * dt
        iters = self.admm_iters
        cg_iters = self.cg_iters
        axis = self.axis
        groups = base.groups
        wind_groups = base.wind_groups
        wind_dir = base.wind_dir
        gvec = base.gravity
        dia_offs = base.dia_offs
        collect = bool(self.collect_residuals)
        collect_dual = self.collect_residuals is True
        fwd = [(d, d + 1) for d in range(D - 1)]
        bwd = [(d + 1, d) for d in range(D - 1)]

        def refresh(a3):
            """(3, nbf) own rows -> (3, L) with both halos."""
            if D == 1:
                z = jnp.zeros((3, Hf), a3.dtype)
                return jnp.concatenate([z, a3, z], 1)
            from_left = jax.lax.ppermute(a3[:, nbf - Hf:], axis, fwd)
            from_right = jax.lax.ppermute(a3[:, :Hf], axis, bwd)
            return jnp.concatenate([from_left, a3, from_right], 1)

        def combine(b3):
            """(3, L) scatter accumulator -> (3, nbf): own rows + the
            top-halo partials pushed down... sent UP to device d+1 (the
            owner of rows above this slab)."""
            own = b3[:, Hf:Hf + nbf]
            if D == 1:
                return own
            sent = jax.lax.ppermute(b3[:, Hf + nbf:], axis, fwd)
            return own.at[:, :Hf].add(sent)

        def sstep(masks, ancz, dia, x, v, ancu, u):
            masks, ancz, dia = masks[0], ancz[0], dia[0]
            x, v, ancu, u = x[0], v[0], ancu[0], u[0]
            dtp = x.dtype
            aw2 = masks[0]
            mvec = masks[1]
            invd = masks[2]

            def pdot(a, b):
                return jax.lax.psum(jnp.sum(a * b), axis)

            def matvec(xbuf):
                """A @ xbuf own rows: (3, L) -> (3, nbf). Symmetric-dia
                storage (vals[d, i] = A[i, i+off]); vals carried WITH
                halo so the transpose term reads vals at i-off."""
                acc = jnp.zeros((3, nbf), dtp)
                for dd, off in enumerate(dia_offs):
                    w = dia[dd]
                    if off == 0:
                        acc = acc + w[Hf:Hf + nbf] * xbuf[:, Hf:Hf + nbf]
                    else:
                        acc = acc + (w[Hf:Hf + nbf]
                                     * xbuf[:, Hf + off:Hf + off + nbf])
                        acc = acc + (w[Hf - off:Hf - off + nbf]
                                     * xbuf[:, Hf - off:Hf - off + nbf])
                return acc

            # ---- prologue: park x_pre, gravity, wind, xbar
            x_pre = x
            g3 = jnp.asarray(gvec, dtp)[:, None]
            v = v + jnp.where(mvec[None] > 0, dt * g3, 0.0)
            if wind_groups:
                xbuf = refresh(x)
                vbuf = refresh(v)
                staged = []
                for offs, mrow in wind_groups:
                    px = [[xbuf[a, Hf + o:Hf + o + nbf] for a in range(3)]
                          for o in offs]
                    vm = [
                        (vbuf[a, Hf + offs[0]:Hf + offs[0] + nbf]
                         + vbuf[a, Hf + offs[1]:Hf + offs[1] + nbf]
                         + vbuf[a, Hf + offs[2]:Hf + offs[2] + nbf])
                        * (1.0 / 3.0)
                        for a in range(3)
                    ]
                    e1 = [px[1][a] - px[0][a] for a in range(3)]
                    e2 = [px[2][a] - px[0][a] for a in range(3)]
                    nx = e1[1] * e2[2] - e1[2] * e2[1]
                    ny = e1[2] * e2[0] - e1[0] * e2[2]
                    nz = e1[0] * e2[1] - e1[1] * e2[0]
                    nlen = jnp.sqrt(nx * nx + ny * ny + nz * nz)
                    inv = 1.0 / jnp.where(nlen > 0, nlen, 1.0)
                    nhat = [nx * inv, ny * inv, nz * inv]
                    area = 0.5 * nlen
                    v_n = (nhat[0] * (vm[0] - wind_dir[0])
                           + nhat[1] * (vm[1] - wind_dir[1])
                           + nhat[2] * (vm[2] - wind_dir[2]))
                    scale = ((-1000.0 * 0.33 * dt) * masks[mrow]
                             * area * v_n * jnp.abs(v_n))
                    staged.append([scale * nhat[a] for a in range(3)])
                dv = jnp.zeros((3, L), dtp)
                for (offs, _), f3 in zip(wind_groups, staged):
                    for o in offs:
                        dv = dv.at[:, Hf + o:Hf + o + nbf].add(
                            jnp.stack(f3)
                        )
                v = v + combine(dv)
            xbar = x + dt * v
            Mxbar = mvec[None] * xbar

            rp = jnp.zeros((iters,), dtp)
            rd = jnp.zeros((iters,), dtp)
            zp3 = jnp.zeros((3, nbf), dtp)
            if collect_dual:
                # z_prev seed: D^T W^2 D x_pre = (A - M) x_pre / dt^2
                zp3 = (matvec(refresh(x_pre))
                       - mvec[None] * x_pre) * (1.0 / dt2)

            def admm_it(i, carry):
                x, u, ancu, zp3, rp, rd = carry
                xbuf = refresh(x)
                b = jnp.zeros((3, L), dtp)
                zc = jnp.zeros((3, L), dtp)
                racc = jnp.asarray(0.0, dtp)
                u_new = []
                for g, spec in enumerate(groups):
                    ug = u[g]
                    if spec[0] == "tri":
                        _, offs, cp6, w2, k, lmin, lmax, mrow, lim = spec
                        f = [ug[p] for p in range(6)]
                        for kk, o in enumerate(offs):
                            for a in range(3):
                                for bb in range(2):
                                    w = float(cp6[3 * bb + kk])
                                    if w == 0.0:
                                        continue
                                    f[2 * a + bb] = f[2 * a + bb] + (
                                        w * xbuf[a, Hf + o:Hf + o + nbf]
                                    )
                        z = _tri_body(f, w2, k, lmin, lmax, lim)
                        # dual update gated by validity (phantom-base
                        # divergence — see ops/pallas/cloth_step.py)
                        m01 = masks[mrow]
                        un = [m01 * (f[p] - z[p]) for p in range(6)]
                        if collect:
                            m = masks[mrow]
                            racc = racc + w2 * sum(
                                jnp.sum(m * (un[p] - ug[p]) ** 2)
                                for p in range(6)
                            )
                        mm = w2 * masks[mrow]
                        zu = [mm * (f[p] - 2.0 * un[p]) for p in range(6)]
                        zz = ([mm * (f[p] - un[p]) for p in range(6)]
                              if collect_dual else None)
                        for kk, o in enumerate(offs):
                            for j in range(3):
                                acc = acc2 = None
                                for bb in range(2):
                                    w = float(cp6[3 * bb + kk])
                                    if w == 0.0:
                                        continue
                                    t = w * zu[2 * j + bb]
                                    acc = t if acc is None else acc + t
                                    if collect_dual:
                                        t2 = w * zz[2 * j + bb]
                                        acc2 = (t2 if acc2 is None
                                                else acc2 + t2)
                                if acc is None:
                                    continue
                                b = b.at[j, Hf + o:Hf + o + nbf].add(acc)
                                if collect_dual:
                                    zc = zc.at[
                                        j, Hf + o:Hf + o + nbf
                                    ].add(acc2)
                        pad16 = jnp.zeros((10, nbf), dtp)
                        u_new.append(jnp.concatenate(
                            [jnp.stack(un), pad16], 0))
                    else:  # bend
                        _, offs, arow, w2, k, mrow = spec
                        rows = ((offs[0], offs[2]), (offs[3], offs[2]),
                                (offs[1], offs[2]))
                        denom = (arow[0] ** 2 + arow[1] ** 2
                                 + arow[2] ** 2)
                        inv_denom = (2.0 / denom) if denom > 0 else 0.0
                        mix = 1.0 / (w2 + k)
                        f = [ug[p] for p in range(9)]
                        for r, (oa, ob) in enumerate(rows):
                            for j in range(3):
                                f[3 * r + j] = (
                                    f[3 * r + j]
                                    + xbuf[j, Hf + oa:Hf + oa + nbf]
                                    - xbuf[j, Hf + ob:Hf + ob + nbf]
                                )
                        un = [None] * 9
                        r2b = None
                        for j in range(3):
                            lam = inv_denom * (
                                arow[0] * f[j] + arow[1] * f[3 + j]
                                + arow[2] * f[6 + j]
                            )
                            for r in range(3):
                                fp = f[3 * r + j]
                                pr = fp - 0.5 * arow[r] * lam
                                z = (k * pr + w2 * fp) * mix
                                if collect:
                                    m = masks[mrow]
                                    t = jnp.sum(
                                        m * (fp - z - ug[3 * r + j]) ** 2
                                    )
                                    r2b = t if r2b is None else r2b + t
                                un[3 * r + j] = masks[mrow] * (fp - z)
                        if collect:
                            racc = racc + w2 * r2b
                        mm = w2 * masks[mrow]
                        zu = [mm * (f[p] - 2.0 * un[p]) for p in range(9)]
                        zz = ([mm * (f[p] - un[p]) for p in range(9)]
                              if collect_dual else None)
                        per_corner = (
                            (offs[0], (0,), 1.0),
                            (offs[1], (2,), 1.0),
                            (offs[2], (0, 1, 2), -1.0),
                            (offs[3], (1,), 1.0),
                        )
                        for o, rws, sgn in per_corner:
                            for j in range(3):
                                acc = acc2 = None
                                for r in rws:
                                    t = zu[3 * r + j]
                                    acc = t if acc is None else acc + t
                                    if collect_dual:
                                        t2 = zz[3 * r + j]
                                        acc2 = (t2 if acc2 is None
                                                else acc2 + t2)
                                b = b.at[j, Hf + o:Hf + o + nbf].add(
                                    sgn * acc)
                                if collect_dual:
                                    zc = zc.at[
                                        j, Hf + o:Hf + o + nbf
                                    ].add(sgn * acc2)
                        pad16 = jnp.zeros((7, nbf), dtp)
                        u_new.append(jnp.concatenate(
                            [jnp.stack(un), pad16], 0))
                u = (jnp.stack(u_new) if u_new
                     else jnp.zeros((0, 16, nbf), dtp))

                b3 = combine(b)
                # anchors (row-local)
                dlt = x - ancz
                ancu = jnp.where(aw2[None] > 0, ancu + dlt, 0.0)
                b3 = b3 + aw2[None] * (ancz - ancu)
                if collect:
                    racc = racc + jnp.sum(aw2[None] * dlt * dlt)
                    rp = rp.at[i].set(
                        jnp.sqrt(jax.lax.psum(racc, axis))
                    )
                if collect_dual:
                    zc3 = combine(zc) + aw2[None] * ancz
                    sd = jax.lax.psum(jnp.sum((zc3 - zp3) ** 2), axis)
                    rd = rd.at[i].set(dt2 * jnp.sqrt(sd))
                    zp3 = zc3

                # Jacobi-PCG from the current x
                r = Mxbar + dt2 * b3 - matvec(xbuf)
                z = invd[None] * r
                p = z
                rz = pdot(r, z)

                def body(_, carry):
                    x, r, p, rz = carry
                    Ap = matvec(refresh(p))
                    pAp = pdot(p, Ap)
                    alpha = rz / jnp.where(pAp > 0, pAp, 1.0)
                    x = x + alpha * p
                    r = r - alpha * Ap
                    z = invd[None] * r
                    rz_new = pdot(r, z)
                    beta = rz_new / jnp.where(rz > 0, rz, 1.0)
                    return (x, r, z + beta * p, rz_new)

                x, _, _, _ = jax.lax.fori_loop(
                    0, cg_iters, body, (x, r, p, rz)
                )
                return (x, u, ancu, zp3, rp, rd)

            x, u, ancu, _, rp, rd = jax.lax.fori_loop(
                0, iters, admm_it, (xbar, u, ancu, zp3, rp, rd)
            )
            v = (x - x_pre) * (1.0 / dt)
            return x[None], v[None], ancu[None], u[None], rp, rd

        pd = P(self.axis)
        smapped = jax.shard_map(
            sstep, mesh=self.mesh,
            in_specs=(pd, pd, pd, pd, pd, pd, pd),
            out_specs=(pd, pd, pd, pd, P(), P()),
            check_vma=False,
        )

        def step(params, state):
            masks, ancz, dia = params
            x, v, ancu, u, rp, rd = smapped(
                masks, ancz, dia,
                state["x"], state["v"], state["ancu"], state["u"],
            )
            return {
                "x": x, "v": v, "ancu": ancu, "u": u,
                "t": state["t"] + dt,
            }, rp, rd

        return step

    @property
    def _params(self):
        return (self._masks, self._ancz, self._dia)

    def step(self):
        if self._stepf is None:
            self._stepf = jax.jit(self._make_step(), donate_argnums=(1,))
        self.state, rp, rd = self._stepf(self._params, self.state)
        if self.collect_residuals:
            self.last_primal = rp
        if self.collect_residuals is True:
            self.last_dual = rd
        return True

    def run(self, n_steps: int):
        """Step n times; full ROLLOUT_WINDOW chunks run as ONE jitted
        lax.scan program each (one dispatch per W steps — the same
        amortization the single-device kernel gets from its rollout
        grid). Residual-collecting runs keep per-step dispatch (their
        last_primal/last_dual contract is per-step)."""
        W = self.ROLLOUT_WINDOW
        while not self.collect_residuals and n_steps >= W:
            if W not in self._runf:
                core = self._make_step()

                def runW(params, state):
                    def body(s, _):
                        s2, _rp, _rd = core(params, s)
                        return s2, None

                    out, _ = jax.lax.scan(body, state, None, length=W)
                    return out

                self._runf[W] = jax.jit(runW, donate_argnums=(1,))
            self.state = self._runf[W](self._params, self.state)
            n_steps -= W
        for _ in range(n_steps):
            self.step()
        return True

    def refresh_params(self):
        """After runtime force edits on the originating System
        (`set_force_param` + `recompute_weights()`): re-pack the
        parameter slabs (anchor weights/targets, masks, dia matvec)
        from the System WITHOUT re-partitioning, keeping the live
        sharded state. Edits to compiled-in constants (per-group
        materials, wind direction, gravity) trigger a re-jit. Requires
        construction via `sharded_cloth_from_system`."""
        sysm = getattr(self, "_system", None)
        if sysm is None:
            raise ValueError(
                "refresh_params needs a System reference — build via "
                "sharded_cloth_from_system"
            )
        from ..core.cloth import cloth_from_system

        out = cloth_from_system(sysm)
        assert out is not None, "scene no longer qualifies for the kernel"
        new_base, _ = out
        old = self.base
        assert new_base.N == old.N and new_base.n_groups == old.n_groups
        assert tuple(new_base.dia_offs) == tuple(old.dia_offs)
        recompile = (
            new_base.groups != old.groups
            or not np.array_equal(np.asarray(new_base.wind_dir),
                                  np.asarray(old.wind_dir))
            or not np.array_equal(np.asarray(new_base.gravity),
                                  np.asarray(old.gravity))
            or new_base.wind_groups != old.wind_groups
        )
        state = self.state
        self.base = new_base
        self._build()
        self.state = state
        if recompile:
            self._stepf = None
            self._runf = {}

    # ------------------------------------------------------------- stats

    def comm_stats(self):
        """Analytic per-device traffic per step: every refresh/combine
        moves 3 x Hf lanes per direction — O(grid row length),
        independent of N."""
        itemsize = jnp.dtype(self.base.dtype).itemsize
        per_exchange = 2 * 3 * self.Hf * itemsize
        per_cg = per_exchange + 2 * itemsize
        n_wind = 2 if self.base.wind_groups else 0
        per_admm = (per_exchange          # x refresh
                    + per_exchange // 2   # RHS combine (one direction)
                    + self.cg_iters * per_cg)
        per_step = (self.admm_iters * per_admm
                    + n_wind * per_exchange)
        return {
            "n_devices": self.D,
            "halo_lanes": self.Hf,
            "bytes_per_cg_iter": per_cg,
            "bytes_per_admm_iter": per_admm,
            "bytes_per_step": per_step,
        }

    def measured_comm(self):
        """Collective inventory of the compiled step (parallel/comm.py):
        max_op_bytes is O(halo lanes), never O(N)."""
        from .comm import compiled_hlo_text, hlo_collective_report

        if self._stepf is None:
            self._stepf = jax.jit(self._make_step(), donate_argnums=(1,))
        rep = hlo_collective_report(
            compiled_hlo_text(self._stepf, self._params, self.state)
        )
        rep["admm_iters"] = self.admm_iters
        rep["cg_iters"] = self.cg_iters
        return rep


def sharded_cloth_from_system(system, mesh, axis: str = "elem"):
    """Build a ShardedClothStepper from an initialized System whose
    scene routed onto the cloth whole-timestep kernel. Returns
    (stepper, to_canonical) or None."""
    from ..core.cloth import ClothStepper, cloth_from_system

    lat = getattr(system, "_lattice", None)
    if isinstance(lat, ClothStepper):
        base, cid = lat, system._to_canon
    else:
        out = cloth_from_system(system)
        if out is None:
            return None
        base, cid = out
    try:
        spmd = ShardedClothStepper(base, mesh, axis=axis)
    except ValueError:
        return None
    spmd._system = system  # enables refresh_params (runtime force edits)
    return spmd, cid
