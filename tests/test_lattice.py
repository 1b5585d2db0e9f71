"""Lattice single-kernel timestep vs the general System path."""

import jax.numpy as jnp
import numpy as np

from admm_elastic_tpu import Settings, System
from admm_elastic_tpu.core.lattice import LatticeStepper
from admm_elastic_tpu.geometry import make_beam_tets
from admm_elastic_tpu.models import ExplicitForce, HyperElasticTet, StaticAnchor


def test_group_tables_match_mesh():
    """The per-group selector tables reproduce the per-element mesh data:
    tet indices are base+offset and B is the group constant."""
    from admm_elastic_tpu.models.tet import build_tet_basis
    from admm_elastic_tpu.ops.pallas.lattice_step import (
        _EVEN,
        _ODD,
        corner_offsets,
        group_tables,
    )

    nx, ny, nz, size = 3, 2, 2, 0.25
    beam = make_beam_tets(nx, ny, nz, size)
    B, vol = build_tet_basis(beam.vertices, beam.tets)
    offs = corner_offsets(ny + 1, nz + 1)
    groups = group_tables(size)

    e = 0
    for i in range(nx):
        for j in range(ny):
            for k in range(nz):
                base = (i * (ny + 1) + j) * (nz + 1) + k
                parity = (i + j + k) % 2
                pattern = _EVEN if parity == 0 else _ODD
                for s, corners in enumerate(pattern):
                    g = parity * 5 + s
                    gc, gp, cp, gvol = groups[g]
                    assert gc == corners and gp == parity
                    expect_idx = [base + offs[c] for c in corners]
                    assert list(beam.tets[e]) == expect_idx
                    np.testing.assert_allclose(cp, B[e].T, atol=1e-12)
                    np.testing.assert_allclose(gvol, vol[e], rtol=1e-12)
                    e += 1


def _general_system(beam, masses, anchors, mu, lam, dt, iters, cg, backend):
    sys_ = System(Settings(timestep_s=dt, admm_iters=iters, verbose=0,
                           dtype=jnp.float64, global_solver="dia",
                           cg_fixed_iters=cg))
    sys_.add_nodes(beam.vertices, masses)
    sys_.add_force(StaticAnchor(anchors))
    sys_.add_force(HyperElasticTet(beam.tets, mu, lam, max_iters=5,
                                   model="nh", backend=backend))
    sys_.add_explicit_force(ExplicitForce(direction=(0, -9.8, 0)))
    assert sys_.initialize()
    return sys_


def test_lattice_stepper_matches_general_system():
    """Whole-timestep kernel == general System (dia solver): exact against
    the pallas backend (identical prox code), loose against the xla backend
    (newton_minimize vs in-kernel Newton differ in line-search fp detail)."""
    nx, ny, nz, size = 4, 3, 2, 0.2
    mu = lam = 2e4
    dt, iters, cg = 0.04, 8, 40
    beam = make_beam_tets(nx, ny, nz, size)
    n = beam.n_vertices
    masses = np.full(n, 2.0 / n)
    anchors = np.flatnonzero(beam.vertices[:, 0] < 1e-9)

    sys_p = _general_system(beam, masses, anchors, mu, lam, dt, iters, cg,
                            "pallas")
    sys_x = _general_system(beam, masses, anchors, mu, lam, dt, iters, cg,
                            "xla")
    lat = LatticeStepper(nx, ny, nz, size, masses, mu, lam, anchors,
                         dt=dt, admm_iters=iters, newton_iters=5,
                         cg_iters=cg, dtype=jnp.float64)

    for s in range(6):
        sys_p.step()
        sys_x.step()
        lat.step()
        err = np.abs(np.asarray(sys_p.x) - np.asarray(lat.x)).max()
        assert err < 1e-6, f"step {s}: max|dx| vs pallas = {err}"
        errx = np.abs(np.asarray(sys_x.x) - np.asarray(lat.x)).max()
        assert errx < 5e-3, f"step {s}: max|dx| vs xla = {errx}"
    assert np.isfinite(np.asarray(lat.x)).all()
    # the beam actually moved (sagged under gravity)
    assert np.asarray(lat.x)[:, 1].min() < beam.vertices[:, 1].min() - 1e-4


def test_lattice_rollout_matches_stepping():
    nx, ny, nz, size = 3, 2, 2, 0.2
    beam = make_beam_tets(nx, ny, nz, size)
    n = beam.n_vertices
    masses = np.full(n, 1.0 / n)
    anchors = np.flatnonzero(beam.vertices[:, 0] < 1e-9)

    def mk():
        return LatticeStepper(nx, ny, nz, size, masses, 1e4, 1e4, anchors,
                              dt=0.04, admm_iters=5, cg_iters=30,
                              dtype=jnp.float64)

    a, b = mk(), mk()
    for _ in range(4):
        a.step()
    b.run(4)
    np.testing.assert_allclose(np.asarray(a.x), np.asarray(b.x),
                               rtol=1e-12, atol=1e-12)
