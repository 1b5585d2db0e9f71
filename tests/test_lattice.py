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


def test_detect_lattice_scrambled_numbering():
    """detect_lattice recovers (dims, size, origin, permutation) from a
    randomly renumbered, translated beam; rejects non-lattice meshes."""
    from admm_elastic_tpu.core.lattice import detect_lattice

    beam = make_beam_tets(4, 3, 2, size=0.3)
    verts = beam.vertices + np.array([1.5, -2.0, 0.25])
    rng = np.random.default_rng(0)
    perm = rng.permutation(beam.n_vertices)  # new_id = perm_pos
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    sverts = verts[perm]
    stets = inv[beam.tets]
    det = detect_lattice(sverts, stets)
    assert det is not None
    nx, ny, nz, size, origin, cid = det
    assert (nx, ny, nz) == (4, 3, 2)
    assert abs(size - 0.3) < 1e-9
    np.testing.assert_allclose(origin, [1.5, -2.0, 0.25], atol=1e-9)
    # cid maps back to canonical ids consistently with positions
    canon = make_beam_tets(nx, ny, nz, size).vertices + origin
    np.testing.assert_allclose(canon[cid], sverts, atol=1e-9)

    # a stretched (non-cubic) lattice must NOT qualify
    bad = sverts.copy()
    bad[:, 0] *= 1.7
    assert detect_lattice(bad, stets) is None


def _lat_system(beam_or_verts, tets, masses, dt, iters, cg, fast,
                model="nh", mu=1e4, lam=1e4, floor_y=None, anchors=None):
    from admm_elastic_tpu.models import Collision, Floor, LinearTetStrain

    verts = beam_or_verts
    sys_ = System(Settings(timestep_s=dt, admm_iters=iters, verbose=0,
                           dtype=jnp.float64, global_solver="dia",
                           cg_fixed_iters=cg, lattice_fast_path=fast))
    sys_.add_nodes(verts, masses)
    if anchors is not None and len(anchors):
        sys_.add_force(StaticAnchor(anchors))
    if model == "arap":
        sys_.add_force(LinearTetStrain(tets, stiffness=mu))
    else:
        sys_.add_force(HyperElasticTet(tets, mu, lam, max_iters=5,
                                       model=model))
    if floor_y is not None:
        sys_.add_force(Collision([Floor(center=(0, floor_y, 0))],
                                 n_nodes=len(verts)))
    sys_.add_explicit_force(ExplicitForce(direction=(0, -9.8, 0)))
    assert sys_.initialize()
    return sys_


def _lat_compare(model, floor_y=None, scramble=False, atol=2e-5,
                 mu=1e4, lam=1e4):
    beam = make_beam_tets(3, 2, 2, size=0.25)
    verts, tets = beam.vertices, beam.tets
    if scramble:
        rng = np.random.default_rng(1)
        perm = rng.permutation(beam.n_vertices)
        inv = np.empty_like(perm)
        inv[perm] = np.arange(len(perm))
        verts, tets = verts[perm], inv[tets]
    n = len(verts)
    masses = np.full(n, 1.0 / n)
    anchors = np.flatnonzero(verts[:, 0] < 1e-9) if floor_y is None else None
    args = (verts, tets, masses, 0.04, 6, 25)
    kw = dict(model=model, mu=mu, lam=lam, floor_y=floor_y, anchors=anchors)
    if floor_y is not None:
        # floor-only scene still needs an anchor for lattice qualification
        kw["anchors"] = np.flatnonzero(verts[:, 0] < 1e-9)
    gen = _lat_system(*args, fast=False, **kw)
    fast = _lat_system(*args, fast=True, **kw)
    assert fast._lattice is not None, "lattice fast path did not engage"
    for _ in range(4):
        gen.step()
        fast.step()
    assert np.isfinite(fast.x).all()
    np.testing.assert_allclose(fast.x, gen.x, atol=atol)


def test_lattice_fast_path_via_system_nh():
    _lat_compare("nh")


def test_lattice_fast_path_via_system_nh_lam4mu():
    """lam = 4*mu (ordinary Poisson ratio): the parameter regime where
    the round-1 NH prox Hessian bug hid (mu==lam masked the missing
    +lam*inv^2 diagonal term)."""
    _lat_compare("nh", mu=2.5e3, lam=1e4)


def test_lattice_fast_path_via_system_stvk():
    _lat_compare("stvk", mu=100.0, lam=400.0)


def test_lattice_fast_path_via_system_arap():
    _lat_compare("arap", mu=1e4)


def test_lattice_fast_path_floor_collision():
    """In-kernel CollisionForce floor (plinko-like) matches the general
    path's Collision model, and the body rests above the floor."""
    _lat_compare("nh", floor_y=-0.3)


def test_lattice_fast_path_scrambled_numbering():
    """A randomly renumbered lattice engages the fast path via
    detect_lattice's canonical permutation and matches the general path
    in the CALLER's numbering."""
    _lat_compare("nh", scramble=True)
