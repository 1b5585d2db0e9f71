"""Element-sharded banded fast path (parallel/banded_spmd.py).

Validation chain:
  mega whole-timestep kernel (tests/test_banded.py, oracle-validated)
    <- ShardedBandedStepper D=1/D=8 xla backend (small mesh, full depth)
    <- pallas local kernel (interpret) vs xla twin (same body functions,
       different reduction order -> f64 round-off level agreement)
    <- 100k-tet D=8 vs D=1 compiled-CPU parity (slow tier)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from admm_elastic_tpu import Settings, System
from admm_elastic_tpu.geometry import make_beam_tets
from admm_elastic_tpu.models import (
    Collision,
    ExplicitForce,
    Floor,
    HyperElasticTet,
    LinearTetStrain,
    StaticAnchor,
)
from admm_elastic_tpu.parallel.banded_spmd import (
    ShardedBandedStepper,
    sharded_banded_from_system,
)

F64 = jnp.float64


def _need_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} virtual devices")


def _build(dims=(10, 6, 6), model="nh", admm_iters=6, cg=15, floor=None,
           **kw):
    beam = make_beam_tets(*dims, **kw)
    n = beam.n_vertices
    s = System(Settings(timestep_s=0.04, admm_iters=admm_iters, verbose=0,
                        dtype=F64, global_solver="dia",
                        cg_fixed_iters=cg, lattice_fast_path=True))
    s.add_nodes(beam.vertices, np.full(n, 50.0 / n))
    s.add_force(StaticAnchor(np.flatnonzero(beam.vertices[:, 0] < 1e-9)))
    if model == "arap":
        s.add_force(LinearTetStrain(beam.tets, stiffness=1e4))
    else:
        s.add_force(HyperElasticTet(beam.tets, mu=1e5, lam=1e5,
                                    max_iters=5, model=model))
    if floor is not None:
        s.add_force(Collision([Floor((0, floor, 0))], n_nodes=n))
    s.add_explicit_force(ExplicitForce(direction=(0, -9.8, 0)))
    assert s.initialize()
    assert s._lattice is not None
    return s


@pytest.mark.parametrize("model", ["nh", "stvk", "arap"])
def test_sharded_matches_mega_kernel(model):
    """Full-depth trajectory parity vs the single-device whole-timestep
    kernel (which test_banded.py validates against the general path)."""
    _need_devices(8)
    ref = _build(model=model)
    base = _build(model=model)._lattice
    spmd = ShardedBandedStepper(
        base, jax.make_mesh((8,), ("elem",)), backend="xla"
    )
    for _ in range(5):
        ref._lattice.step()
        spmd.step()
    err = np.abs(ref._lattice.x - spmd.x).max()
    assert err < 1e-8, f"{model}: {err}"


def test_sharded_with_collision_floor():
    _need_devices(2)
    ref = _build(dims=(6, 4, 4), floor=-0.2, admm_iters=4, cg=10)
    base = _build(dims=(6, 4, 4), floor=-0.2, admm_iters=4, cg=10)._lattice
    spmd = ShardedBandedStepper(
        base, jax.make_mesh((2,), ("elem",)), backend="xla"
    )
    for _ in range(8):  # enough steps to actually hit the floor
        ref._lattice.step()
        spmd.step()
    assert np.abs(ref._lattice.x - spmd.x).max() < 1e-8
    # the floor actually engaged
    assert spmd.x[:, 1].min() > -0.25


def test_pallas_local_kernel_matches_xla_twin():
    """The pallas local-phase kernel and the vmapped XLA twin share the
    same body functions; agreement is reduction-order round-off."""
    _need_devices(2)
    import admm_elastic_tpu.parallel.banded_spmd as bs
    from admm_elastic_tpu.ops.pallas import banded_local as bl

    orig = bl.banded_local_rhs

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    sx = ShardedBandedStepper(
        _build(dims=(6, 4, 4), admm_iters=3, cg=10)._lattice,
        jax.make_mesh((2,), ("elem",)), backend="xla",
    )
    old = bs.banded_local_rhs
    bs.banded_local_rhs = interp
    try:
        sp = ShardedBandedStepper(
            _build(dims=(6, 4, 4), admm_iters=3, cg=10)._lattice,
            jax.make_mesh((2,), ("elem",)), backend="pallas",
        )
        for _ in range(2):
            sx.step()
            sp.step()
    finally:
        bs.banded_local_rhs = old
    assert np.abs(sx.x - sp.x).max() < 1e-7


def test_primal_residual_collection():
    _need_devices(2)
    ref = _build(admm_iters=6)
    ref.settings.collect_residuals = "primal"
    sys2 = _build(admm_iters=6)
    sys2.settings.collect_residuals = "primal"
    # rebuild steppers with residual collection on
    from admm_elastic_tpu.core.banded import banded_from_system

    b1, _ = banded_from_system(ref)
    b2, _ = banded_from_system(sys2)
    spmd = ShardedBandedStepper(
        b2, jax.make_mesh((2,), ("elem",)), backend="xla"
    )
    b1.step()
    spmd.step()
    rp_ref = np.asarray(b1.last_primal)[0]  # (n_steps=1, iters)
    rp_spmd = np.asarray(spmd.last_primal)
    # psum CG dots reorder the reductions -> alpha/beta differ at f64
    # round-off, and that trajectory divergence shows up amplified in the
    # late (small) residuals; 1e-5 relative is the honest bound here
    np.testing.assert_allclose(rp_spmd, rp_ref, rtol=1e-5, atol=1e-10)
    assert rp_spmd[-1] < rp_spmd[0]


def test_from_system_and_qualification():
    _need_devices(2)
    mesh = jax.make_mesh((2,), ("elem",))
    sys_ = _build(admm_iters=3)
    out = sharded_banded_from_system(sys_, mesh)
    assert out is not None
    spmd, cid = out
    spmd.step()
    assert np.isfinite(spmd.x).all()
    # comm volume is O(band), independent of mesh size
    small = sharded_banded_from_system(_build(dims=(6, 4, 4)), mesh)[0]
    assert (spmd.comm_stats()["bytes_per_cg_iter"]
            == small.comm_stats()["bytes_per_cg_iter"])
    # measured-HLO audit: no collective in the compiled step exceeds a
    # halo-slab payload (catches silent GSPMD re-replication)
    from admm_elastic_tpu.parallel.comm import assert_no_fat_collectives

    rep = spmd.measured_comm()
    assert rep["counts"]
    stats = spmd.comm_stats()
    limit = max(stats["halo_rows"] * 128 * 3 * 8 * 4, 65536)
    assert_no_fat_collectives(rep, limit)


@pytest.mark.slow
def test_sharded_100k_parity_8dev():
    """VERDICT r3 #1 'done' criterion: 8-virtual-device trajectory
    parity at 100k tets, compiled CPU (xla local backend), vs D=1."""
    _need_devices(8)

    def mk():
        return _build(dims=(40, 25, 20), admm_iters=4, cg=15,
                      size=0.05)._lattice

    s1 = ShardedBandedStepper(mk(), jax.make_mesh((1,), ("elem",)),
                              backend="xla")
    s8 = ShardedBandedStepper(mk(), jax.make_mesh((8,), ("elem",)),
                              backend="xla")
    for _ in range(2):
        s1.step()
        s8.step()
    err = np.abs(s1.x - s8.x).max()
    assert err < 1e-8, err
    stats = s8.comm_stats()
    # O(n)-free traffic: < 5 MB/step at 100k tets (the replicated
    # design moved ~0.5 MB per CG iteration at this scale)
    assert stats["bytes_per_step"] < 5 * 2**20


def test_refresh_params_release():
    """VERDICT r4 #4: the poordillo release flow on the sharded banded
    kernel — zero an anchor's weight at runtime, recompute_weights +
    refresh_params, and keep trajectory parity with the single-device
    kernel doing the identical edit (state carried, no re-partition)."""
    _need_devices(2)
    from admm_elastic_tpu.core.banded import banded_from_system

    sysA = _build(admm_iters=4, cg=10)
    sysB = _build(admm_iters=4, cg=10)
    latA = sysA._lattice
    spmd, _ = sharded_banded_from_system(
        sysB, jax.make_mesh((2,), ("elem",)), backend="xla"
    )
    for _ in range(3):
        latA.step()
        spmd.step()

    def release(sysm):
        anchor = sysm.forces[0]
        n_anc = len(np.asarray(sysm.params[anchor.name]["indices"]))
        sysm.set_force_param(anchor, "weight", np.zeros(n_anc))
        sysm.recompute_weights()

    release(sysA)
    release(sysB)
    # single-device: rebuild the kernel from the edited system, carry
    # the live plane state (deterministic layout)
    latA2, _ = banded_from_system(sysA)
    latA2.state = latA.state
    spmd.refresh_params()
    x_before = spmd.x.copy()
    for _ in range(4):
        latA2.step()
        spmd.step()
    err = np.abs(latA2.x - spmd.x).max()
    assert err < 1e-8, err
    # the released beam actually fell
    assert (spmd.x[:, 1].min() - x_before[:, 1].min()) < -1e-3


def test_refresh_params_requires_system():
    _need_devices(2)
    spmd = ShardedBandedStepper(
        _build(dims=(6, 4, 4), admm_iters=3, cg=8)._lattice,
        jax.make_mesh((2,), ("elem",)), backend="xla",
    )
    with pytest.raises(ValueError, match="from_system"):
        spmd.refresh_params()


def test_run_scan_window_matches_per_step():
    """run(n) fuses ROLLOUT_WINDOW-sized chunks into one lax.scan
    program; the scanned trajectory must equal per-step dispatch."""
    _need_devices(2)
    a = ShardedBandedStepper(
        _build(dims=(6, 4, 4), admm_iters=3, cg=8)._lattice,
        jax.make_mesh((2,), ("elem",)), backend="xla",
    )
    b = ShardedBandedStepper(
        _build(dims=(6, 4, 4), admm_iters=3, cg=8)._lattice,
        jax.make_mesh((2,), ("elem",)), backend="xla",
    )
    W = a.ROLLOUT_WINDOW
    a.run(W + 2)          # one scan chunk + 2 per-step
    for _ in range(W + 2):
        b.step()
    np.testing.assert_allclose(a.x, b.x, atol=1e-12)


def test_cheb_solver_trajectory_and_quality():
    """Dot-product-free Chebyshev global solve (parallel/cheb.py):
    at an adequate budget it tracks the near-exact solve, and the
    pallas chunked kernel (ops/pallas/cheb_dia.py, interpret) matches
    the XLA-level recurrence."""
    _need_devices(2)
    import admm_elastic_tpu.parallel.banded_spmd as bs
    from admm_elastic_tpu.ops.pallas import banded_local as bl

    mesh = jax.make_mesh((2,), ("elem",))
    ref = ShardedBandedStepper(
        _build(dims=(6, 4, 4), admm_iters=4, cg=200)._lattice, mesh,
        backend="xla")
    ch = ShardedBandedStepper(
        _build(dims=(6, 4, 4), admm_iters=4, cg=10)._lattice, mesh,
        backend="xla", solver="cheb", cheb_iters=80)

    orig = bl.banded_local_rhs

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    bs.banded_local_rhs = interp
    try:
        chk = ShardedBandedStepper(
            _build(dims=(6, 4, 4), admm_iters=4, cg=10)._lattice, mesh,
            backend="pallas", solver="cheb", cheb_iters=80)
        for _ in range(4):
            ref.step()
            ch.step()
            chk.step()
    finally:
        bs.banded_local_rhs = orig
    # kernel chunks == XLA recurrence (same math, reduction reorder)
    assert np.abs(ch.x - chk.x).max() < 1e-7
    # adequate budget tracks the near-exact solve
    scale = np.abs(ref.x).max()
    assert np.abs(ch.x - ref.x).max() < 2e-3 * scale


def test_cheb_step_has_no_allreduce():
    """THE point of the Chebyshev solve: the compiled multi-device step
    contains NO all-reduce — the global solve runs without a single
    cross-device scalar (CG needs 2 psums per iteration). Halo
    ppermutes are the only collectives."""
    _need_devices(2)
    spmd = ShardedBandedStepper(
        _build(dims=(6, 4, 4), admm_iters=3, cg=8)._lattice,
        jax.make_mesh((2,), ("elem",)), backend="xla",
        solver="cheb", cheb_iters=12,
    )
    rep = spmd.measured_comm()
    assert rep["counts"].get("collective-permute", 0) > 0
    assert rep["counts"].get("all-reduce", 0) == 0, rep["counts"]
    # and the CG variant DOES carry all-reduces (the contrast)
    cgv = ShardedBandedStepper(
        _build(dims=(6, 4, 4), admm_iters=3, cg=8)._lattice,
        jax.make_mesh((2,), ("elem",)), backend="xla",
    )
    assert cgv.measured_comm()["counts"].get("all-reduce", 0) > 0


def test_mg_solver_matched_quality_and_parity():
    """Sharded geometric V-cycles with the dot-free Chebyshev outer
    (solver='mg', VERDICT r4 #2 machinery on the banded family):
    near-exact solves at a 10-cycle budget, device-count independent."""
    _need_devices(4)
    mesh1 = jax.make_mesh((1,), ("elem",))
    ref = ShardedBandedStepper(
        _build(admm_iters=5, cg=200)._lattice, mesh1, backend="xla")
    for _ in range(5):
        ref.step()
    outs = {}
    for Dv in (1, 4):
        mg, _ = sharded_banded_from_system(
            _build(admm_iters=5, cg=10),
            jax.make_mesh((Dv,), ("elem",)), backend="xla",
            solver="mg", mg_cycles=10)
        for _ in range(5):
            mg.step()
        outs[Dv] = mg.x
    scale = np.abs(ref.x).max()
    # near-exact (the cg10 budget alone would be ~1e-2 off)
    assert np.abs(outs[1] - ref.x).max() < 1e-5 * max(scale, 1.0)
    # device-count invariant to round-off
    assert np.abs(outs[1] - outs[4]).max() < 1e-9


def test_mg_refresh_params_release():
    """Runtime release on the mg solver: the spectrum-derived cheb
    schedule is compiled in, so refresh_params must rebuild AND
    re-jit — a stale schedule (or stale planes) would diverge from the
    near-exact reference after the edit."""
    _need_devices(2)

    def released(sysm):
        anchor = sysm.forces[0]
        n_anc = len(np.asarray(sysm.params[anchor.name]["indices"]))
        keep = np.zeros(n_anc)
        keep[: n_anc // 2] = 1000.0  # release half the anchored face
        sysm.set_force_param(anchor, "weight", keep)
        sysm.recompute_weights()

    sys_ref = _build(dims=(8, 4, 4), admm_iters=4, cg=200)
    ref, _ = sharded_banded_from_system(
        sys_ref, jax.make_mesh((1,), ("elem",)), backend="xla")
    sys_mg = _build(dims=(8, 4, 4), admm_iters=4, cg=10)
    mg, _ = sharded_banded_from_system(
        sys_mg, jax.make_mesh((2,), ("elem",)), backend="xla",
        solver="mg", mg_cycles=12)
    for _ in range(2):
        ref.step()
        mg.step()
    released(sys_ref)
    ref.refresh_params()
    released(sys_mg)
    mg.refresh_params()
    for _ in range(3):
        ref.step()
        mg.step()
    scale = max(np.abs(ref.x).max(), 1.0)
    assert np.abs(mg.x - ref.x).max() < 1e-4 * scale


def test_mg_step_collectives_are_small():
    """The mg step's only non-ppermute collective is the KB-sized
    coarsest pack psum — never an O(n) reduction."""
    _need_devices(2)
    mg, _ = sharded_banded_from_system(
        _build(admm_iters=3, cg=8),
        jax.make_mesh((2,), ("elem",)), backend="xla",
        solver="mg", mg_cycles=6)
    rep = mg.measured_comm()
    assert rep["counts"].get("collective-permute", 0) > 0
    # all-reduce payloads: (3, np2, 128) f64 at most
    np2 = 4
    limit = 3 * np2 * 128 * 8
    for op in rep["ops"]:
        if op.kind == "all-reduce":
            assert op.bytes <= limit, (op.bytes, op.line)


def test_sharded_uell_arbitrary_topology():
    """VERDICT r4 #3: ARBITRARY topology at headline speed goes
    multi-chip — the per-row-offset ELL matvec (slots + layered folds,
    core/uell.py) is row-distance-bounded, so it rides the same slab
    seam. Trajectory parity vs the single-device whole-timestep kernel
    on a Delaunay tetrahedralization."""
    _need_devices(4)
    from test_uell import _build_system as _build_uell, _delaunay_mesh

    pts, tets = _delaunay_mesh(9, 6, 5)
    ref_sys = _build_uell(pts, tets, fast=True)
    ref = ref_sys._lattice
    assert ref._uell is not None
    for _ in range(5):
        ref.step()
    for Dv in (2, 4):
        sp = ShardedBandedStepper(
            _build_uell(pts, tets, fast=True)._lattice,
            jax.make_mesh((Dv,), ("elem",)), backend="xla")
        for _ in range(5):
            sp.step()
        err = np.abs(sp.x - ref.x).max()
        assert err < 1e-8, (Dv, err)
    # comm stays O(reach), never O(n): audit the compiled collectives
    sp2 = ShardedBandedStepper(
        _build_uell(pts, tets, fast=True)._lattice,
        jax.make_mesh((2,), ("elem",)), backend="xla")
    from admm_elastic_tpu.parallel.comm import assert_no_fat_collectives

    stats = sp2.comm_stats()
    limit = max(stats["halo_rows"] * 128 * 3 * 8 * 4, 65536)
    assert_no_fat_collectives(sp2.measured_comm(), limit)


def test_sharded_uell_cheb_solver():
    """Round-5 close of the last sharded-solver gap: the dot-product-
    free Chebyshev global solve on the ARBITRARY-TOPOLOGY (uell) path.
    Spectral bounds come from the slot/fold planes themselves
    (parallel/cheb.uell_operator_bounds assembles (I+F_m)...(I+F_1)S
    exactly as core/uell.uell_matvec_np applies it); the compiled
    multi-device step carries ZERO all-reduces, and at an adequate
    budget the trajectory tracks a deep-CG near-exact solve
    device-count-independently."""
    _need_devices(4)
    from test_uell import _build_system as _build_uell, _delaunay_mesh

    pts, tets = _delaunay_mesh(9, 6, 5)
    mesh2 = jax.make_mesh((2,), ("elem",))

    ref_lat = _build_uell(pts, tets, fast=True)._lattice
    ref_lat.cg_iters = 200  # near-exact reference solve
    ref = ShardedBandedStepper(ref_lat, mesh2, backend="xla")

    ch = ShardedBandedStepper(
        _build_uell(pts, tets, fast=True)._lattice, mesh2,
        backend="xla", solver="cheb", cheb_iters=120)
    lmin, lmax = ch.cheb_bounds
    assert 0 < lmin < lmax, ch.cheb_bounds
    for _ in range(4):
        ref.step()
        ch.step()
    scale = np.abs(ref.x).max()
    assert np.abs(ch.x - ref.x).max() < 2e-3 * scale

    # the recurrence has no reductions and each row is summed by its
    # owner in plane order -> device-count independent to round-off
    ch4 = ShardedBandedStepper(
        _build_uell(pts, tets, fast=True)._lattice,
        jax.make_mesh((4,), ("elem",)), backend="xla",
        solver="cheb", cheb_iters=120)
    for _ in range(4):
        ch4.step()
    assert np.abs(ch4.x - ch.x).max() < 1e-12

    # THE point on a mesh: no all-reduce anywhere in the compiled step
    rep = ch.measured_comm()
    assert rep["counts"].get("collective-permute", 0) > 0
    assert rep["counts"].get("all-reduce", 0) == 0, rep["counts"]


def test_two_level_host_chip_mesh():
    """SURVEY §2.7's ICI/DCN hierarchy: the stepper runs over a
    ('host','chip') 2x4 mesh (slabs host-major on the flattened product
    axis), matches the flat 8-device decomposition, and comm_stats
    splits the boundary traffic by link class (only hosts-1 of the D-1
    slab edges cross the host level)."""
    _need_devices(8)
    from jax.sharding import Mesh

    flat = ShardedBandedStepper(
        _build(admm_iters=4, cg=10)._lattice,
        jax.make_mesh((8,), ("elem",)), backend="xla")
    hc = ShardedBandedStepper(
        _build(admm_iters=4, cg=10)._lattice,
        Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
             ("host", "chip")),
        axis=("host", "chip"), backend="xla")
    for _ in range(4):
        flat.step()
        hc.step()
    # identical decomposition, identical arithmetic -> exact parity
    np.testing.assert_array_equal(flat.x, hc.x)
    stats = hc.comm_stats()
    assert stats["hosts"] == 2 and stats["interhost_edges"] == 1
    assert (stats["bytes_per_step_interhost"]
            + stats["bytes_per_step_intrahost"]
            == stats["bytes_per_step"] // 7 * 7)
    # 1 of 7 slab edges crosses DCN
    assert stats["bytes_per_step_interhost"] * 6 \
        == stats["bytes_per_step_intrahost"]


def test_pad_lanes_do_not_freefall():
    """Mass-0 pad/halo lanes must not accumulate gravity velocity: an
    ungated kick gives |v_pad| = g*t growing without bound (phantom
    state that NaN-poisons long f32 runs). Advisor r4 medium finding."""
    _need_devices(2)
    spmd = ShardedBandedStepper(
        _build(dims=(6, 4, 4), admm_iters=3, cg=8)._lattice,
        jax.make_mesh((2,), ("elem",)), backend="xla",
    )
    from admm_elastic_tpu.core.banded import LANES
    from admm_elastic_tpu.ops.pallas.banded_local import P2D_PLANES, PMASS

    for _ in range(30):
        spmd.step()
    D, Lr = spmd.D, spmd.Lr
    p2d = np.asarray(spmd._p2d).reshape(D, P2D_PLANES, Lr, LANES)
    mass = p2d[:, PMASS]                       # (D, Lr, 128)
    v = np.asarray(spmd.state["v"]).reshape(D, 3, Lr, LANES)
    # every lane with zero mass carries exactly zero velocity and a
    # finite (parked) position
    pad = mass == 0
    assert pad.any()  # the test is vacuous without pad lanes
    for a in range(3):
        assert np.abs(v[:, a][pad]).max() == 0.0
    x = np.asarray(spmd.state["x"]).reshape(D, 3, Lr, LANES)
    for a in range(3):
        assert np.isfinite(x[:, a][pad]).all()


@pytest.mark.slow
def test_sharded_100k_full_depth_envelope():
    """VERDICT r4 #5: FULL production depth at 100k (10 ADMM iterations,
    the matched cg75 budget), D=8 vs D=1. Pointwise parity is impossible
    at this depth (psum reduction reorder diverges chaotically through
    prox branches, measured ~2000x/step at 100k — identical physics,
    different round-off); what must and does hold is the physical
    ENVELOPE: per-step extent and final primal-residual trajectories of
    D=8 track D=1 within percent-level bounds over many steps."""
    _need_devices(8)

    def run(n_dev, steps=10):
        s = _build(dims=(40, 25, 20), admm_iters=10, cg=75, size=0.05)
        s.settings.collect_residuals = "primal"
        from admm_elastic_tpu.core.banded import banded_from_system

        b, _ = banded_from_system(s)
        st = ShardedBandedStepper(
            b, jax.make_mesh((n_dev,), ("elem",)), backend="xla")
        ext, res = [], []
        for _ in range(steps):
            st.step()
            x = st.x
            ext.append([x[:, a].max() - x[:, a].min() for a in range(3)])
            res.append(float(np.asarray(st.last_primal)[-1]))
        assert np.isfinite(x).all()
        return np.array(ext), np.array(res)

    e1, r1 = run(1)
    e8, r8 = run(8)
    # extent trajectories track to <1% of the body size, every step
    scale = e1.max()
    assert np.abs(e1 - e8).max() < 0.01 * scale, np.abs(e1 - e8).max()
    # converged residual trajectories track to ~10% relative
    np.testing.assert_allclose(r8, r1, rtol=0.1)


def test_sharded_detach_resume():
    """detach() maps the slab/chunk state back into the single-device
    whole-timestep stepper: continuing there tracks continuing sharded."""
    _need_devices(4)
    a = _build(admm_iters=4, cg=10)._lattice
    b = _build(admm_iters=4, cg=10)._lattice
    spmd = ShardedBandedStepper(
        b, jax.make_mesh((4,), ("elem",)), backend="xla"
    )
    for _ in range(3):
        a.step()
        spmd.step()
    base = spmd.detach()
    # detach is a pure relayout: bitwise-equal to the sharded state
    np.testing.assert_array_equal(base.x, spmd.x)
    for _ in range(3):
        a.step()
        base.step()
    assert np.abs(base.x - a.x).max() < 1e-8
