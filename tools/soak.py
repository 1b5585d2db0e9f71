"""Long-rollout stability soak for production-serving confidence.

Runs flagship workloads for thousands of timesteps on the chip and
checks what short benches cannot: slow NaN drift, energy blow-up,
anchor creep, dual-variable growth. The reference has no analogous
harness (its samples run interactively until closed).

Usage (default env = the real chip):
    timeout -k 15 2400 python -u tools/soak.py [--steps 2000] [--cpu]

Prints one line per workload: PASS/FAIL + drift diagnostics.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def soak_windyflag(steps):
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

    mesh = make_sym_plane(24, 24)
    n = mesh.n_vertices
    s = System(Settings(timestep_s=0.04, admm_iters=30, verbose=0,
                        dtype=jnp.float32, global_solver="dia",
                        cg_fixed_iters=30, lattice_fast_path=True))
    s.add_nodes(mesh.vertices, np.full(n, 0.5 / n))
    s.add_force(LimitedTriangleStrain(mesh.faces, 100.0, 0.95, 1.05))
    s.add_force(Bend(extract_hinges(mesh.faces), 20.0))
    pins = [0, 24]
    s.add_force(StaticAnchor(pins))
    s.add_explicit_force(ExplicitForce(direction=(0, -9.8, 0)))
    s.add_explicit_force(WindForce(mesh.faces, direction=(1.5, 0, 0.4)))
    assert s.initialize() and s._lattice is not None
    x0 = np.asarray(s.x)
    ext0 = np.linalg.norm(x0.max(0) - x0.min(0))
    s._lattice.run(steps)
    x = np.asarray(s._lattice.x)
    v = np.asarray(s._lattice.v)
    ext = np.linalg.norm(x.max(0) - x.min(0))
    pin_err = np.abs(x[pins] - x0[pins]).max()
    ok = (np.isfinite(x).all() and np.isfinite(v).all()
          and ext < 3.0 * ext0 and np.abs(v).max() < 50.0
          and pin_err < 1e-2)
    return ok, (f"windyflag {steps} steps: finite={np.isfinite(x).all()} "
                f"extent {ext0:.3f}->{ext:.3f} |v|max={np.abs(v).max():.3f} "
                f"pin_err={pin_err:.2e}")


def soak_tet(steps):
    import jax.numpy as jnp

    from admm_elastic_tpu import Settings, System
    from admm_elastic_tpu.geometry import make_beam_tets
    from admm_elastic_tpu.models import (
        ExplicitForce,
        HyperElasticTet,
        StaticAnchor,
    )

    beam = make_beam_tets(20, 12, 10, size=0.05)
    n = beam.n_vertices
    s = System(Settings(timestep_s=0.04, admm_iters=10, verbose=0,
                        dtype=jnp.float32, global_solver="dia",
                        cg_fixed_iters=40, lattice_fast_path=True))
    s.add_nodes(beam.vertices, np.full(n, 50.0 / n))
    pins = np.flatnonzero(beam.vertices[:, 0] < 1e-9)
    s.add_force(StaticAnchor(pins))
    s.add_force(HyperElasticTet(beam.tets, mu=1e5, lam=1e5, max_iters=5,
                                model="nh"))
    s.add_explicit_force(ExplicitForce(direction=(0, -9.8, 0)))
    assert s.initialize() and s._lattice is not None
    x0 = np.asarray(s.x)
    s._lattice.run(steps)
    x = np.asarray(s._lattice.x)
    v = np.asarray(s._lattice.v)
    # settles to a static droop: velocities decay, geometry bounded
    ok = (np.isfinite(x).all() and np.abs(v).max() < 5.0
          and np.abs(x).max() < 10.0
          and np.abs(x[pins] - x0[pins]).max() < 1e-2)
    return ok, (f"tet beam {steps} steps: finite={np.isfinite(x).all()} "
                f"|x|max={np.abs(x).max():.3f} |v|max={np.abs(v).max():.4f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    failures = 0
    for fn in (soak_windyflag, soak_tet):
        ok, msg = fn(args.steps)
        print(("PASS " if ok else "FAIL ") + msg, flush=True)
        failures += 0 if ok else 1
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
