"""Lattice fast-path demo: a clamped NeoHookean beam sagging under
gravity, stepped by the whole-rollout single-kernel path
(core/lattice.LatticeStepper). Compare with the identical general-System
configuration (global_solver='dia', backend='pallas').

Run: python samples/beamlattice.py [--steps N] [--render out.png]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--dims", type=int, nargs=3, default=(16, 8, 6))
    ap.add_argument("--render", default=None)
    args = ap.parse_args()

    import jax.numpy as jnp

    from admm_elastic_tpu import LatticeStepper
    from admm_elastic_tpu.geometry import make_beam_tets

    nx, ny, nz = args.dims
    beam = make_beam_tets(nx, ny, nz, size=0.05)
    n = beam.n_vertices
    anchored = np.flatnonzero(beam.vertices[:, 0] < 1e-9)
    lat = LatticeStepper(
        nx, ny, nz, 0.05, np.full(n, 50.0 / n), 1e5, 1e5, anchored,
        dt=0.04, admm_iters=10, newton_iters=5, cg_iters=25,
        dtype=jnp.float32,
    )
    lat.run(args.steps)
    x = np.asarray(lat.x)
    tip = x[np.argmax(beam.vertices[:, 0])]
    print(f"{nx}x{ny}x{nz} cells ({beam.n_tets} tets), {args.steps} steps: "
          f"tip at {tip}, min y {x[:, 1].min():.4f} "
          f"(rest {beam.vertices[:, 1].min():.4f})")
    assert np.isfinite(x).all()

    if args.render:
        from admm_elastic_tpu.geometry.tetmesh import surface_faces
        from admm_elastic_tpu.viz import render_frame

        render_frame([(x, surface_faces(beam.tets))], args.render)
        print("wrote", args.render)


if __name__ == "__main__":
    main()
