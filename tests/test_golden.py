"""Golden trajectory regression: exact f64 positions after fixed steps for
small versions of the bundled scenes. Guards against unintended numerical
changes anywhere in the pipeline (mesh build, selector assembly, prox math,
global solve). Regenerate with: python tests/test_golden.py --regen"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import jax.numpy as jnp
import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _build_cloth():
    from admm_elastic_tpu import Settings, System
    from admm_elastic_tpu.geometry import extract_hinges, make_sym_plane
    from admm_elastic_tpu.models import (
        Bend,
        ExplicitForce,
        LimitedTriangleStrain,
        StaticAnchor,
        WindForce,
    )

    mesh = make_sym_plane(6, 4)
    n = mesh.n_vertices
    sys_ = System(Settings(timestep_s=0.04, admm_iters=15, verbose=0,
                           dtype=jnp.float64))
    sys_.add_nodes(mesh.vertices, np.full(n, 0.5 / n))
    sys_.add_force(LimitedTriangleStrain(mesh.faces, 100.0, 0.95, 1.05))
    sys_.add_force(Bend(extract_hinges(mesh.faces), 20.0))
    sys_.add_force(StaticAnchor([0, 4]))
    sys_.add_explicit_force(ExplicitForce(direction=(0, -9.8, 0)))
    sys_.add_explicit_force(WindForce(mesh.faces, direction=(1.5, 0, 0.4)))
    assert sys_.initialize()
    return sys_


def _build_tet_drop():
    from admm_elastic_tpu import Settings, System
    from admm_elastic_tpu.geometry import make_beam_tets
    from admm_elastic_tpu.models import Collision, ExplicitForce, Floor, HyperElasticTet

    beam = make_beam_tets(3, 2, 2, size=0.3)
    beam.vertices[:, 1] += 1.0
    n = beam.n_vertices
    sys_ = System(Settings(timestep_s=0.04, admm_iters=10, verbose=0,
                           dtype=jnp.float64))
    sys_.add_nodes(beam.vertices, np.full(n, 5.0 / n))
    sys_.add_force(HyperElasticTet(beam.tets, mu=1e4, lam=1e4, max_iters=5,
                                   model="nh"))
    sys_.add_force(Collision([Floor(center=(0, 0, 0))], n_nodes=n))
    sys_.add_explicit_force(ExplicitForce(direction=(0, -9.8, 0)))
    assert sys_.initialize()
    return sys_


SCENES = {"cloth": (_build_cloth, 12), "tetdrop": (_build_tet_drop, 20)}


def _run(name):
    build, steps = SCENES[name]
    s = build()
    for _ in range(steps):
        s.step()
    return s.x


def test_golden_trajectories():
    for name in SCENES:
        path = os.path.join(GOLDEN, f"{name}.npz")
        assert os.path.exists(path), f"golden file missing; run --regen ({path})"
        want = np.load(path)["x"]
        got = _run(name)
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12,
                                   err_msg=f"golden drift in scene {name!r}")


if __name__ == "__main__":
    if "--regen" in sys.argv:
        os.makedirs(GOLDEN, exist_ok=True)
        for name in SCENES:
            np.savez_compressed(os.path.join(GOLDEN, f"{name}.npz"), x=_run(name))
            print(f"wrote golden {name}")
