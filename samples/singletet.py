"""Minimal API demo: one tet with 3 anchored nodes, 4th node stretched to
x=200, recovered by one 20-iteration ADMM step
(port of deps/admm-elastic-sca/samples/singletet.cpp)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from admm_elastic_tpu import Settings, System
from admm_elastic_tpu.models import LinearTetStrain, StaticAnchor


def main():
    settings = Settings(timestep_s=1.0, admm_iters=20, verbose=0)
    settings.parse_args(sys.argv[1:])
    system = System(settings)

    x = np.zeros((4, 3))
    x[0, 1] = 1.0
    x[2, 2] = 1.0
    x[3, 0] = 1.0
    system.add_nodes(x, np.ones(4))
    system.add_force(StaticAnchor([0, 1, 2]))
    system.add_force(LinearTetStrain(np.array([[0, 1, 2, 3]]), stiffness=1.0))
    if not system.initialize():
        return

    stretched = x.copy()
    stretched[3, 0] = 200.0
    system.x = stretched
    system.step()
    print(
        f"\n======\nSolver: ADMM, Max Iters: {settings.admm_iters}, "
        f"Tet Force: Linear\nNode 4 x: {system.x[3,0]}\n======"
    )


if __name__ == "__main__":
    main()
