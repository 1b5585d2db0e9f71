"""Minimal API demo: one node free-falling under gravity, printing positions
(port of deps/admm-elastic-sca/samples/singlenode.cpp)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from admm_elastic_tpu import Settings, System
from admm_elastic_tpu.models import ExplicitForce


def main():
    settings = Settings(timestep_s=1.0, admm_iters=20, verbose=0)
    settings.parse_args(sys.argv[1:])
    system = System(settings)
    system.add_nodes(np.zeros(3), np.ones(3))  # one node at origin, 1 kg
    system.add_explicit_force(ExplicitForce(direction=(0.0, -9.8, 0.0)))
    if not system.initialize():
        return
    for i in range(4):
        system.step()
        x = system.x[0]
        print(f"step: {i}, pos: ({x[0]}, {x[1]}, {x[2]})")


if __name__ == "__main__":
    main()
