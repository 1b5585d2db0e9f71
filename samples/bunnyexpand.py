"""Headless bunnyexpand: tet bunny recovering from scrambled/inverted state.

Port of the reference sample (samples/bunnyexpand/bunnyexpand.cpp): StVK
hyperelastic tets (mu=lambda=100, 5 local iters), node positions scrambled
uniform(-0.75, 0.75) — or collapsed to the origin with --single-point — then
the solver recovers the rest shape from massive inversion. 10 iters, dt=0.04.

Run:  python samples/bunnyexpand.py [--steps N] [--single-point] [--export DIR]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

from admm_elastic_tpu.geometry import tet_volumes
from admm_elastic_tpu.scene import SimContext
from common import StepTimer, parse_flags, resolve_tet_mesh


SCENE = """<?xml version="1.0"?>
<mclScene>
	<Object name="bunny" type="tetmesh" >
		<File value="{mesh}" />
		<scale value="10 10 10" />
		<rotate value="20 0 0" />
		<Mass value="1" />
		<Force value="svktet" />
	</Object>
</mclScene>
<admmelastic>
	<solver>
		<iterations value="10" />
		<timestep value="0.04" />
		<realtime value="0" />
	</solver>
	<Force name="svktet" type="StVKTet" >
		<mu value="100" />
		<lambda value="100" />
		<max_iterations value="5" />
	</Force>
</admmelastic>
"""


def main():
    flags = parse_flags()
    single_point = "--single-point" in flags["rest"]
    flags["rest"] = [a for a in flags["rest"] if a != "--single-point"]

    mesh_path = resolve_tet_mesh("bunny")
    scene_file = "/tmp/aet_bunnyexpand.xml"
    with open(scene_file, "w") as f:
        f.write(SCENE.format(mesh=mesh_path))

    ctx = SimContext()
    ctx.load(scene_file)
    ctx.system.settings.parse_args(flags["rest"])
    ctx.initialize()

    bunny = ctx.objects_map["bunny"]
    tets = np.asarray(bunny.mesh.tets)
    rest = ctx.system.x.copy()
    rest_vol = tet_volumes(rest, tets).sum()

    # scramble node positions (bunnyexpand.cpp:45-66)
    rng = np.random.default_rng(0)
    if single_point:
        ctx.system.x = np.zeros_like(rest)
    else:
        ctx.system.x = rng.uniform(-0.75, 0.75, size=rest.shape)

    timer = StepTimer()

    def do_step(i):
        ctx.step()
        if flags["export"] and i % 5 == 0:
            ctx.export_obj(flags["export"], i)

    timer.run(do_step, flags["steps"], label="bunnyexpand", sync=lambda: jax.block_until_ready(ctx.system.state["x"]))
    timer.report("bunnyexpand", ctx.system.settings.admm_iters)

    x = ctx.system.x
    vols = tet_volumes(x, tets)
    signed = np.einsum(
        "ij,ij->i",
        x[tets[:, 1]] - x[tets[:, 0]],
        np.cross(x[tets[:, 2]] - x[tets[:, 0]], x[tets[:, 3]] - x[tets[:, 0]]),
    )
    rest_signed = np.einsum(
        "ij,ij->i",
        rest[tets[:, 1]] - rest[tets[:, 0]],
        np.cross(rest[tets[:, 2]] - rest[tets[:, 0]], rest[tets[:, 3]] - rest[tets[:, 0]]),
    )
    frac_recovered = np.mean(np.sign(signed) == np.sign(rest_signed))
    print(
        f"volume: {vols.sum():.4f} / rest {rest_vol:.4f}  "
        f"({100*vols.sum()/rest_vol:.1f}%); orientation recovered: "
        f"{100*frac_recovered:.1f}% of tets"
    )
    assert np.all(np.isfinite(x)), "simulation diverged"
    print("OK")


if __name__ == "__main__":
    main()
