"""Headless plinkopony: tet pony dropping through a grid of collision pegs.

Port of the reference sample (samples/plinkopony/plinkopony.cpp): linear tet
strain (k=1e5) + gravity + a CollisionForce with cylinder shapes parsed from
the scene's static cyl* objects (translate_copy/radius params, the same
convention as plinko.xml). 13 iters, dt=0.04.

Run:  python samples/plinkopony.py [--steps N] [--export DIR]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

from admm_elastic_tpu.models import Collision, Cylinder
from admm_elastic_tpu.scene import SimContext
from common import StepTimer, parse_flags, resolve_tet_mesh


def _peg_grid():
    """23 pegs in 5 staggered rows (plinko.xml layout: rows at y=0.5..6.5,
    x spacing 1.5, alternating offset)."""
    pegs = []
    for row in range(5):
        y = 0.5 + row * 1.5
        if row % 2 == 0:
            xs = [-3.0, -1.5, 0.0, 1.5, 3.0]
        else:
            xs = [-2.25, -0.75, 0.75, 2.25]
        for x in xs:
            pegs.append((x, y))
    return pegs[:23]


def _scene(mesh):
    cyls = "".join(
        f"""
	<Object name="cyl{i}" type="cylinder" >
		<tess_l value="3" />
		<tess_c value="8" />
		<radius value="0.4" />
		<translate_copy value="{x} {y} 0" />
		<scale_copy value="1 1 1" />
		<translate value="{x} {y} 0" />
		<rotate value="0 0 0" />
	</Object>"""
        for i, (x, y) in enumerate(_peg_grid())
    )
    return f"""<?xml version="1.0"?>
<mclScene>
	<Object name="pony" type="tetmesh" >
		<File value="{mesh}" />
		<scale value="1.4 1.4 1.4" />
		<translate value="0 6.0 0" />
		<Mass value="2" />
		<Force value="lintet" />
	</Object>
{cyls}
</mclScene>
<admmelastic>
	<Force name="gravity" type="ExplicitForce" >
		<direction value="0 -9.8 0" />
	</Force>
	<Force name="lintet" type="LinearTetStrain" >
		<stiffness value="100000" />
		<weight_scale value="1" />
	</Force>
	<solver>
		<iterations value="13" />
		<timestep value="0.04" />
	</solver>
</admmelastic>
"""


def main():
    flags = parse_flags()
    mesh_path = resolve_tet_mesh("horse")
    scene_file = "/tmp/aet_plinko.xml"
    with open(scene_file, "w") as f:
        f.write(_scene(mesh_path))

    ctx = SimContext()
    ctx.load(scene_file)
    ctx.system.settings.parse_args(flags["rest"])

    # build collision cylinders from the static cyl* objects' *_copy params
    # (plinkopony.cpp:53-96)
    shapes = []
    for name, so in ctx.objects_map.items():
        if not name.startswith("c"):
            continue
        c = so.component
        center = c.get("translate_copy").as_vec3() if c.exists("translate_copy") else np.zeros(3)
        rad = c.get("radius").as_double() if c.exists("radius") else 1.0
        shapes.append(Cylinder(center=tuple(center), radius=rad))
    print(f"{len(shapes)} collision cylinders")
    ctx.system.add_force(Collision(shapes, n_nodes=ctx.system.n_nodes))
    ctx.initialize()

    y_start = ctx.system.x[:, 1].mean()
    timer = StepTimer()

    def do_step(i):
        ctx.step()
        if flags["export"] and i % 5 == 0:
            ctx.export_obj(flags["export"], i)

    timer.run(do_step, flags["steps"], label="plinkopony", sync=lambda: jax.block_until_ready(ctx.system.state["x"]))
    timer.report("plinkopony", ctx.system.settings.admm_iters)

    x = ctx.system.x
    print(f"pony mean y: {y_start:.3f} -> {x[:,1].mean():.3f} (fell through pegs)")
    # nodes must not be inside any peg by more than a contact tolerance
    worst = 0.0
    for s in shapes:
        d = np.linalg.norm(x[:, :2] - np.asarray(s.center[:2]), axis=1)
        worst = max(worst, float(np.maximum(s.radius - d, 0).max()))
    print(f"max peg penetration: {worst:.4f}")
    assert np.all(np.isfinite(x)), "simulation diverged"
    print("OK")


if __name__ == "__main__":
    main()
