"""Headless poordillo: armadillo grabbed by hand/foot and released.

Port of the reference sample (samples/poordillo/poordillo.cpp): NeoHookean
tets (mu=lambda=1e5, 5 local iters), uniform mass, MovingAnchor grabs on the
vertices inside hand/foot spheres, control points dragged away with
smooth_move trajectories, then released (weight -> 0 + recompute_weights —
the runtime constraint-topology change path). 10 iters, dt=0.06.

Run:  python samples/poordillo.py [--steps N] [--export DIR]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

from admm_elastic_tpu.models import MovingAnchor
from admm_elastic_tpu.models.anchor import smooth_move
from admm_elastic_tpu.scene import SimContext
from common import StepTimer, parse_flags, resolve_tet_mesh


SCENE = """<?xml version="1.0"?>
<mclScene>
	<Object name="dillo" type="tetmesh" >
		<File value="{mesh}" />
		<scale value=".01 .01 .01" />
		<Mass value="140" />
		<density_weighted_mass value="0" />
		<Force value="nhtet" />
	</Object>
</mclScene>
<admmelastic>
	<Force name="gravity" type="ExplicitForce" >
		<direction value="0 -9.8 0" />
	</Force>
	<Force name="nhtet" type="NeoHookeanTet" >
		<mu value="100000" />
		<lambda value="100000" />
		<max_iterations value="5" />
	</Force>
	<solver>
		<iterations value="10" />
		<timestep value="0.06" />
	</solver>
</admmelastic>
"""


def main():
    flags = parse_flags()
    mesh_path = resolve_tet_mesh("dillo")
    scene_file = "/tmp/aet_poordillo.xml"
    with open(scene_file, "w") as f:
        f.write(SCENE.format(mesh=mesh_path))

    ctx = SimContext()
    ctx.load(scene_file)
    ctx.system.settings.parse_args(flags["rest"])

    # grab spheres (poordillo.cpp:131-133); fall back to mesh extrema for
    # stand-in meshes with different geometry
    verts = np.asarray(ctx.objects_map["dillo"].mesh.vertices)
    hand_c, hand_r = np.array([0.6, 0.8, 0.5]), 0.2
    foot_c, foot_r = np.array([-0.25, -0.6, -0.1]), 0.2
    hand_ids = np.flatnonzero(np.linalg.norm(verts - hand_c, axis=1) < hand_r)
    foot_ids = np.flatnonzero(np.linalg.norm(verts - foot_c, axis=1) < foot_r)
    if len(hand_ids) == 0:  # stand-in mesh: grab the +x/-x extremes
        d = verts - verts.mean(axis=0)
        hand_ids = np.argsort(-d[:, 0])[:10]
        foot_ids = np.argsort(d[:, 0])[:10]

    off = ctx.objects_map["dillo"].index_offset
    hand = ctx.system.add_force(MovingAnchor(hand_ids + off))
    foot = ctx.system.add_force(MovingAnchor(foot_ids + off))
    ctx.initialize()

    x0 = ctx.system.x
    hand_start = x0[hand_ids + off].copy()
    foot_start = x0[foot_ids + off].copy()
    hand_end = hand_start + np.array([2.0, 0.0, 0.0])
    foot_end = foot_start + np.array([-2.0, 0.0, 0.0])
    released = {"hand": False, "foot": False}
    release_at = {"hand": 3.0, "foot": 3.6}  # seconds

    def step_callback(system):
        t = system.elapsed_s
        if not released["hand"]:
            pos = np.stack(
                [smooth_move(t, 0.2, 2.5, s, e) for s, e in zip(hand_start, hand_end)]
            )
            system.set_force_state(hand, "pos", pos)
            if t >= release_at["hand"]:
                released["hand"] = True
                system.set_force_param(hand, "weight", np.zeros(len(hand_ids)))
                system.set_force_state(hand, "active", np.zeros(len(hand_ids), bool))
                system.recompute_weights()
                print(f"  released hand at t={t:.2f}s")
        if not released["foot"]:
            pos = np.stack(
                [smooth_move(t, 0.2, 2.5, s, e) for s, e in zip(foot_start, foot_end)]
            )
            system.set_force_state(foot, "pos", pos)
            if t >= release_at["foot"]:
                released["foot"] = True
                system.set_force_param(foot, "weight", np.zeros(len(foot_ids)))
                system.set_force_state(foot, "active", np.zeros(len(foot_ids), bool))
                system.recompute_weights()
                print(f"  released foot at t={t:.2f}s")

    ctx.system.pre_step_callbacks.append(step_callback)

    print(f"grabbed {len(hand_ids)} hand verts, {len(foot_ids)} foot verts")
    timer = StepTimer()

    def do_step(i):
        ctx.step()
        if flags["export"] and i % 5 == 0:
            ctx.export_obj(flags["export"], i)

    timer.run(do_step, flags["steps"], label="poordillo", sync=lambda: jax.block_until_ready(ctx.system.state["x"]))
    timer.report("poordillo", ctx.system.settings.admm_iters)

    x = ctx.system.x
    stretch = np.abs(x[hand_ids + off, 0].mean() - hand_start[:, 0].mean())
    print(f"hand displacement from rest after release: {stretch:.3f}")
    assert np.all(np.isfinite(x)), "simulation diverged"
    print("OK")


if __name__ == "__main__":
    main()
