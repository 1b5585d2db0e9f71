"""Headless windyflag: cloth flag on a pole in gusty wind.

Port of the reference sample (samples/windyflag/windyflag.cpp) minus the GL
window: scene from scenes/cloth.xml, corner pins and the toggleable wind added
through the API exactly like the app's setup() (windyflag.cpp:68-129), wind
gusts toggled by a pre-step callback instead of the W key.

Run:  python samples/windyflag.py [--steps N] [--export DIR] [-dt s] [-it n]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

from admm_elastic_tpu.models import StaticAnchor, WindForce
from admm_elastic_tpu.scene import SimContext
from common import StepTimer, parse_flags


def main():
    flags = parse_flags()
    scene_file = os.path.join(os.path.dirname(__file__), "scenes", "cloth.xml")

    ctx = SimContext()
    ctx.load(scene_file)
    ctx.system.settings.parse_args(flags["rest"])

    # pin the flag's left corners: plane layout vertex 0 = (-1,-1) and
    # vertex `length` = (-1,1) (windyflag.cpp:89-96)
    cloth = ctx.objects_map["cloth1"]
    length = cloth.component.get("length").as_int()
    ctx.system.add_force(StaticAnchor([cloth.index_offset, cloth.index_offset + length]))

    # wind added manually so its intensity can be toggled (windyflag.cpp:98-129)
    orig_wind = np.array([10.0, 0.0, 2.0])
    wind = ctx.system.add_explicit_force(
        WindForce(cloth.faces + cloth.index_offset, direction=orig_wind)
    )

    high_winds = {"on": False}

    def step_callback(system):
        # windyflag.cpp:141-152: W-key gust toggling; here: every 50 steps
        scale = 2.5 if high_winds["on"] else 1.0
        system.set_force_param(wind, "direction", orig_wind * scale)

    ctx.system.pre_step_callbacks.append(step_callback)
    ctx.initialize()

    print(f"Flag has {len(cloth.faces)} triangles")
    timer = StepTimer()

    def do_step(i):
        if i > 0 and i % 50 == 0:
            high_winds["on"] = not high_winds["on"]
            print(f"  wind gust {'ON' if high_winds['on'] else 'off'} at step {i}")
        ctx.step()
        if flags["export"] and i % 5 == 0:
            ctx.export_obj(flags["export"], i)

    timer.run(do_step, flags["steps"], label="windyflag", sync=lambda: jax.block_until_ready(ctx.system.state["x"]))
    timer.report("windyflag", ctx.system.settings.admm_iters)

    x = ctx.system.x
    tip = cloth.index_offset + (30 + 1) * (length + 1) - 1  # far corner
    print(f"final tip position: {np.round(x[tip], 4)}")
    assert np.all(np.isfinite(x)), "simulation diverged"
    print("OK")


if __name__ == "__main__":
    main()
