"""Staged TPU-compile probe for the sharded-MG step (round 5).

The 100k mg step wedged the relay's compiler once (>40 min, then the
relay went down). This probe compiles + runs the mg step at increasing
scale, each stage in a SUBPROCESS with a hard timeout, so a wedge at
stage k reports cleanly instead of taking the session down.

    timeout -k 15 3600 python -u tools/mg_compile_probe.py
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STAGE_SRC = r"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, {here!r})
from admm_elastic_tpu import Settings, System
from admm_elastic_tpu.geometry import make_beam_tets
from admm_elastic_tpu.models import ExplicitForce, HyperElasticTet, StaticAnchor
from admm_elastic_tpu.parallel.banded_spmd import sharded_banded_from_system

dims = {dims}
cycles = {cycles}
beam = make_beam_tets(*dims, size=0.05)
n = beam.n_vertices
s = System(Settings(timestep_s=0.04, admm_iters={iters}, verbose=0,
                    dtype=jnp.float32, global_solver="dia",
                    cg_fixed_iters=10, lattice_fast_path=True))
s.add_nodes(beam.vertices, np.full(n, 50.0 / n))
s.add_force(StaticAnchor(np.flatnonzero(beam.vertices[:, 0] < 1e-9)))
s.add_force(HyperElasticTet(beam.tets, mu=1e5, lam=1e5, max_iters=5,
                            model="nh"))
s.add_explicit_force(ExplicitForce(direction=(0, -9.8, 0)))
assert s.initialize()
mg, _ = sharded_banded_from_system(
    s, jax.make_mesh((1,), ("elem",)), solver="mg", mg_cycles=cycles)
t0 = time.perf_counter()
mg.step()
jax.block_until_ready(mg.state["x"])
t1 = time.perf_counter()
mg.step()
jax.block_until_ready(mg.state["x"])
t2 = time.perf_counter()
assert np.isfinite(mg.x).all()
print(f"STAGE-OK tets={beam.n_tets} compile+1st={t1-t0:.1f}s "
      f"step2={(t2-t1)*1e3:.2f}ms levels={mg.mg_levels}")
"""

STAGES = [
    ((8, 5, 4), 4, 3, 600),     # tiny: does it compile at all?
    ((16, 10, 8), 6, 6, 900),   # medium
    ((40, 25, 20), 8, 10, 1500),  # full 100k
]


def main():
    for dims, cycles, iters, tmo in STAGES:
        # plain replace: the template body contains f-strings whose
        # braces str.format would try to substitute
        src = (STAGE_SRC
               .replace("{here!r}", repr(HERE))
               .replace("{dims}", repr(dims))
               .replace("{cycles}", repr(cycles))
               .replace("{iters}", repr(iters)))
        t0 = time.time()
        try:
            r = subprocess.run(
                ["timeout", "-k", "15", str(tmo), sys.executable,
                 "-u", "-c", src],
                capture_output=True, text=True, timeout=tmo + 60,
            )
            out = (r.stdout + r.stderr).strip().splitlines()
            tail = out[-1] if out else "(no output)"
            status = "ok" if "STAGE-OK" in r.stdout else "FAIL"
        except subprocess.TimeoutExpired:
            status, tail = "TIMEOUT", ""
        print(json.dumps({
            "dims": dims, "mg_cycles": cycles, "status": status,
            "wall_s": round(time.time() - t0, 1), "tail": tail[-300:],
        }), flush=True)
        if status != "ok":
            print("# stopping at first failure — the wedge scale is "
                  "bracketed", file=sys.stderr)
            break


if __name__ == "__main__":
    main()
