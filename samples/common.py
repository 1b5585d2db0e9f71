"""Shared helpers for the headless sample apps.

The tet-mesh scenes use the reference's bundled assets when the read-only
reference checkout is present (/root/reference); otherwise they fall back to
a procedurally generated beam with a comparable element count, so the samples
run standalone.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REFERENCE = "/root/reference"
HERE = os.path.dirname(os.path.abspath(__file__))
ASSETS = os.path.join(HERE, "assets")

REF_MESHES = {
    "bunny": ("samples/bunnyexpand/bunny_1124", (9, 8, 7)),  # 777n/2510t ref
    "dillo": ("samples/poordillo/dillo919", (10, 8, 7)),  # 919n/2761t ref
    "horse": ("samples/plinkopony/horse759", (10, 9, 7)),  # 962n/3221t ref
}


def resolve_tet_mesh(name: str) -> str:
    """Path prefix for a named tet mesh: reference asset if available, else a
    generated beam stand-in cached under samples/assets/."""
    rel, beam_dims = REF_MESHES[name]
    ref_path = os.path.join(REFERENCE, rel)
    if os.path.exists(ref_path + ".node"):
        return ref_path
    os.makedirs(ASSETS, exist_ok=True)
    stand_in = os.path.join(ASSETS, f"{name}_standin")
    if not os.path.exists(stand_in + ".node"):
        from admm_elastic_tpu.geometry import make_beam_tets

        m = make_beam_tets(*beam_dims, size=0.15)
        m.vertices -= m.vertices.mean(axis=0)
        m.save(stand_in)
        print(f"[samples] generated stand-in tet mesh for {name!r}: {stand_in}")
    return stand_in


class StepTimer:
    def __init__(self):
        self.times = []

    def run(self, fn, steps: int, warmup: int = 2, log_every: int = 0, label="",
            sync=None):
        for i in range(steps):
            t0 = time.perf_counter()
            fn(i)
            if sync is not None:
                sync()  # block on async dispatch for honest per-step timing
            dt = time.perf_counter() - t0
            if i >= warmup:
                self.times.append(dt)
            if log_every and (i + 1) % log_every == 0:
                print(f"  [{label}] step {i+1}/{steps}  {dt*1e3:.2f} ms")
        return self

    def report(self, label: str, admm_iters: int):
        t = np.asarray(self.times)
        if len(t) == 0:
            return
        ms = t.mean() * 1e3
        print(
            f"[{label}] {len(t)} steps: {ms:.2f} ms/step "
            f"(p50 {np.percentile(t,50)*1e3:.2f}, p95 {np.percentile(t,95)*1e3:.2f}); "
            f"{admm_iters/t.mean():.1f} ADMM iters/s"
        )


def parse_flags(argv=None):
    """Common sample CLI: -dt/-it/-v (reference parity) + --steps/--export."""
    argv = list(sys.argv[1:] if argv is None else argv)
    out = {"steps": 100, "export": None}
    i = 0
    rest = []
    while i < len(argv):
        if argv[i] == "--steps" and i + 1 < len(argv):
            out["steps"] = int(argv[i + 1])
            i += 2
        elif argv[i] == "--export" and i + 1 < len(argv):
            out["export"] = argv[i + 1]
            i += 2
        else:
            rest.append(argv[i])
            i += 1
    out["rest"] = rest
    return out
