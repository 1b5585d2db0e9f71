"""BVH build-time harness (mclscene BVHTest analog, BVHTest.cpp:20-80):
times LBVH and spatial-median builds across progressively refined meshes and
writes a TSV. Usage: python tools/bvh_bench.py [out.tsv]"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from admm_elastic_tpu.geometry.bvh import BVH
from admm_elastic_tpu.geometry.primitives import make_sphere


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "bvh_runtimes.tsv"
    rows = ["n_faces\tlbvh_s\tspatial_s\tlbvh_nodes\tspatial_nodes"]
    for tess in (8, 12, 16, 24, 32, 48, 64):
        m = make_sphere(tess)
        t0 = time.perf_counter()
        b1 = BVH(m.vertices, m.faces, method="lbvh")
        t1 = time.perf_counter()
        b2 = BVH(m.vertices, m.faces, method="spatial")
        t2 = time.perf_counter()
        rows.append(
            f"{m.n_faces}\t{t1-t0:.6f}\t{t2-t1:.6f}\t{b1.n_nodes}\t{b2.n_nodes}"
        )
        print(rows[-1])
    with open(out, "w") as f:
        f.write("\n".join(rows) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
