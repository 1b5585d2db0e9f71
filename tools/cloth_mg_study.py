"""Hierarchy study for the cloth in-kernel geometric multigrid.

Measures PCG iteration counts to 1e-10 on the real grid-cloth A_hat
(windyflag physics: triangle strain + bend + anchors) for candidate
two-coarse-level stride ladders, vs plain Jacobi-PCG. The ladder that
wins here becomes the cloth kernel's `preconditioner='amg'` hierarchy.

Usage: tools/cloth_mg_study.py [gridsize ...]   (default 114 226)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def cloth_A(g):
    import jax
    import jax.numpy as jnp

    from admm_elastic_tpu import Settings, System
    from admm_elastic_tpu.core.solver import _assemble_A_hat_csr
    from admm_elastic_tpu.geometry import extract_hinges, make_plane_grid
    from admm_elastic_tpu.models import (Bend, LimitedTriangleStrain,
                                         StaticAnchor)

    mesh = make_plane_grid(g - 1, g - 1)
    n = mesh.n_vertices
    s = System(Settings(timestep_s=0.04, admm_iters=1, verbose=0,
                        dtype=jnp.float64, global_solver="dia",
                        lattice_fast_path=False))
    s.add_nodes(mesh.vertices, np.full(n, 0.5 / n))
    s.add_force(LimitedTriangleStrain(mesh.faces, 100.0, 0.95, 1.05))
    s.add_force(Bend(extract_hinges(mesh.faces), 20.0))
    top = np.flatnonzero(np.abs(mesh.vertices[:, 1]
                                - mesh.vertices[:, 1].max()) < 1e-9)
    s.add_force(StaticAnchor(top[:: max(1, len(top) // 24)]))
    assert s.initialize()
    cparams = {
        k: {kk: np.asarray(jax.device_get(vv))
            for kk, vv in s.params[k].items()}
        for k in s._constraint_names
    }
    A = _assemble_A_hat_csr(n, np.asarray(s._masses_dev), 0.04,
                            cparams).tocsr()
    return A, np.asarray(s._x)


def pcg(A, b, M, tol=1e-10, maxit=600):
    x = np.zeros_like(b)
    r = b.copy()
    z = M(r)
    p = z.copy()
    rz = r @ z
    nb = np.linalg.norm(b)
    for it in range(maxit):
        Ap = A @ p
        alpha = rz / (p @ Ap)
        x += alpha * p
        r -= alpha * Ap
        if np.linalg.norm(r) < tol * nb:
            return it + 1
        z = M(r)
        rz_new = r @ z
        p = z + (rz_new / rz) * p
        rz = rz_new
    return maxit


def main():
    from admm_elastic_tpu.core.mg import LANES, build_grid_mg, vcycle_np

    sizes = [int(a) for a in sys.argv[1:]] or [114, 226]
    for g in sizes:
        A, verts = cloth_A(g)
        n = A.shape[0]
        n_pad = -(-n // 1024) * 1024
        rng = np.random.default_rng(0)
        b = rng.standard_normal(n)
        d = A.diagonal()
        jac = pcg(A, b, lambda r: r / d)
        print(f"g={g} n={n}: Jacobi-PCG {jac} iters")
        for ladder, np2 in [((2, 4), 26), ((2, 8), 7), ((4, 8), 7),
                            ((4, 16), 2), ((2, 16), 2), ((3, 9), 6)]:
            t0 = time.time()
            got = build_grid_mg(A, verts, n_pad, min_nodes=0,
                                level_strides=ladder, np2_rows=np2)
            if got is None:
                print(f"  ladder {ladder}: does not fit")
                continue
            planes, meta = got
            bt = time.time() - t0
            Ac = A.tocoo()
            offs = np.unique(Ac.col - Ac.row)
            vals = np.zeros((len(offs), n_pad))
            for di, o in enumerate(offs):
                m = (Ac.col - Ac.row) == o
                vals[di, Ac.row[m]] = Ac.data[m]
            fo = tuple(int(o) for o in offs)

            def M(r, planes=planes, meta=meta):
                rp = np.zeros(n_pad)
                rp[:n] = r
                return vcycle_np(planes, meta, fo, vals, rp)[:n]

            it = pcg(A, b, M)
            nplanes = (len(meta["t0_offs"]) + len(meta["t1_offs"])
                       + len(meta["l1_offs"]) + 2)
            print(f"  ladder {ladder} np2={meta['np2_rows']} "
                  f"levels={meta['levels']}: {it} iters "
                  f"({nplanes} N-planes, build {bt:.1f}s)")


if __name__ == "__main__":
    main()
