"""Phase-split banded local step: one ADMM iteration's element pipeline
(gather -> hyperelastic prox -> dual update -> conflict-free scatter) plus
the row-local anchor/collision projections, WITHOUT the global CG solve.

This is the building block of the SHARDED banded fast path
(parallel/banded_spmd.py): the whole-timestep kernel
(banded_step.py) fuses all phases of all iterations into one pallas_call,
which is optimal on one device but cannot element-shard — the in-kernel CG
needs two globally-reduced scalars per iteration. Splitting at the ADMM
iteration boundary lets each device run THIS kernel on its chunk range and
vertex-row slab, exchange halo rows once per iteration (`ppermute`), and
run the CG at the JAX level with `psum` dot products (SURVEY §2.7; the
reference's reduction structure is System.cpp:54-62).

The math is the banded kernel's, verbatim in structure (same plane layout,
same windowed row-scan gather, same lane-permutation scatter — see
banded_step.py's module docstring for the layout); trajectories of the
sharded composition match the whole-timestep kernel to round-off
(tests/test_banded_spmd.py). Two interchangeable executors:

- `banded_local_rhs` — a pallas_call with grid (n_chunks+1,): chunk phase
  per chunk, then the anchor/collision phase (TPU production path).
- `banded_local_rhs_xla` — the same body vmapped at the JAX level
  (XLA-compiled; used on CPU hosts/tests where pallas would interpret).

Both share the SAME body functions below, so there is one source of truth
for the numerics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .banded_step import (
    CCP0,
    CP0,
    DB_PLANES,
    FB_PLANES,
    KP,
    LAMP,
    LANES,
    MUP,
    PP0,
    RRP0,
    RRPP0,
    SUB,
    W2P,
)
from .nh_local import _newton_hyper, _svd_columns

# P2D plane indices (same layout as banded_step: aw2, invd, mass, vmask,
# ancz xyz)
PAW2, PINVD, PMASS, PVM, PANCZ = 0, 1, 2, 3, 4
P2D_PLANES = 7


def _chunk_half_body(fbp, dbp, mats, xw, model, newton_iters, Wr,
                     collect, bw_acc):
    """One row-half of the chunk phase (element-parallel local step).

    fbp(plane) -> (HS,128) static element plane; dbp: 12 dual planes
    (HS,128); mats: (w2, mu, lam, k) material planes; xw: [3] (Wr,128)
    vertex-window rows of live x. Calls bw_acc(a, vr, (1,128) add) for
    every scatter contribution and returns (db_new 12 planes, r2) with
    r2 the primal-residual piece (None unless collect).

    Verbatim math of banded_step.py's chunk phase (reference local step
    TetForce.cpp:303-364 + dual update System.cpp:57-58)."""
    HS = dbp[0].shape[0]
    cc = [fbp(CCP0 + k).astype(jnp.int32) for k in range(4)]
    rr = [fbp(RRP0 + k) for k in range(4)]
    xg = [[jnp.zeros((HS, LANES), xw[0].dtype) for _ in range(3)]
          for _ in range(4)]
    for k in range(4):
        for r in range(Wr):
            m = rr[k] == float(r)
            for a in range(3):
                t = jnp.take_along_axis(
                    jnp.broadcast_to(xw[a][r:r + 1, :], (HS, LANES)),
                    cc[k], axis=1,
                )
                xg[k][a] = xg[k][a] + jnp.where(m, t, 0.0)

    cp = [fbp(CP0 + p) for p in range(12)]
    u = dbp[:9]
    f = []
    for a in range(3):
        for b in range(3):
            acc = u[3 * a + b]
            for k in range(4):
                acc = acc + cp[4 * b + k] * xg[k][a]
            f.append(acc)

    eps = jnp.asarray(jnp.finfo(f[0].dtype).eps, f[0].dtype)
    U, V, s = _svd_columns(f, eps)

    db_new = list(dbp)
    up = [None] * 9
    if model in ("nh", "stvk"):
        # warm-start guards (TetForce.cpp:339-347)
        w1 = dbp[9]
        w2_ = dbp[10]
        neg3 = dbp[11] < 0.0
        w3 = jnp.abs(dbp[11])
        collapsed = (~neg3) & (
            (jnp.abs(w1) < 1e-3) & (jnp.abs(w2_) < 1e-3)
            & (jnp.abs(w3) < 1e-3)
        )
        w1 = jnp.where(collapsed, 1e-3, w1)
        w2_ = jnp.where(collapsed, 1e-3, w2_)
        w3 = jnp.where(collapsed, 1e-3, w3)
        mu, lam, kp = mats[1], mats[2], mats[3]
        x1, x2, x3 = _newton_hyper(
            s, (w1, w2_, w3), mu, lam, kp, newton_iters, model
        )
        db_new[9], db_new[10], db_new[11] = x1, x2, x3
        sig = (x1, x2, x3)
        for r in range(3):
            for c2 in range(3):
                z = (
                    U[0][r] * sig[0] * V[0][c2]
                    + U[1][r] * sig[1] * V[1][c2]
                    + U[2][r] * sig[2] * V[2][c2]
                )
                up[3 * r + c2] = f[3 * r + c2] - z
    else:  # arap
        one = jnp.ones_like(s[0])
        s3 = jnp.where(s[2] < 0, -one, one)
        sig = (one, one, s3)
        w2e, kp = mats[0], mats[3]
        mix = 1.0 / (w2e + jnp.where(w2e + kp > 0, kp, 1.0))
        for r in range(3):
            for c2 in range(3):
                proj = (
                    U[0][r] * sig[0] * V[0][c2]
                    + U[1][r] * sig[1] * V[1][c2]
                    + U[2][r] * sig[2] * V[2][c2]
                )
                z = (kp * proj + w2e * f[3 * r + c2]) * mix
                up[3 * r + c2] = f[3 * r + c2] - z

    r2 = None
    if collect:
        w2r = mats[0]
        r2 = sum(
            jnp.sum(w2r * (up[p] - u[p]) * (up[p] - u[p]))
            for p in range(9)
        )
    db_new[:9] = up

    # scatter b += w2 D^T (z - u'); (z - u') = F - 2 u'
    w2e = mats[0]
    zu = [w2e * (f[p] - 2.0 * up[p]) for p in range(9)]
    for k in range(4):
        Pk = fbp(PP0 + k).astype(jnp.int32)
        rrp = fbp(RRPP0 + k)
        for a in range(3):
            acc = cp[4 * 0 + k] * zu[3 * a + 0]
            for b in range(1, 3):
                acc = acc + cp[4 * b + k] * zu[3 * a + b]
            sp = jnp.take_along_axis(acc, Pk, axis=1)
            for vr in range(Wr):
                m = rrp == float(vr)
                bw_acc(a, vr, jnp.sum(jnp.where(m, sp, 0.0),
                                      axis=0, keepdims=True))
    return db_new, r2


def _anchor_coll_body(x3, au3, cu3, aw2, ancz3, vmask, coll_shapes,
                      coll_w2, collect):
    """Row-local anchor + collision projections and dual updates.

    x3/au3/cu3: [3] (R,128) planes; aw2/vmask: (R,128); ancz3: [3].
    Returns (b_add [3], au_new [3], cu_new [3], r2). Verbatim math of
    banded_step.py's solve-phase prologue (AnchorForce.cpp:46-55,
    CollisionForce.cpp:53-70)."""
    r2 = jnp.asarray(0.0, x3[0].dtype) if collect else None
    b_add = []
    au_new = []
    for a in range(3):
        dlt = x3[a] - ancz3[a]
        # gated: non-anchor rows otherwise accumulate x - ancz forever
        au = jnp.where(aw2 > 0, au3[a] + dlt, 0.0)
        au_new.append(au)
        b_add.append(aw2 * (ancz3[a] - au))
        if collect:
            r2 = r2 + jnp.sum(aw2 * dlt * dlt)

    cu_new = list(cu3)
    if len(coll_shapes):
        zc = [x3[a] + cu3[a] for a in range(3)]
        for kind, prm in coll_shapes:
            if kind == "floor":
                zc[1] = jnp.maximum(zc[1], prm[0])
            elif kind == "sphere":
                cx, cy, cz, r = prm
                dx, dy, dz = zc[0] - cx, zc[1] - cy, zc[2] - cz
                d2 = dx * dx + dy * dy + dz * dz
                inside = d2 < r * r
                s_ = r * jax.lax.rsqrt(jnp.maximum(d2, 1e-30))
                zc[0] = jnp.where(inside, cx + dx * s_, zc[0])
                zc[1] = jnp.where(inside, cy + dy * s_, zc[1])
                zc[2] = jnp.where(inside, cz + dz * s_, zc[2])
            elif kind == "cylinder":
                cx, cy, r = prm
                dx, dy = zc[0] - cx, zc[1] - cy
                d2 = dx * dx + dy * dy
                inside = d2 < r * r
                s_ = r * jax.lax.rsqrt(jnp.maximum(d2, 1e-30))
                zc[0] = jnp.where(inside, cx + dx * s_, zc[0])
                zc[1] = jnp.where(inside, cy + dy * s_, zc[1])
        for a in range(3):
            dlt = x3[a] - zc[a]
            un = cu3[a] + dlt
            cu_new[a] = un
            b_add[a] = b_add[a] + coll_w2 * vmask * (zc[a] - un)
            if collect:
                r2 = r2 + jnp.sum(coll_w2 * vmask * dlt * dlt)
    return b_add, au_new, cu_new, r2


# --------------------------------------------------------------- pallas


def _make_local_kernel(Lr, Wr, n_chunks, model, newton_iters, halves,
                       coll_shapes, coll_w2, collect):
    HS = SUB // halves

    def hrows(plane, h):
        return slice(plane * SUB + h * HS, plane * SUB + (h + 1) * HS)

    def srows(a):
        return slice(a * Lr, (a + 1) * Lr)

    def kernel(p2d_ref, rbase_ref, fblk_hbm, x_ref, au_ref, cu_ref, d_hbm,
               b_out, au_out, cu_out, d_out, r2_out, FB, DB, BW, racc, sem):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _init():
            b_out[:, :] = jnp.zeros((3 * Lr, LANES), b_out.dtype)
            racc[0] = jnp.asarray(0.0, x_ref.dtype)

        @pl.when(c < n_chunks)
        def _chunk():
            cf = pltpu.make_async_copy(fblk_hbm.at[c], FB, sem)
            cf.start()
            cf.wait()
            cd = pltpu.make_async_copy(d_hbm.at[c], DB, sem)
            cd.start()
            cd.wait()
            rb = rbase_ref[c]
            xw = [x_ref[pl.ds(a * Lr + rb, Wr), :] for a in range(3)]
            BW[:, :] = jnp.zeros((3 * Wr, LANES), BW.dtype)
            for h in range(halves):
                fbp = lambda p: FB[hrows(p, h)]
                dbp = [DB[hrows(p, h)] for p in range(DB_PLANES)]
                mats = tuple(FB[hrows(p, h)]
                             for p in (W2P, MUP, LAMP, KP))

                def bw_acc(a, vr, row):
                    BW[a * Wr + vr:a * Wr + vr + 1, :] += row

                db_new, r2 = _chunk_half_body(
                    fbp, dbp, mats, xw, model, newton_iters, Wr,
                    collect, bw_acc,
                )
                for p in range(DB_PLANES):
                    DB[hrows(p, h)] = db_new[p]
                if collect:
                    racc[0] = racc[0] + r2
            for a in range(3):
                b_out[pl.ds(a * Lr + rb, Wr), :] += BW[
                    a * Wr:(a + 1) * Wr, :
                ]
            co = pltpu.make_async_copy(DB, d_out.at[c], sem)
            co.start()
            co.wait()

        @pl.when(c == n_chunks)
        def _post():
            x3 = [x_ref[srows(a)] for a in range(3)]
            au3 = [au_ref[srows(a)] for a in range(3)]
            cu3 = [cu_ref[srows(a)] for a in range(3)]
            aw2 = p2d_ref[PAW2 * Lr:(PAW2 + 1) * Lr]
            vmask = p2d_ref[PVM * Lr:(PVM + 1) * Lr]
            ancz3 = [p2d_ref[(PANCZ + a) * Lr:(PANCZ + a + 1) * Lr]
                     for a in range(3)]
            b_add, au_new, cu_new, r2 = _anchor_coll_body(
                x3, au3, cu3, aw2, ancz3, vmask, coll_shapes, coll_w2,
                collect,
            )
            for a in range(3):
                b_out[srows(a)] += b_add[a]
                au_out[srows(a)] = au_new[a]
                cu_out[srows(a)] = cu_new[a]
            if collect:
                racc[0] = racc[0] + r2
            r2_out[0] = racc[0]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("Wr", "model", "newton_iters", "halves",
                     "coll_shapes", "coll_w2", "collect", "interpret"),
)
def banded_local_rhs(p2d, rbase, fblk, x, au, cu, d, *, Wr, model,
                     newton_iters, halves=2, coll_shapes=(), coll_w2=0.0,
                     collect=False, interpret=False):
    """One ADMM iteration's local step + RHS scatter + anchor/collision
    phase as a pallas kernel over (n_chunks+1,).

    p2d: (P2D_PLANES*Lr,128); rbase: (n_chunks,) int32 LOCAL window base
    rows; fblk: (n_chunks, FB_PLANES*SUB, 128); x/au/cu: (3*Lr,128);
    d: (n_chunks, DB_PLANES*SUB, 128).
    Returns (b, au', cu', d', r2) where b = D^T W^2 (z - u') summed over
    every constraint (3*Lr,128) and r2 the primal-residual square
    (garbage unless collect)."""
    Lr = x.shape[0] // 3
    n_chunks = fblk.shape[0]
    kern = _make_local_kernel(
        Lr, int(Wr), n_chunks, str(model), int(newton_iters), int(halves),
        tuple(coll_shapes), float(coll_w2), bool(collect),
    )
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    sm = pl.BlockSpec(memory_space=pltpu.SMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    out = pl.pallas_call(
        kern,
        grid=(n_chunks + 1,),
        in_specs=[vm, sm, hbm, vm, vm, vm, hbm],
        out_specs=[vm, vm, vm, hbm, pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(au.shape, au.dtype),
            jax.ShapeDtypeStruct(cu.shape, cu.dtype),
            jax.ShapeDtypeStruct(d.shape, d.dtype),
            jax.ShapeDtypeStruct((1,), x.dtype),
        ],
        input_output_aliases={6: 3},
        scratch_shapes=[
            pltpu.VMEM((FB_PLANES * SUB, LANES), x.dtype),
            pltpu.VMEM((DB_PLANES * SUB, LANES), x.dtype),
            pltpu.VMEM((3 * Wr, LANES), x.dtype),
            pltpu.SMEM((1,), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(p2d, rbase, fblk, x, au, cu, d)
    b, au_n, cu_n, d_n, r2 = out
    return b, au_n, cu_n, d_n, r2[0]


# ------------------------------------------------------------------ XLA


@functools.partial(
    jax.jit,
    static_argnames=("Wr", "model", "newton_iters", "coll_shapes",
                     "coll_w2", "collect"),
)
def banded_local_rhs_xla(p2d, rbase, fblk, x, au, cu, d, *, Wr, model,
                         newton_iters, coll_shapes=(), coll_w2=0.0,
                         collect=False):
    """The same phase as `banded_local_rhs`, executed at the JAX level
    (vmap over chunks + sequential window accumulation). Identical
    signature/semantics modulo the pallas-only args; used on CPU hosts
    where pallas would interpret (tests, virtual-mesh dryruns)."""
    Lr = x.shape[0] // 3
    n_chunks = fblk.shape[0]
    Wr = int(Wr)

    def one_chunk(fb, db, rb):
        rb = rb.astype(jnp.int32)
        xw3 = [jax.lax.dynamic_slice(
                   x, (jnp.int32(a * Lr) + rb, jnp.int32(0)), (Wr, LANES))
               for a in range(3)]
        fbp = lambda p: fb[p * SUB:(p + 1) * SUB]
        dbp = [db[p * SUB:(p + 1) * SUB] for p in range(DB_PLANES)]
        mats = tuple(fbp(p) for p in (W2P, MUP, LAMP, KP))
        rows = [jnp.zeros((1, LANES), x.dtype) for _ in range(3 * Wr)]

        def bw_acc(a, vr, row):
            rows[a * Wr + vr] = rows[a * Wr + vr] + row

        db_new, r2 = _chunk_half_body(
            fbp, dbp, mats, xw3, str(model), int(newton_iters), Wr,
            bool(collect), bw_acc,
        )
        bw = jnp.concatenate(rows, 0)
        return bw, jnp.concatenate(db_new, 0), (
            r2 if collect else jnp.asarray(0.0, x.dtype))

    bws, d_new, r2s = jax.vmap(one_chunk)(fblk, d, rbase)

    def add_chunk(i, b):
        rb = rbase[i].astype(jnp.int32)
        for a in range(3):
            r0 = jnp.int32(a * Lr) + rb
            cur = jax.lax.dynamic_slice(b, (r0, jnp.int32(0)),
                                        (Wr, LANES))
            b = jax.lax.dynamic_update_slice(
                b, cur + bws[i, a * Wr:(a + 1) * Wr], (r0, jnp.int32(0))
            )
        return b

    b = jax.lax.fori_loop(0, n_chunks, add_chunk,
                          jnp.zeros((3 * Lr, LANES), x.dtype))

    sr = lambda a: slice(a * Lr, (a + 1) * Lr)
    b_add, au_new, cu_new, r2a = _anchor_coll_body(
        [x[sr(a)] for a in range(3)],
        [au[sr(a)] for a in range(3)],
        [cu[sr(a)] for a in range(3)],
        p2d[PAW2 * Lr:(PAW2 + 1) * Lr],
        [p2d[(PANCZ + a) * Lr:(PANCZ + a + 1) * Lr] for a in range(3)],
        p2d[PVM * Lr:(PVM + 1) * Lr],
        tuple(coll_shapes), float(coll_w2), bool(collect),
    )
    b = jnp.concatenate([b[sr(a)] + b_add[a] for a in range(3)], 0)
    au_n = jnp.concatenate(au_new, 0)
    cu_n = jnp.concatenate(cu_new, 0)
    r2 = (jnp.sum(r2s) + r2a) if collect else jnp.asarray(0.0, x.dtype)
    return b, au_n, cu_n, d_new, r2
