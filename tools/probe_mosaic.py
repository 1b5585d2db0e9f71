"""Hardware probes for Mosaic/Pallas primitives the fused kernels rely on.

Run on the real TPU (default env). Each probe prints PASS/FAIL + notes.
Probes:
  1. unblocked-VMEM in/out specs (BlockSpec(memory_space=VMEM) with no
     block shape) under a multi-step grid: single-buffered => an output
     ref written at grid step 0 must read back unchanged at later steps
     (out-ref-as-live-state semantics).
  2. blocked f3-style out spec under a grid: is it double-buffered?
     (same liveness test; informational)
  3. in-kernel per-row lane gather: take_along_axis(t, cc[:,None], 1)
     on (128,128).
  4. dynamic sublane-dim slice read + read-modify-write:
     ref[pl.ds(8*k, 8), :] with runtime k from SMEM.
  5. small-K matmul (128,8)@(8,128) f32 via jnp.dot.
  6. pltpu.roll along lanes.
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def report(name, ok, note=""):
    print(f"{'PASS' if ok else 'FAIL'}  {name}  {note}", flush=True)


def probe_unblocked_liveness():
    # grid of 4 steps; kernel adds 1.0 to the whole out ref each step.
    # single-buffered => final = x + 4; double-buffered => garbage/x+2.
    def kern(x_ref, o_ref):
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            o_ref[:, :] = x_ref[:, :]

        o_ref[:, :] += 1.0

    x = jnp.zeros((8, 256), jnp.float32)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    try:
        out = pl.pallas_call(
            kern, grid=(4,), in_specs=[vm], out_specs=vm,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x)
        ok = bool(np.allclose(np.asarray(out), 4.0))
        report("unblocked VMEM out liveness", ok, f"val={np.asarray(out)[0,0]}")
    except Exception as e:  # noqa: BLE001
        report("unblocked VMEM out liveness", False, repr(e)[:200])


def probe_blocked_liveness():
    def kern(x_ref, o_ref):
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            o_ref[:, :] = x_ref[:, :]

        o_ref[:, :] += 1.0

    x = jnp.zeros((8, 256), jnp.float32)
    full = lambda *_: (0, 0)
    f = pl.BlockSpec((8, 256), full, memory_space=pltpu.VMEM)
    try:
        out = pl.pallas_call(
            kern, grid=(4,), in_specs=[f], out_specs=f,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x)
        v = float(np.asarray(out)[0, 0])
        report("blocked f-spec out liveness", v == 4.0,
               f"val={v} (4.0=single-buffered, else revolving)")
    except Exception as e:  # noqa: BLE001
        report("blocked f-spec out liveness", False, repr(e)[:200])


def probe_lane_gather():
    def kern(t_ref, cc_ref, o_ref):
        t = t_ref[:, :]
        cc = cc_ref[:, :]  # (128,1) int32
        o_ref[:, :] = jnp.take_along_axis(t, cc, axis=1)

    t = np.arange(128 * 128, dtype=np.float32).reshape(128, 128)
    cc = np.random.RandomState(0).randint(0, 128, (128, 1)).astype(np.int32)
    want = np.take_along_axis(t, cc, 1)
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((128, 1), jnp.float32),
        )(jnp.asarray(t), jnp.asarray(cc))
        ok = bool(np.allclose(np.asarray(out), want))
        report("per-row lane gather take_along_axis", ok)
    except Exception as e:  # noqa: BLE001
        report("per-row lane gather take_along_axis", False, repr(e)[:200])


def probe_lane_gather_wide():
    # gather with index array broadcast to full width (one idx per row),
    # output (128,128) then reduce; also try (8,128) per-lane indices mode:
    # y[r, c] = t[r, idx[r, c]] - the general dynamic_gather form.
    def kern(t_ref, idx_ref, o_ref):
        o_ref[:, :] = jnp.take_along_axis(t_ref[:, :], idx_ref[:, :], axis=1)

    t = np.arange(128 * 128, dtype=np.float32).reshape(128, 128)
    idx = np.random.RandomState(1).randint(0, 128, (128, 128)).astype(np.int32)
    want = np.take_along_axis(t, idx, 1)
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        )(jnp.asarray(t), jnp.asarray(idx))
        ok = bool(np.allclose(np.asarray(out), want))
        report("full (128,128) lane gather", ok)
    except Exception as e:  # noqa: BLE001
        report("full (128,128) lane gather", False, repr(e)[:200])


def probe_dyn_sublane_slice():
    def kern(x_ref, k_ref, o_ref):
        k = k_ref[0]
        blk = x_ref[pl.ds(8 * k, 8), :]

        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[:, :] = jnp.zeros_like(o_ref)

        o_ref[pl.ds(8 * k, 8), :] += blk * 2.0

    x = np.random.RandomState(2).randn(64, 128).astype(np.float32)
    k = np.asarray([3], np.int32)
    try:
        out = pl.pallas_call(
            kern, grid=(2,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
        )(jnp.asarray(x), jnp.asarray(k))
        want = np.zeros_like(x)
        want[24:32] = x[24:32] * 4.0
        ok = bool(np.allclose(np.asarray(out), want))
        report("dyn sublane slice read+RMW", ok)
    except Exception as e:  # noqa: BLE001
        report("dyn sublane slice read+RMW", False, repr(e)[:200])


def probe_small_matmul():
    def kern(a_ref, b_ref, o_ref):
        o_ref[:, :] = jnp.dot(a_ref[:, :], b_ref[:, :],
                              preferred_element_type=jnp.float32)

    a = np.random.RandomState(3).randn(128, 8).astype(np.float32)
    b = np.random.RandomState(4).randn(8, 128).astype(np.float32)
    try:
        out = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        )(jnp.asarray(a), jnp.asarray(b))
        ok = bool(np.allclose(np.asarray(out), a @ b, atol=1e-4))
        report("(128,8)@(8,128) f32 matmul", ok)
    except Exception as e:  # noqa: BLE001
        report("(128,8)@(8,128) f32 matmul", False, repr(e)[:200])


def probe_roll():
    if not hasattr(pltpu, "roll"):
        report("pltpu.roll", False, "attribute missing")
        return

    def kern(x_ref, o_ref):
        o_ref[:, :] = pltpu.roll(x_ref[:, :], 5, 1)

    x = np.arange(8 * 128, dtype=np.float32).reshape(8, 128)
    try:
        out = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(jnp.asarray(x))
        ok = bool(np.allclose(np.asarray(out), np.roll(x, 5, 1)))
        report("pltpu.roll lanes", ok)
    except Exception as e:  # noqa: BLE001
        report("pltpu.roll lanes", False, repr(e)[:200])


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices())
    probe_unblocked_liveness()
    probe_blocked_liveness()
    probe_lane_gather()
    probe_lane_gather_wide()
    probe_dyn_sublane_slice()
    probe_small_matmul()
    probe_roll()
