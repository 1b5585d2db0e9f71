"""Scenario-batch data parallelism: many simulations of the same topology,
vmapped and sharded over the mesh's 'data' axis (the BASELINE "64 parallel
armadillo drops with varied stiffness" workload).

Because material parameters and weights are traced params, a scenario sweep
vmaps over them too — no recompilation per variant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_state(state, n_scenarios: int, jitter=None, mesh: Mesh | None = None,
                data_axis: str = "data"):
    """Stack a state pytree to a leading scenario axis. `jitter(x, i)` can
    perturb initial positions per scenario. Sharded over `data_axis` if a
    mesh is given."""

    def stack(a):
        return jnp.broadcast_to(a[None], (n_scenarios,) + a.shape)

    batched = jax.tree_util.tree_map(stack, state)
    if jitter is not None:
        xs = np.stack(
            [jitter(np.asarray(state["x"]), i) for i in range(n_scenarios)]
        )
        batched["x"] = jnp.asarray(xs, state["x"].dtype)
    if mesh is not None:
        def shard(a):
            return jax.device_put(
                a, NamedSharding(mesh, P(data_axis, *([None] * (a.ndim - 1))))
            )
        batched = jax.tree_util.tree_map(shard, batched)
    return batched


def batch_params(params, sweep: dict, n_scenarios: int, system=None):
    """Broadcast params with per-scenario overrides.

    sweep: {(force_name, param_key): array (n_scenarios, ...)} e.g. varied
    stiffness. Non-swept entries stay unbatched (broadcast inside vmap via
    in_axes=None is handled by passing them stacked too for simplicity).

    Weight-affecting sweeps change the global matrix. With
    global_solver='cg' (matrix-free) nothing extra is needed; with
    'ell'/'dia', pass the initialized `system` and the per-scenario global
    matrices are re-assembled on the host (same sparsity, batched values) so
    the single-kernel/fused CG paths stay usable under vmap. 'dense' would
    need 64 host inversions — use 'cg' there.
    """
    weightish = {"weight", "k", "mu", "lam", "stiffness"}
    needs_solver = False
    if sweep and "_solver" in params:
        swept_keys = {k for (_, k) in sweep}
        if swept_keys & weightish and (
            "ell_vals" in params["_solver"] or "A_inv" in params["_solver"]
            or "dia_vals" in params["_solver"]
        ):
            if system is None or "A_inv" in params["_solver"]:
                raise ValueError(
                    "sweeping weights/material stiffness with a precomputed "
                    "global matrix: pass the initialized system to "
                    "batch_params(..., system=) for 'ell'/'dia' (per-scenario "
                    "re-assembly), or use global_solver='cg' (matrix-free)"
                )
            needs_solver = True

    def stack(a):
        return jnp.broadcast_to(a[None], (n_scenarios,) + a.shape)

    batched = jax.tree_util.tree_map(stack, params)
    for (fname, key), values in sweep.items():
        v = jnp.asarray(values)
        base = params[fname][key]
        if v.shape[1:] != base.shape:
            v = jnp.broadcast_to(
                v.reshape(v.shape + (1,) * (base.ndim - (v.ndim - 1))),
                (n_scenarios,) + base.shape,
            )
        batched[fname][key] = v.astype(base.dtype)

    if needs_solver:
        _rebatch_solver(batched, sweep, n_scenarios, system)
    return batched


def _rebatch_solver(batched, sweep, n_scenarios, system):
    """Re-assemble the precomputed ell/dia global matrix per scenario with
    the swept weights applied (host-side; same sparsity pattern, values
    stacked along the scenario axis)."""
    from ..core.solver import assemble_A_hat_dia, assemble_A_hat_ell

    mode = system._solver_mode
    n = system.n_nodes
    dt = system.settings.timestep_s
    dtype = batched["_solver"]["diag"].dtype
    dia_list, diag_list, ell_list = [], [], []
    for i in range(n_scenarios):
        cparams = {}
        for name in system._constraint_names:
            cparams[name] = {
                k: np.asarray(batched[name][k][i]) for k in batched[name]
            }
        if mode == "dia":
            out = assemble_A_hat_dia(n, system._m, dt, cparams)
            if out is None:
                raise ValueError(f"scenario {i}: mesh no longer dia-structured")
            offs, dia_vals, diag = out
            if offs != system._dia_offsets:
                raise ValueError(
                    f"scenario {i}: sweep changed the diagonal sparsity "
                    "pattern (e.g. a weight crossed zero); use "
                    "global_solver='cg'"
                )
            dia_list.append(dia_vals)
            diag_list.append(diag)
        else:  # ell
            ell_idx, ell_vals, diag = assemble_A_hat_ell(
                n, system._m, dt, cparams
            )
            base_idx = np.asarray(batched["_solver"]["ell_idx"][i])
            if ell_idx.shape != base_idx.shape or not np.array_equal(
                ell_idx, base_idx
            ):
                raise ValueError(
                    f"scenario {i}: sweep changed the ELL sparsity pattern; "
                    "use global_solver='cg'"
                )
            ell_list.append(ell_vals)
            diag_list.append(diag)
    if mode == "dia":
        batched["_solver"]["dia_vals"] = jnp.asarray(
            np.stack(dia_list), dtype
        )
    else:
        batched["_solver"]["ell_vals"] = jnp.asarray(
            np.stack(ell_list), dtype
        )
    batched["_solver"]["diag"] = jnp.asarray(np.stack(diag_list), dtype)


def vmap_step(system):
    """Jitted vmapped step over a leading scenario axis of (state, params)."""
    step = system._make_step()
    return jax.jit(jax.vmap(step), donate_argnums=(0,))
