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


def batch_params(params, sweep: dict, n_scenarios: int):
    """Broadcast params with per-scenario overrides.

    sweep: {(force_name, param_key): array (n_scenarios, ...)} e.g. varied
    stiffness. Non-swept entries stay unbatched (broadcast inside vmap via
    in_axes=None is handled by passing them stacked too for simplicity).
    """
    if sweep and "_solver" in params:
        swept_keys = {k for (_, k) in sweep}
        if swept_keys & {"weight", "k", "mu", "lam", "stiffness"} and (
            "ell_vals" in params["_solver"] or "A_inv" in params["_solver"]
            or "dia_vals" in params["_solver"]
        ):
            raise ValueError(
                "sweeping weights/material stiffness requires "
                "global_solver='cg' (matrix-free); 'ell'/'dense' bake the "
                "base weights into a precomputed global matrix"
            )

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
    return batched


def vmap_step(system):
    """Jitted vmapped step over a leading scenario axis of (state, params)."""
    step = system._make_step()
    return jax.jit(jax.vmap(step), donate_argnums=(0,))
