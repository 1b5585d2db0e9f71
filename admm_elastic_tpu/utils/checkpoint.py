"""Simulation-state checkpointing.

The reference has no state persistence (closest: scene export,
SceneManager.cpp:156-209). Here the full step state — positions, velocities,
elapsed time, warm-started duals u (System.cpp:42 keeps them across steps, so
they belong in the checkpoint), and per-force state (hyperelastic warm
starts, control points) — round-trips through a flat .npz.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

_SEP = "/"


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}{_SEP}"))
    else:
        out[prefix.rstrip(_SEP)] = np.asarray(tree)
    return out


def _unflatten(flat):
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_state(path: str, state) -> None:
    np.savez_compressed(path, **_flatten(state))


def load_state(path: str, dtype=None, like=None):
    """Load a checkpoint. Float arrays are cast to `dtype` if given; the
    result plugs directly into System.state / a step function.

    Empty sub-dicts (constraint types with no aux state) are not representable
    in npz; pass `like=` (an existing state pytree, e.g. system.state) to
    restore the full structure.
    """
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    tree = _unflatten(flat)

    if like is not None:
        def merge(template, loaded):
            if isinstance(template, dict):
                return {
                    k: merge(template[k], loaded.get(k, {}) if isinstance(loaded, dict) else {})
                    for k in template
                }
            return loaded if not isinstance(loaded, dict) else template

        tree = merge(like, tree)

    def to_dev(a):
        if isinstance(a, dict):
            return a
        a = np.asarray(a)
        if dtype is not None and np.issubdtype(a.dtype, np.floating):
            return jnp.asarray(a, dtype)
        return jnp.asarray(a)

    import jax

    return jax.tree_util.tree_map(to_dev, tree)
