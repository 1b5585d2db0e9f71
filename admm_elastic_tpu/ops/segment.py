"""Gather / scatter primitives implementing the sparse selector D.

The reference assembles a global sparse matrix D from per-force triplets and
multiplies it explicitly (System.cpp:122-127,54,61). The key structural fact
(exploited throughout this framework): every selector row-group acts
component-wise — rows come in groups of 3 (one per xyz component) with the
same coefficient per vertex and the same weight — so D never mixes vector
components, and the global operator is  A_hat (x) I_3  with A_hat only (n,n).

Each constraint batch is therefore (indices (E,K), coeff (E,R,K), weight (E,))
where R = row-groups and K = stencil size:

  D   apply:  Dx[e,r,:]  = sum_k coeff[e,r,k] * x[idx[e,k],:]      (gather)
  D^T apply:  out[v,:]  += sum_{e,k: idx=v} sum_r coeff[e,r,k]*w2[e]*y[e,r,:]
  diagonal:   diag[v]   += sum_{e,k: idx=v} w2[e]*sum_r coeff[e,r,k]^2
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def coeff_apply(coeff: jax.Array, indices: jax.Array, x: jax.Array) -> jax.Array:
    """D apply: (E,R,K), (E,K), (n,3) -> (E,R,3)."""
    verts = x[indices]  # (E,K,3)
    return jnp.einsum("erk,ekj->erj", coeff, verts)


def coeff_apply_T(
    coeff: jax.Array,
    indices: jax.Array,
    w2: jax.Array,
    y: jax.Array,
    n_vertices: int,
) -> jax.Array:
    """D^T W^2 apply: scatter-add element contributions to vertices -> (n,3)."""
    contrib = jnp.einsum("erk,e,erj->ekj", coeff, w2, y)  # (E,K,3)
    flat_idx = indices.reshape(-1)
    flat = contrib.reshape(-1, 3)
    return jax.ops.segment_sum(flat, flat_idx, num_segments=n_vertices)


def coeff_diag(
    coeff: jax.Array, indices: jax.Array, w2: jax.Array, n_vertices: int
) -> jax.Array:
    """Per-vertex diagonal of D^T W^2 D -> (n,). Exact (D is component-diagonal)."""
    per_vk = w2[:, None] * jnp.sum(coeff * coeff, axis=1)  # (E,K)
    return jax.ops.segment_sum(
        per_vk.reshape(-1), indices.reshape(-1), num_segments=n_vertices
    )
