"""Explicit (pre-ADMM) velocity forces (reference ExplicitForce.cpp).

Applied to velocities before the optimization predicts x_bar
(System.cpp:37-39). ExplicitForce is a constant acceleration (gravity);
WindForce is the Wejchert-Haumann (1991) aerodynamic normal drag over
triangles with a scatter-add to vertex velocities — the reference's
`omp critical` scatter (ExplicitForce.cpp:89) becomes a segment_sum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class ExplicitForce:
    """v += dt * direction on all nodes or an index subset
    (ExplicitForce.cpp:29-39). `direction` lives in params (runtime-mutable,
    e.g. windyflag's W-key gust toggle via pre-step callback)."""

    def __init__(self, direction=(0.0, 0.0, 0.0), indices=None):
        self.direction = np.asarray(direction, dtype=np.float64)
        self.indices = (
            None if indices is None else np.asarray(indices, dtype=np.int32)
        )
        self.name = ""

    def build(self):
        params = {"direction": self.direction}
        if self.indices is not None:
            params["indices"] = self.indices
        return params

    def apply(self, dt, x, v, masses, params):
        d = params["direction"]
        if self.indices is None:
            return v + dt * d
        return v.at[params["indices"]].add(dt * d)


class WindForce(ExplicitForce):
    """Per-triangle aerodynamic drag (ExplicitForce.cpp:42-98):
    force = -alpha * area * v_n * |v_n| * n_hat, scaled by 0.33*dt and added
    to each of the triangle's 3 vertex velocities."""

    ALPHA_N = 1000.0  # coupling strength (ExplicitForce.cpp:72)

    def __init__(self, tris, direction=(0.0, 0.0, 0.0)):
        super().__init__(direction)
        self.tris = np.asarray(tris, dtype=np.int32).reshape(-1, 3)

    def build(self):
        return {"direction": self.direction, "tris": self.tris}

    def apply(self, dt, x, v, masses, params):
        tris = params["tris"]
        p = x[tris]  # (F,3,3)
        tv = v[tris]
        curr_v = jnp.mean(tv, axis=1)  # (F,3)
        v_r = curr_v - params["direction"]
        n = jnp.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
        n_len = jnp.linalg.norm(n, axis=1, keepdims=True)
        normal = n / jnp.where(n_len > 0, n_len, 1.0)
        area = 0.5 * n_len[:, 0]
        v_n = jnp.einsum("fj,fj->f", normal, v_r)
        force = (
            -self.ALPHA_N * (area * v_n * jnp.abs(v_n))[:, None] * normal
        ) * (0.33 * dt)
        # scatter the same force to all 3 vertices (ExplicitForce.cpp:85-94)
        contrib = jnp.broadcast_to(force[:, None, :], (tris.shape[0], 3, 3))
        dv = jax.ops.segment_sum(
            contrib.reshape(-1, 3), tris.reshape(-1), num_segments=v.shape[0]
        )
        return v + dv
