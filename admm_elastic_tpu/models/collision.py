"""Hard collision constraints as an ADMM force (reference CollisionForce.cpp).

The selector is the identity over every node with weight 32
(CollisionForce.cpp:27-34) — the constraint space is the node positions
themselves. The local step projects any penetrating node out of each analytic
collision shape (floor plane, sphere, z-axis cylinder; collision/*.hpp).

Shapes are stored struct-of-arrays per kind and applied in kind groups
(floors, then spheres, then cylinders), each group vectorized over
(nodes x shapes). The reference applies shapes in vector order per node
(CollisionForce.cpp:56-67); ordering only matters for nodes penetrating
multiple overlapping shapes simultaneously, which no bundled scene exercises.
Shape parameters live in `params` so they can move at runtime.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from .base import ForceBatch


@dataclasses.dataclass
class Floor:
    """y <= center_y is inside; projection snaps y to the plane
    (CollisionFloor.hpp:47-55)."""

    center: tuple  # (3,), only y used


@dataclasses.dataclass
class Sphere:
    center: tuple
    radius: float


@dataclasses.dataclass
class Cylinder:
    """Axis parallel to z through (center_x, center_y)
    (CollisionCylinder.hpp:46-65)."""

    center: tuple
    radius: float


class Collision(ForceBatch):
    R, K = 1, 1

    def __init__(self, shapes, n_nodes: int, weight=32.0):
        self.shapes = list(shapes)
        self.n_nodes = int(n_nodes)
        self.weight_value = float(weight)

    @property
    def n_elements(self) -> int:
        return self.n_nodes

    def build(self, x, masses, dt):
        n = self.n_nodes
        floors = [s for s in self.shapes if isinstance(s, Floor)]
        spheres = [s for s in self.shapes if isinstance(s, Sphere)]
        cyls = [s for s in self.shapes if isinstance(s, Cylinder)]
        params = {
            "indices": np.arange(n, dtype=np.int32)[:, None],
            "coeff": np.ones((n, 1, 1)),
            "weight": np.full(n, self.weight_value),
            "floor_y": np.array([s.center[1] for s in floors], dtype=np.float64),
            "sphere_c": np.array(
                [s.center for s in spheres], dtype=np.float64
            ).reshape(-1, 3),
            "sphere_r": np.array([s.radius for s in spheres], dtype=np.float64),
            "cyl_c": np.array(
                [[s.center[0], s.center[1]] for s in cyls], dtype=np.float64
            ).reshape(-1, 2),
            "cyl_r": np.array([s.radius for s in cyls], dtype=np.float64),
        }
        return params, {}

    def project(self, Dx, u, params, state):
        p = (Dx + u)[:, 0, :]  # (n,3) candidate positions

        # floors: if y < floor_y, snap y up to the plane
        for_y = params["floor_y"]
        if for_y.shape[0] > 0:
            target = jnp.max(for_y)  # stacked floors: highest wins
            y = p[:, 1]
            inside = y < target
            p = p.at[:, 1].set(jnp.where(inside, target, y))

        # spheres: push to surface along the center ray
        sc, sr = params["sphere_c"], params["sphere_r"]
        if sr.shape[0] > 0:
            for j in range(sr.shape[0]):
                d = p - sc[j]
                dist = jnp.linalg.norm(d, axis=1, keepdims=True)
                inside = dist[:, 0] < sr[j]
                dir_ = d / jnp.where(dist > 0, dist, 1.0)
                proj = sc[j] + sr[j] * dir_
                p = jnp.where(inside[:, None], proj, p)

        # cylinders (z-axis): push out radially in the xy plane
        cc, cr = params["cyl_c"], params["cyl_r"]
        if cr.shape[0] > 0:
            for j in range(cr.shape[0]):
                d = p[:, :2] - cc[j]
                dist = jnp.linalg.norm(d, axis=1, keepdims=True)
                inside = dist[:, 0] < cr[j]
                dir_ = d / jnp.where(dist > 0, dist, 1.0)
                proj_xy = cc[j] + cr[j] * dir_
                p = jnp.where(
                    inside[:, None],
                    jnp.concatenate([proj_xy, p[:, 2:3]], axis=1),
                    p,
                )

        return p[:, None, :], state
