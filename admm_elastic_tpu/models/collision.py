"""Hard collision constraints as an ADMM force (reference CollisionForce.cpp).

The selector is the identity over every node with weight 32
(CollisionForce.cpp:27-34) — the constraint space is the node positions
themselves. The local step projects any penetrating node out of each analytic
collision shape (floor plane, sphere, z-axis cylinder; collision/*.hpp).

Shapes are stored struct-of-arrays per kind but applied in the original
declaration order (the reference applies shapes in vector order per node,
CollisionForce.cpp:56-67, and order matters when a node penetrates multiple
overlapping shapes). The per-shape loop is unrolled (shape count is small
and static); shape parameters live in `params` so they can move at runtime.
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

        counters = {"floor": 0, "sphere": 0, "cylinder": 0}
        for shape in self.shapes:
            if isinstance(shape, Floor):
                j = counters["floor"]
                counters["floor"] += 1
                target = params["floor_y"][j]
                y = p[:, 1]
                p = p.at[:, 1].set(jnp.where(y < target, target, y))
            elif isinstance(shape, Sphere):
                j = counters["sphere"]
                counters["sphere"] += 1
                c, r = params["sphere_c"][j], params["sphere_r"][j]
                d = p - c
                dist = jnp.linalg.norm(d, axis=1, keepdims=True)
                inside = dist[:, 0] < r
                dir_ = d / jnp.where(dist > 0, dist, 1.0)
                p = jnp.where(inside[:, None], c + r * dir_, p)
            elif isinstance(shape, Cylinder):
                j = counters["cylinder"]
                counters["cylinder"] += 1
                c, r = params["cyl_c"][j], params["cyl_r"][j]
                d = p[:, :2] - c
                dist = jnp.linalg.norm(d, axis=1, keepdims=True)
                inside = dist[:, 0] < r
                dir_ = d / jnp.where(dist > 0, dist, 1.0)
                proj_xy = c + r * dir_
                p = jnp.where(
                    inside[:, None],
                    jnp.concatenate([proj_xy, p[:, 2:3]], axis=1),
                    p,
                )

        return p[:, None, :], state
