"""String-typed scene parameters and transform composition.

Mirrors mcl::Param / mcl::Component semantics (deps/mclscene/include/MCL/
Param.hpp:35-287): every parameter is a (tag, value-string) pair with typed
accessors; scale/translate/rotate tags become 4x4 transforms composed
left-to-right in document order and applied once to the object's vertices
(DefaultBuilders.hpp:59-77). Rotation composes rotX * rotY * rotZ in degrees
(Param.hpp:148-158).
"""

from __future__ import annotations

import dataclasses

import numpy as np


def _rot_axis(angle_rad: float, axis: np.ndarray) -> np.ndarray:
    c, s = np.cos(angle_rad), np.sin(angle_rad)
    x, y, z = axis / np.linalg.norm(axis)
    C = 1 - c
    M = np.eye(4)
    M[:3, :3] = [
        [x * x * C + c, x * y * C - z * s, x * z * C + y * s],
        [y * x * C + z * s, y * y * C + c, y * z * C - x * s],
        [z * x * C - y * s, z * y * C + x * s, z * z * C + c],
    ]
    return M


def xform_of(tag: str, vec3) -> np.ndarray:
    v = np.asarray(vec3, dtype=np.float64)
    M = np.eye(4)
    if tag == "translate":
        M[:3, 3] = v
    elif tag == "scale":
        M[0, 0], M[1, 1], M[2, 2] = v
    elif tag == "rotate":
        r = np.deg2rad(v)
        M = (
            _rot_axis(r[0], np.array([1.0, 0, 0]))
            @ _rot_axis(r[1], np.array([0, 1.0, 0]))
            @ _rot_axis(r[2], np.array([0, 0, 1.0]))
        )
    else:
        raise ValueError(f"not an xform tag: {tag}")
    return M


@dataclasses.dataclass
class Param:
    tag: str  # lower-cased element name
    value: str

    def as_str(self) -> str:
        return self.value

    def as_double(self) -> float:
        return float(self.value.split()[0])

    def as_int(self) -> int:
        return int(float(self.value.split()[0]))

    def as_bool(self) -> bool:
        s = self.value.split()[0]
        return s not in ("0", "false", "False", "")

    def as_vec2(self) -> np.ndarray:
        return np.asarray([float(x) for x in self.value.split()[:2]])

    def as_vec3(self) -> np.ndarray:
        return np.asarray([float(x) for x in self.value.split()[:3]])


@dataclasses.dataclass
class Component:
    """A named scene element: <Object>, <Force>, <Material>, ... with params."""

    kind: str  # element tag, lower-cased ('object', 'force', ...)
    name: str
    type: str
    params: list[Param] = dataclasses.field(default_factory=list)

    def exists(self, tag: str) -> bool:
        tag = tag.lower()
        return any(p.tag == tag for p in self.params)

    def get(self, tag: str) -> Param:
        tag = tag.lower()
        for p in self.params:
            if p.tag == tag:
                return p
        raise KeyError(f"{self.kind} '{self.name}' has no param '{tag}'")

    def get_all(self, tag: str) -> list[Param]:
        tag = tag.lower()
        return [p for p in self.params if p.tag == tag]

    def __getitem__(self, tag: str) -> Param:
        return self.get(tag)


def compose_xform(component: Component) -> np.ndarray:
    """Compose scale/translate/rotate params in document order:
    M = M @ param_xform, applied once as v' = M v (DefaultBuilders.hpp:59-77)."""
    M = np.eye(4)
    for p in component.params:
        if p.tag in ("translate", "scale", "rotate"):
            M = M @ xform_of(p.tag, p.as_vec3())
    return M
