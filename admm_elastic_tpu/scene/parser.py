"""Parser for the reference's scene/config XML dialect.

A scene file contains TWO root elements (not well-formed XML): <mclScene>
with objects/materials/lights, and <admmelastic> with solver settings and
named force definitions (e.g. samples/windyflag/cloth.xml). We wrap the file
in a synthetic root before parsing with xml.etree.

Parsed structure (SimContext.cpp:39-102, SceneManager.cpp:37-153):
  <admmelastic>
    <solver> <iterations value=N/> <timestep value=s/> <realtime value=b/>
             <verbose value=N/> </solver>
    <Force name="..." type="ExplicitForce|TriangleStrain|Bend|Spring|
           LinearTetStrain|NeoHookeanTet|StVKTet|volpres|StaticAnchor|
           WindForce"> params... </Force>
  <mclScene>
    <Object name="..." type="plane|cylinder|sphere|box|torus|tetmesh|trimesh">
      params incl. <Force value="force-name"/> (dynamic objects only)
    <Material/...> (parsed, retained for export; no GL renderer here)
"""

from __future__ import annotations

import dataclasses
import os
import xml.etree.ElementTree as ET

from .params import Component, Param


@dataclasses.dataclass
class SolverSettings:
    iterations: int = 10
    timestep: float = 0.04
    realtime: bool = False
    verbose: int = 1


@dataclasses.dataclass
class SceneConfig:
    path: str
    solver: SolverSettings
    forces: dict[str, Component]  # name -> force definition
    objects: list[Component]
    materials: dict[str, Component]
    lights: list[Component]
    cameras: list[Component]

    @property
    def base_dir(self) -> str:
        return os.path.dirname(os.path.abspath(self.path))


def _component_of(elem) -> Component:
    c = Component(
        kind=elem.tag.lower(),
        name=elem.attrib.get("name", ""),
        type=elem.attrib.get("type", ""),
        params=[],
    )
    for child in elem:
        c.params.append(
            Param(tag=child.tag.lower(), value=child.attrib.get("value", ""))
        )
    return c


def parse_scene_file(path: str) -> SceneConfig:
    with open(path) as f:
        text = f.read()
    # strip the xml declaration, wrap the multiple roots
    if text.lstrip().startswith("<?xml"):
        text = text.split("?>", 1)[1]
    root = ET.fromstring(f"<__wrap__>{text}</__wrap__>")

    solver = SolverSettings()
    forces: dict[str, Component] = {}
    objects: list[Component] = []
    materials: dict[str, Component] = {}
    lights: list[Component] = []
    cameras: list[Component] = []

    for top in root:
        tag = top.tag.lower()
        if tag == "admmelastic":
            for elem in top:
                etag = elem.tag.lower()
                if etag == "solver":
                    for p in elem:
                        ptag = p.tag.lower()
                        val = p.attrib.get("value", "")
                        if ptag == "iterations":
                            solver.iterations = int(float(val))
                        elif ptag == "timestep":
                            solver.timestep = float(val)
                        elif ptag == "realtime":
                            solver.realtime = val not in ("0", "false", "")
                        elif ptag == "verbose":
                            solver.verbose = int(float(val))
                elif etag == "force":
                    c = _component_of(elem)
                    if not c.name or not c.type:
                        raise ValueError(
                            f"{path}: <Force> needs a name and type"
                        )
                    forces[c.name] = c
        elif tag == "mclscene":
            for elem in top:
                etag = elem.tag.lower()
                c = _component_of(elem)
                if etag == "object":
                    objects.append(c)
                elif etag == "material":
                    materials[c.name] = c
                elif etag == "light":
                    lights.append(c)
                elif etag == "camera":
                    cameras.append(c)

    return SceneConfig(
        path=path,
        solver=solver,
        forces=forces,
        objects=objects,
        materials=materials,
        lights=lights,
        cameras=cameras,
    )
