"""Scene layer: XML dialect parsing (including the reference's own scene
files, which are the dialect's ground truth) and scene-to-system building."""

import os

import numpy as np
import pytest

from admm_elastic_tpu.scene import SimContext, compose_xform, parse_scene_file
from admm_elastic_tpu.scene.params import Component, Param

REF = "/root/reference"
REPO_SCENES = os.path.join(os.path.dirname(__file__), "..", "samples", "scenes")


def test_parse_bundled_cloth_scene():
    cfg = parse_scene_file(os.path.join(REPO_SCENES, "cloth.xml"))
    assert cfg.solver.iterations == 30
    assert cfg.solver.timestep == pytest.approx(0.04)
    assert set(cfg.forces) == {"gravity", "admmstyle", "bend"}
    assert cfg.forces["admmstyle"].type.lower() == "trianglestrain"
    assert cfg.forces["admmstyle"].get("stiffness").as_double() == 100.0
    np.testing.assert_allclose(
        cfg.forces["admmstyle"].get("limit").as_vec2(), [0.95, 1.05]
    )
    names = [o.name for o in cfg.objects]
    assert names == ["cloth1", "pole"]
    assert "white_flag" in cfg.materials


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not present")
def test_parse_reference_scenes_verbatim():
    """The reference's own XML files parse with identical content — the
    dialect reader keeps their scenes usable as-is."""
    cfg = parse_scene_file(REF + "/samples/windyflag/cloth.xml")
    assert cfg.solver.iterations == 30
    assert {o.name for o in cfg.objects} == {"cloth1", "pole"}
    cloth = next(o for o in cfg.objects if o.name == "cloth1")
    assert cloth.get("width").as_int() == 30
    assert cloth.get("mass").as_double() == pytest.approx(0.5)

    cfg2 = parse_scene_file(REF + "/samples/bunnyexpand/bunnyexpand.xml")
    assert cfg2.solver.iterations == 10
    assert cfg2.forces["svktet"].get("mu").as_double() == 100.0

    cfg3 = parse_scene_file(REF + "/samples/poordillo/poordillo.xml")
    assert cfg3.solver.timestep == pytest.approx(0.06)
    assert cfg3.forces["nhtet"].type.lower() == "neohookeantet"

    cfg4 = parse_scene_file(REF + "/samples/plinkopony/plinko.xml")
    assert cfg4.solver.iterations == 13
    cyls = [o for o in cfg4.objects if o.name.startswith("cyl")]
    assert len(cyls) == 23


def test_xform_composition_order():
    """scale-then-translate composes M = S @ T (applied translate-first),
    matching mclscene's accumulation (DefaultBuilders.hpp:59-77)."""
    c = Component(kind="object", name="o", type="plane")
    c.params = [Param("scale", "2 2 2"), Param("translate", "1 0 0")]
    M = compose_xform(c)
    p = M[:3, :3] @ np.array([1.0, 0, 0]) + M[:3, 3]
    np.testing.assert_allclose(p, [4.0, 0, 0])  # 2*(1+1)

    c.params = [Param("translate", "1 0 0"), Param("scale", "2 2 2")]
    M = compose_xform(c)
    p = M[:3, :3] @ np.array([1.0, 0, 0]) + M[:3, 3]
    np.testing.assert_allclose(p, [3.0, 0, 0])  # 2*1+1


def test_rotate_xform():
    c = Component(kind="object", name="o", type="plane")
    c.params = [Param("rotate", "90 0 0")]
    M = compose_xform(c)
    p = M[:3, :3] @ np.array([0.0, 1.0, 0.0])
    np.testing.assert_allclose(p, [0, 0, 1], atol=1e-12)


def test_build_cloth_scene_end_to_end():
    ctx = SimContext()
    ctx.load(os.path.join(REPO_SCENES, "cloth.xml"))
    # cloth dynamic (1251 verts), pole static
    cloth = ctx.objects_map["cloth1"]
    pole = ctx.objects_map["pole"]
    assert cloth.is_dynamic and not pole.is_dynamic
    assert cloth.n_nodes == 31 * 21 + 30 * 20 == 1251
    assert ctx.system.n_nodes == 1251
    # forces: strain batch (2400 tris) + bend batch
    kinds = {type(f).__name__ for f in ctx.system.forces}
    assert kinds == {"LimitedTriangleStrain", "Bend"}
    # solver settings flowed through
    assert ctx.system.settings.admm_iters == 30
    # xform applied: scale .75 -> x extent ~1.5m wide
    ext = cloth.vertices[:, 0].max() - cloth.vertices[:, 0].min()
    assert ext == pytest.approx(1.5, rel=1e-6)
    # masses: density-weighted sum to total
    np.testing.assert_allclose(ctx.system.masses.sum(), 0.5, rtol=1e-9)

    ctx.initialize()
    for _ in range(3):
        ctx.step()
    ctx.update()
    assert np.isfinite(np.asarray(cloth.vertices)).all()


def test_export_obj(tmp_path):
    ctx = SimContext()
    ctx.load(os.path.join(REPO_SCENES, "cloth.xml"))
    ctx.initialize()
    ctx.step()
    ctx.export_obj(str(tmp_path), 0)
    files = sorted(os.listdir(tmp_path))
    assert "cloth1_00000.obj" in files and "pole_00000.obj" in files


def test_tetmesh_object_ply_fallback(tmp_path):
    """A `<Object type="tetmesh">` whose file is a surface mesh (no
    .node/.ele pair) is tetrahedralized on load — the reference's
    TetMesh::load -> make_tetmesh path (TetMesh.cpp:47-64,376-435) reached
    through the XML builder (DefaultBuilders.hpp:263-276)."""
    from admm_elastic_tpu.geometry.primitives import make_box
    from admm_elastic_tpu.geometry.trimesh import TriMesh

    box = make_box(tess=1)
    TriMesh(vertices=box.vertices, faces=box.faces).save_obj(
        str(tmp_path / "box.obj"))
    (tmp_path / "scene.xml").write_text("""
<mclscene>
  <Object name="blob" type="tetmesh">
    <File value="box.obj"/>
    <Mass value="1.0"/>
    <Force value="elastic"/>
  </Object>
</mclscene>
<admmelastic>
  <solver iterations="5" timestep="0.04"/>
  <Force name="elastic" type="lineartetstrain">
    <Stiffness value="1000"/>
  </Force>
  <Force name="gravity" type="explicitforce">
    <Direction value="0 -9.8 0"/>
  </Force>
</admmelastic>
""")
    ctx = SimContext()
    ctx.load(str(tmp_path / "scene.xml"))
    blob = ctx.objects_map["blob"]
    assert blob.is_dynamic and blob.mesh.n_tets >= 5
    ctx.initialize()
    y0 = float(np.asarray(ctx.system.x)[:, 1].mean())
    for _ in range(3):
        ctx.step()
    ctx.update()
    x = np.asarray(ctx.system.x)
    assert np.isfinite(x).all()
    assert x[:, 1].mean() < y0  # fell under gravity


def test_windyflag_scene_rides_cloth_kernel():
    """The bundled windyflag scene (sym-plane flag, XML route, xform,
    density-weighted masses, scene-built strain+bend) qualifies for the
    whole-timestep cloth kernel once anchors/wind are added — the
    bench.py --preset windyflag configuration (2.72 ms/step on chip)."""
    from admm_elastic_tpu.models import StaticAnchor, WindForce

    ctx = SimContext()
    ctx.load(os.path.join(REPO_SCENES, "cloth.xml"))
    ctx.system.settings.lattice_fast_path = True
    ctx.system.settings.global_solver = "dia"
    cloth = ctx.objects_map["cloth1"]
    length = cloth.component.get("length").as_int()
    ctx.system.add_force(
        StaticAnchor([cloth.index_offset, cloth.index_offset + length]))
    ctx.system.add_explicit_force(
        WindForce(cloth.faces + cloth.index_offset, direction=(10, 0, 2)))
    ctx.initialize()
    lat = ctx.system._lattice
    assert lat is not None and lat.model == "cloth"
    for _ in range(3):
        ctx.step()
    ctx.update()
    assert np.isfinite(np.asarray(cloth.vertices)).all()
