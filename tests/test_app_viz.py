"""Headless Application loop, offline renderer, and the scene-runner CLI."""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCENE = os.path.join(REPO, "samples", "scenes", "cloth.xml")


def _ctx():
    from admm_elastic_tpu.models import StaticAnchor
    from admm_elastic_tpu.scene import SimContext

    ctx = SimContext()
    ctx.load(SCENE)
    ctx.system.settings.admm_iters = 5
    ctx.system.add_force(StaticAnchor([0, 20]))
    ctx.initialize()
    return ctx


def test_application_loop_controls(tmp_path):
    from admm_elastic_tpu.app import Application

    ctx = _ctx()
    app = Application(ctx, screen_dt=0.04)
    app.frame_dir = str(tmp_path)
    app.fire("toggle_run")  # pause
    app.display(2)
    assert ctx.system.elapsed_s == 0.0
    app.fire("toggle_run")
    events = []
    app.on("gust", lambda a: events.append(a.frame))
    app.fire("gust")
    app.fire("toggle_save")
    app.display(2)
    assert ctx.system.elapsed_s > 0.0
    assert events == [2]
    assert any(f.endswith(".obj") for f in os.listdir(tmp_path))


def test_render_frame(tmp_path):
    from admm_elastic_tpu.viz import render_frame

    ctx = _ctx()
    ctx.step()
    ctx.update()
    out = render_frame(ctx.objects, str(tmp_path / "f.png"))
    assert os.path.getsize(out) > 10_000  # non-trivial image


def test_cli_scene_runner(tmp_path):
    env = dict(os.environ)
    env.update(PYTHONPATH=REPO, JAX_PLATFORMS="cpu", _AET_CLEAN_ENV="1")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    ck = str(tmp_path / "ck.npz")
    r = subprocess.run(
        [sys.executable, "-m", "admm_elastic_tpu", SCENE, "--steps", "3",
         "--checkpoint", ck, "-it", "5"],
        capture_output=True, text=True, env=env, timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "done: 3 steps" in r.stdout
    assert os.path.exists(ck)
    data = np.load(ck)
    assert "x" in data.files and data["x"].shape[1] == 3


def test_render_scene_consumes_materials_and_lights(tmp_path):
    """The offline renderer consumes the XML-declared BlinnPhong materials
    and point lights (Material.hpp / Light.hpp / RenderGL semantics):
    rendering with the scene's gray vs white materials produces visibly
    different pixels for the pole object."""
    import os

    from admm_elastic_tpu.scene import SimContext
    from admm_elastic_tpu.viz import render_scene

    scene = os.path.join(
        os.path.dirname(__file__), "..", "samples", "scenes", "cloth.xml"
    )
    ctx = SimContext()
    ctx.load(scene)
    ctx.initialize()
    assert ctx.scene.materials, "cloth.xml declares materials"
    # programmatic lights (SceneManager::make_light analog) feed the render
    ctx.make_light("point", name="p1", position=(10, 10, 10),
                   intensity=(0.7, 0.7, 0.7), falloff=(1, 0, 0))
    ctx.make_light("point", name="p2", position=(-10, 10, -10),
                   intensity=(0.5, 0.5, 0.5), falloff=(1, 0, 0))
    assert ctx.scene.lights
    p1 = render_scene(ctx, str(tmp_path / "lit.png"))
    assert os.path.exists(p1)

    # flat fallback (no lights) must differ from the lit render
    from admm_elastic_tpu.viz import render_frame

    p2 = render_frame(ctx.objects, str(tmp_path / "flat.png"))
    import matplotlib.image as mpimg

    a, b = mpimg.imread(p1), mpimg.imread(p2)
    assert a.shape == b.shape
    assert np.abs(a.astype(float) - b.astype(float)).max() > 0.05
