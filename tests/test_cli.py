"""CLI entry point (__main__.py): resume/checkpoint plumbing on every
branch — single-device, --sharded (halo path), and (statefully) --live.

The reference has no CLI runner beyond per-sample main()s; checkpointing
is this framework's own aux subsystem (SURVEY §5.4), so the contract
worth pinning is internal consistency: `--resume ckpt` continues the
trajectory that produced ckpt, on every branch that advertises it.
"""

import numpy as np
import pytest

import jax

from admm_elastic_tpu.__main__ import main
from admm_elastic_tpu.scene import SimContext
from admm_elastic_tpu.utils import load_state


SCENE_XML = """
<mclscene>
  <Object name="blob" type="tetmesh">
    <File value="box.obj"/>
    <Mass value="1.0"/>
    <Force value="elastic"/>
  </Object>
</mclscene>
<admmelastic>
  <solver iterations="4" timestep="0.04"/>
  <Force name="elastic" type="lineartetstrain">
    <Stiffness value="1000"/>
  </Force>
  <Force name="gravity" type="explicitforce">
    <Direction value="0 -9.8 0"/>
  </Force>
</admmelastic>
"""


@pytest.fixture
def scene_file(tmp_path):
    from admm_elastic_tpu.geometry.primitives import make_box
    from admm_elastic_tpu.geometry.trimesh import TriMesh

    box = make_box(tess=1)
    TriMesh(vertices=box.vertices, faces=box.faces).save_obj(
        str(tmp_path / "box.obj"))
    p = tmp_path / "scene.xml"
    p.write_text(SCENE_XML)
    return str(p)


def _run(*argv):
    assert main(list(argv)) == 0


def test_resume_continues_single_device(scene_file, tmp_path):
    ck = str(tmp_path / "a.npz")
    full = str(tmp_path / "b.npz")
    _run(scene_file, "--steps", "3", "--checkpoint", ck)
    _run(scene_file, "--steps", "3", "--resume", ck, "--checkpoint", full)
    # 3 + 3 resumed == 6 straight
    straight = str(tmp_path / "c.npz")
    _run(scene_file, "--steps", "6", "--checkpoint", straight)
    a = load_state(full)
    b = load_state(straight)
    np.testing.assert_allclose(a["x"], b["x"], atol=1e-12)


def test_sharded_resume_not_ignored(scene_file, tmp_path):
    """Advisor r4 medium finding: --sharded dropped --resume silently
    (ran from scratch, then overwrote the checkpoint as if resumed)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    ck = str(tmp_path / "a.npz")
    out = str(tmp_path / "b.npz")
    _run(scene_file, "--steps", "3", "--checkpoint", ck)
    _run(scene_file, "--sharded", "2", "--steps", "2",
         "--resume", ck, "--checkpoint", out)
    # reference trajectory: 3 single-device + 2 sharded-from-resume must
    # track 5 single-device steps (halo path parity is ~1e-8-tight;
    # SimContext single-device may ride a different solver config, so
    # compare against the same halo-path continuation)
    ctx = SimContext()
    ctx.load(scene_file)
    if ctx.system.settings.global_solver in ("auto", "dense"):
        ctx.system.settings.global_solver = "ell"
    ctx.system.settings.lattice_fast_path = False
    ctx.initialize()
    ctx.system.state = load_state(
        ck, dtype=ctx.system.settings.dtype, like=ctx.system.state)
    for _ in range(2):
        ctx.system.step()
    got = load_state(out)
    # D=2 psum reduction reorder vs the single-device solve -> ~1e-6
    # divergence after 2 steps; a from-scratch (non-resumed) run would
    # differ at the 1e-1 level (0.12 s less free fall)
    np.testing.assert_allclose(
        np.asarray(got["x"]), np.asarray(ctx.system.x), atol=1e-4)
    # a from-scratch 2-step run leaves min-y around -1.04; the resumed
    # (5 total steps of fall) run lands near -1.235
    assert np.asarray(got["x"])[:, 1].min() < -1.15


def test_live_resume_loads_state(scene_file, tmp_path, monkeypatch):
    """--live must honor --resume/--checkpoint (advisor r4)."""
    ck = str(tmp_path / "a.npz")
    out = str(tmp_path / "b.npz")
    _run(scene_file, "--steps", "3", "--checkpoint", ck)

    seen = {}

    # don't actually open a socket: capture the state the server would
    # serve, then mutate nothing (serve is monkeypatched out)
    from admm_elastic_tpu import live

    def fake_serve(self, port=0, max_steps=None, **kw):
        seen["x"] = np.asarray(self.system.x).copy()
        return 0

    monkeypatch.setattr(live.LiveViewer, "serve", fake_serve)
    _run(scene_file, "--live", "1", "--steps", "2",
         "--resume", ck, "--checkpoint", out)
    want = np.asarray(load_state(ck)["x"])
    np.testing.assert_allclose(seen["x"], want, atol=1e-12)
    # checkpoint written on the live branch too
    got = load_state(out)
    np.testing.assert_allclose(np.asarray(got["x"]), want, atol=1e-12)
