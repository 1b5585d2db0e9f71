"""Checkpoint round-trip and rollout equivalence."""

import jax.numpy as jnp
import numpy as np

from admm_elastic_tpu import Settings, System
from admm_elastic_tpu.models import ExplicitForce, LinearTetStrain, StaticAnchor
from admm_elastic_tpu.utils import load_state, save_state


def _build():
    sys = System(
        Settings(timestep_s=0.04, admm_iters=8, verbose=0, dtype=jnp.float64)
    )
    x = np.array([[0, 1, 0], [0, 0, 0], [0, 0, 1], [1, 0, 0]], dtype=float)
    sys.add_nodes(x, np.ones(4))
    sys.add_force(StaticAnchor([0]))
    sys.add_force(LinearTetStrain(np.array([[0, 1, 2, 3]]), stiffness=120.0))
    sys.add_explicit_force(ExplicitForce(direction=(0, -9.8, 0)))
    assert sys.initialize()
    return sys


def test_checkpoint_roundtrip_resumes_exactly(tmp_path):
    a = _build()
    for _ in range(5):
        a.step()
    ckpt = str(tmp_path / "state.npz")
    save_state(ckpt, a.state)
    for _ in range(5):
        a.step()

    b = _build()
    b.state = load_state(ckpt, dtype=jnp.float64, like=b.state)
    for _ in range(5):
        b.step()
    np.testing.assert_allclose(b.x, a.x, rtol=1e-13, atol=1e-14)
    # duals must round-trip too (warm start affects convergence)
    for k in a.state["u"]:
        np.testing.assert_allclose(
            np.asarray(b.state["u"][k]), np.asarray(a.state["u"][k]), atol=1e-14
        )


def test_rollout_matches_stepping():
    a = _build()
    for _ in range(6):
        a.step()
    b = _build()
    b.run(6)
    np.testing.assert_allclose(b.x, a.x, rtol=1e-13, atol=1e-14)
