"""Pallas fused local-step kernels, validated in interpreter mode on CPU
against the jnp reference implementations (the kernels compile natively on
TPU; interpret=True exercises identical math)."""

import jax.numpy as jnp
import numpy as np

from admm_elastic_tpu.ops.pallas.tet_local import (
    BLOCK,
    arap_local_step,
    arap_local_step_reference,
)


def _data(E, seed=0, inverted=False):
    rng = np.random.default_rng(seed)
    dx9 = rng.normal(size=(9, E)).astype(np.float32)
    if inverted:
        # make a batch of inverted deformation gradients
        F = dx9.T.reshape(E, 3, 3)
        F[: E // 2] = F[: E // 2] @ np.diag([1.0, 1.0, -1.0])
        dx9 = F.reshape(E, 9).T.copy()
    u9 = (rng.normal(size=(9, E)) * 0.1).astype(np.float32)
    w2 = rng.uniform(0.5, 2.0, E).astype(np.float32)
    k = rng.uniform(0.5, 2.0, E).astype(np.float32)
    return (jnp.asarray(a) for a in (dx9, u9, w2, k))


def test_arap_kernel_matches_reference():
    dx9, u9, w2, k = _data(2 * BLOCK)
    z1, un1 = arap_local_step(dx9, u9, w2, k, interpret=True)
    z2, un2 = arap_local_step_reference(dx9, u9, w2, k)
    assert float(jnp.abs(z1 - z2).max()) < 1e-4
    assert float(jnp.abs(un1 - un2).max()) < 1e-4


def test_arap_kernel_inverted_elements():
    dx9, u9, w2, k = _data(BLOCK, seed=1, inverted=True)
    z1, un1 = arap_local_step(dx9, u9, w2, k, interpret=True)
    z2, un2 = arap_local_step_reference(dx9, u9, w2, k)
    assert float(jnp.abs(z1 - z2).max()) < 1e-4
    assert bool(jnp.isfinite(z1).all())


def test_arap_kernel_degenerate():
    z = jnp.zeros((9, BLOCK), jnp.float32)
    ones = jnp.ones(BLOCK, jnp.float32)
    out_z, out_u = arap_local_step(z, z, ones, ones, interpret=True)
    assert bool(jnp.isfinite(out_z).all() and jnp.isfinite(out_u).all())


def test_nh_kernel_matches_model():
    """Fused NH kernel vs the model's vmapped path: sigma* agrees everywhere;
    z agrees on elements with well-separated singular values (degenerate
    elements have an ambiguous SVD basis — both answers are valid)."""
    import jax

    from admm_elastic_tpu.models.tet import HyperElasticTet
    from admm_elastic_tpu.ops.pallas.nh_local import nh_local_step

    rng = np.random.default_rng(0)
    E = BLOCK
    F = rng.normal(size=(E, 3, 3)).astype(np.float32)
    F[: E // 3] = F[: E // 3] @ np.diag([1, 1, -1]).astype(np.float32)
    F[E // 3 : E // 3 + 10] *= 1e-4  # collapsed elements

    dx9 = jnp.asarray(F.reshape(E, 9).T)
    u9 = jnp.zeros_like(dx9)
    warm = jnp.ones((3, E), jnp.float32)
    mu = jnp.full(E, 1e5, jnp.float32)
    z9, un9, w9 = nh_local_step(dx9, u9, warm, mu, mu, mu, iters=5,
                                interpret=True)

    het = HyperElasticTet(np.zeros((E, 4), np.int32), 1e5, 1e5, 5, "nh")
    params = {"mu": mu, "lam": mu, "k": mu, "weight": jnp.ones(E)}
    Dx = jnp.asarray(np.swapaxes(F, 1, 2))
    z_ref, st = het.project(Dx, jnp.zeros_like(Dx), params,
                            {"sigma": jnp.ones((E, 3), jnp.float32)})

    zF_ref = np.asarray(jnp.swapaxes(z_ref, 1, 2))
    z_k = np.asarray(z9).T.reshape(E, 3, 3)
    svs = np.linalg.svd(F.astype(np.float64), compute_uv=False)
    gaps = np.minimum(svs[:, 0] - svs[:, 1], svs[:, 1] - svs[:, 2])
    sep = gaps > 1e-2
    assert np.abs(z_k[sep] - zF_ref[sep]).max() < 5e-3
    assert np.abs(np.asarray(w9).T - np.asarray(st["sigma"])).max() < 1e-2
    assert np.isfinite(z_k).all() and np.isfinite(np.asarray(un9)).all()
    assert np.all(np.asarray(w9) > 0)


def test_stvk_kernel_matches_model():
    from admm_elastic_tpu.models.tet import HyperElasticTet
    from admm_elastic_tpu.ops.pallas.nh_local import nh_local_step

    rng = np.random.default_rng(2)
    E = BLOCK
    F = rng.normal(size=(E, 3, 3)).astype(np.float32)
    dx9 = jnp.asarray(F.reshape(E, 9).T)
    warm = jnp.ones((3, E), jnp.float32)
    mu = jnp.full(E, 100.0, jnp.float32)
    z9, _, w9 = nh_local_step(dx9, jnp.zeros_like(dx9), warm, mu, mu, mu,
                              iters=5, interpret=True, model="stvk")

    het = HyperElasticTet(np.zeros((E, 4), np.int32), 100.0, 100.0, 5, "stvk")
    params = {"mu": mu, "lam": mu, "k": mu, "weight": jnp.ones(E)}
    Dx = jnp.asarray(np.swapaxes(F, 1, 2))
    z_ref, st = het.project(Dx, jnp.zeros_like(Dx), params,
                            {"sigma": jnp.ones((E, 3), jnp.float32)})
    zF_ref = np.asarray(jnp.swapaxes(z_ref, 1, 2))
    z_k = np.asarray(z9).T.reshape(E, 3, 3)
    svs = np.linalg.svd(F.astype(np.float64), compute_uv=False)
    gaps = np.minimum(svs[:, 0] - svs[:, 1], svs[:, 1] - svs[:, 2])
    sep = gaps > 1e-2
    assert np.abs(z_k[sep] - zF_ref[sep]).max() < 5e-3
    assert np.abs(np.asarray(w9).T - np.asarray(st["sigma"])).max() < 5e-3


def test_pallas_backend_end_to_end_matches_xla():
    """Full System stepping with backend='pallas' (interpreted on CPU) stays
    close to the XLA path for both ARAP and NH tets."""
    from admm_elastic_tpu import Settings, System
    from admm_elastic_tpu.geometry import make_beam_tets
    from admm_elastic_tpu.models import (
        ExplicitForce,
        HyperElasticTet,
        LinearTetStrain,
        StaticAnchor,
    )

    beam = make_beam_tets(3, 2, 2)

    def run(cls, kwargs, backend, solver="ell"):
        sys = System(Settings(timestep_s=0.04, admm_iters=6, verbose=0,
                              dtype=jnp.float32, global_solver=solver,
                              cg_fixed_iters=20))
        n = beam.n_vertices
        sys.add_nodes(beam.vertices, np.full(n, 1.0 / n))
        sys.add_force(StaticAnchor(np.flatnonzero(beam.vertices[:, 0] < 1e-9)))
        sys.add_force(cls(beam.tets, backend=backend, **kwargs))
        sys.add_explicit_force(ExplicitForce(direction=(0, -9.8, 0)))
        assert sys.initialize()
        for _ in range(4):
            sys.step()
        return sys.x

    for cls, kwargs in [
        (LinearTetStrain, dict(stiffness=1e4)),
        (HyperElasticTet, dict(mu=1e4, lam=1e4, max_iters=5, model="nh")),
    ]:
        a = run(cls, kwargs, "xla")
        b = run(cls, kwargs, "pallas")
        assert np.abs(a - b).max() < 5e-4, f"{cls.__name__} diverged"

    # the dia mode routes pallas tet forces through the fully fused
    # local+RHS kernels (fused_local_rhs); must agree with the xla path too
    for cls, kwargs in [
        (HyperElasticTet, dict(mu=1e4, lam=1e4, max_iters=5, model="nh")),
        (LinearTetStrain, dict(stiffness=1e4)),
    ]:
        a = run(cls, kwargs, "xla", solver="dia")
        b = run(cls, kwargs, "pallas", solver="dia")
        assert np.abs(a - b).max() < 5e-4, (
            f"fused local+RHS kernel diverged for {cls.__name__}"
        )


def test_nh_kernel_lam_ne_mu():
    """Regression for the missing +lam*inv^2 Hessian diagonal term: with
    lam != mu (ordinary Poisson ratios, e.g. lam = 4 mu) the kernel's
    Newton must converge to the same sigma* as the validated closed-form
    model path (models/tet.py:nh_grad_hess)."""
    from admm_elastic_tpu.models.tet import HyperElasticTet
    from admm_elastic_tpu.ops.pallas.nh_local import nh_local_step

    rng = np.random.default_rng(7)
    E = BLOCK
    F = rng.normal(size=(E, 3, 3)).astype(np.float32)
    F[: E // 4] = F[: E // 4] @ np.diag([1, 1, -1]).astype(np.float32)

    mu_v, lam_v = 1e4, 4e4
    dx9 = jnp.asarray(F.reshape(E, 9).T)
    warm = jnp.ones((3, E), jnp.float32)
    mu = jnp.full(E, mu_v, jnp.float32)
    lam = jnp.full(E, lam_v, jnp.float32)
    k = jnp.full(E, mu_v, jnp.float32)  # k = min(mu, lam)
    z9, _, w9 = nh_local_step(dx9, jnp.zeros_like(dx9), warm, mu, lam, k,
                              iters=5, interpret=True)

    het = HyperElasticTet(np.zeros((E, 4), np.int32), mu_v, lam_v, 5, "nh")
    params = {"mu": mu, "lam": lam, "k": k, "weight": jnp.ones(E)}
    Dx = jnp.asarray(np.swapaxes(F, 1, 2))
    _, st = het.project(Dx, jnp.zeros_like(Dx), params,
                        {"sigma": jnp.ones((E, 3), jnp.float32)})
    err = np.abs(np.asarray(w9).T - np.asarray(st["sigma"])).max()
    assert err < 1e-2, f"sigma* mismatch {err} with lam=4mu"


def test_tri_kernel_matches_model():
    """Fused triangle-strain kernel vs the vmapped XLA path: z agrees on
    elements with separated singular values; strain limiting included."""
    from admm_elastic_tpu.models.triangle import LimitedTriangleStrain

    rng = np.random.default_rng(3)
    E = BLOCK
    faces = np.zeros((E, 3), np.int32)
    F = rng.normal(size=(E, 3, 2)).astype(np.float32)
    F[: E // 8] *= 1e-5  # collapsed
    Dx = jnp.asarray(np.swapaxes(F, 1, 2))  # canonical (E,2,3)

    def run(backend):
        f = LimitedTriangleStrain(faces, 100.0, 0.95, 1.05, backend=backend)
        params = {
            "weight": jnp.full(E, 2.0, jnp.float32),
            "k": jnp.full(E, 3.0, jnp.float32),
            "limit_min": jnp.full(E, 0.95, jnp.float32),
            "limit_max": jnp.full(E, 1.05, jnp.float32),
            "indices": jnp.asarray(faces),
            "coeff": jnp.zeros((E, 2, 3), jnp.float32),
        }
        z, _ = f.project(Dx, jnp.zeros_like(Dx), params, {})
        return np.asarray(z)

    z_k = run("pallas")
    z_x = run("xla")
    svs = np.linalg.svd(F.astype(np.float64), compute_uv=False)
    sep = (svs[:, 0] - svs[:, 1]) > 1e-2
    assert np.abs(z_k[sep] - z_x[sep]).max() < 5e-3
    assert np.isfinite(z_k).all()


def test_tri_fused_contrib_matches_unfused():
    """The in-kernel selector apply + RHS contribution of the fused cloth
    kernel reproduces compute_Dx + rhs_contribution on a real mesh."""
    import jax

    from admm_elastic_tpu.geometry import make_sym_plane
    from admm_elastic_tpu.models.triangle import (
        LimitedTriangleStrain,
        build_tri_basis,
    )

    mesh = make_sym_plane(8, 6)
    E = len(mesh.faces)
    f = LimitedTriangleStrain(mesh.faces, 100.0, 0.95, 1.05,
                              backend="pallas")
    params, state = f.build(mesh.vertices, np.full(mesh.n_vertices, 1.0), 0.04)
    params = {k: jnp.asarray(np.asarray(v), jnp.float64)
              if np.asarray(v).dtype.kind == "f" else jnp.asarray(v)
              for k, v in params.items()}
    rng = np.random.default_rng(1)
    x = jnp.asarray(mesh.vertices + 0.1 * rng.normal(size=(mesh.n_vertices, 3)))
    u = jnp.asarray(rng.normal(size=(6, f._padded_E())) * 0.05)

    z6, u6, _, flat = f.fused_local_rhs(params, x, u, state, with_z=True)
    assert flat.shape == (E * 3, 6)

    # unfused reference: Dx planes + kernel-free projection + contributions
    Dx = f.compute_Dx(params, x)
    z_ref, u_ref, _ = f.project_with_dual(Dx, u, params, state)
    np.testing.assert_allclose(np.asarray(z6), np.asarray(z_ref), atol=1e-8)
    np.testing.assert_allclose(np.asarray(u6), np.asarray(u_ref), atol=1e-8)
    czu = f.rhs_contribution(params, z_ref, u_ref)
    np.testing.assert_allclose(np.asarray(flat[:, :3]), np.asarray(czu),
                               atol=1e-8)
    cz6 = f.rhs_contribution6(params, z_ref, u_ref)
    np.testing.assert_allclose(np.asarray(flat), np.asarray(cz6), atol=1e-8)
