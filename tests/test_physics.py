"""Element-kernel consistency tests: residual vs energy gradient,
JVP vs element matrices, and basic elasticity sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cracks_tpu.mesh import Forest
from cracks_tpu.meshio import rect_mesh
from cracks_tpu.ops import physics


def _setup(n=3, dim=2, seed=0):
    if dim == 2:
        forest = Forest(rect_mesh([0, 0], [1, 1], [n, n]))
    else:
        forest = Forest(rect_mesh([0, 0, 0], [1, 1, 1], [n, n, n]))
    mesh = forest.extract()
    ca = physics.build_cell_arrays(mesh, 1.5, 0.8)
    rng = np.random.default_rng(seed)
    n_v = mesh.n_vertices
    u = jnp.asarray(0.01 * rng.normal(size=n_v * dim))
    phi = jnp.asarray(np.clip(0.5 + 0.3 * rng.normal(size=n_v), 0, 1))
    phi_old = jnp.asarray(np.clip(phi + 0.05 * rng.normal(size=n_v), 0, 1))
    phi_oold = jnp.asarray(np.clip(phi_old + 0.05 * rng.normal(size=n_v), 0, 1))
    sc = physics.make_scalars(pressure=1e-3, constant_k=1e-8, alpha_eps=0.1,
                              G_c=1.0, gamma_dt=0.0, theta=2.0,
                              use_old_pf=0.0, decompose_rhs=0.0)
    return mesh, ca, u, phi, phi_old, phi_oold, sc


@pytest.mark.parametrize("with_split", [False, True])
def test_jvp_matches_element_matrices(with_split):
    """The matrix-free Jacobian action must equal the assembled element
    matrices applied to a vector (both are derivatives of the same
    residual, but computed by different code paths)."""
    mesh, ca, u, phi, phi_old, phi_oold, sc = _setup()
    dim = 2
    kw = dict(dim=dim, with_split=with_split, monolithic=False)
    jac = np.asarray(physics.element_matrices(
        u, phi, phi_old, phi_oold, ca, sc, **kw))
    rng = np.random.default_rng(1)
    du = jnp.asarray(rng.normal(size=u.shape))
    dphi = jnp.asarray(rng.normal(size=phi.shape))
    ju, jp = physics.jacobian_vector_product(
        u, phi, du, dphi, phi_old, phi_oold, ca, sc, **kw)

    # reference multiply through the element matrices
    gu = np.asarray(ca.gather_u).T   # (c, nvc*dim)
    gp = np.asarray(ca.gather_p).T   # (c, nvc)
    x_loc = np.concatenate([np.asarray(du)[gu], np.asarray(dphi)[gp]], axis=1)
    y_loc = np.einsum("cij,cj->ci", jac, x_loc)
    ju_ref = np.zeros_like(np.asarray(u))
    jp_ref = np.zeros_like(np.asarray(phi))
    nvd = gu.shape[1]
    np.add.at(ju_ref, gu, y_loc[:, :nvd])
    np.add.at(jp_ref, gp, y_loc[:, nvd:])
    assert np.allclose(np.asarray(ju), ju_ref, rtol=1e-10, atol=1e-12)
    assert np.allclose(np.asarray(jp), jp_ref, rtol=1e-10, atol=1e-12)


def test_jacobian_diagonal_matches_element_matrices():
    mesh, ca, u, phi, phi_old, phi_oold, sc = _setup()
    kw = dict(dim=2, with_split=False, monolithic=False)
    jac = np.asarray(physics.element_matrices(
        u, phi, phi_old, phi_oold, ca, sc, **kw))
    du, dp = physics.jacobian_diagonal(u, phi, phi_old, phi_oold, ca, sc, **kw)
    gu = np.asarray(ca.gather_u).T
    gp = np.asarray(ca.gather_p).T
    d_loc = np.einsum("cii->ci", jac)
    du_ref = np.zeros_like(np.asarray(u))
    dp_ref = np.zeros_like(np.asarray(phi))
    nvd = gu.shape[1]
    np.add.at(du_ref, gu, d_loc[:, :nvd])
    np.add.at(dp_ref, gp, d_loc[:, nvd:])
    assert np.allclose(np.asarray(du), du_ref, rtol=1e-10)
    assert np.allclose(np.asarray(dp), dp_ref, rtol=1e-10)


def test_residual_fd_consistency():
    """J dx == -(rhs(x+h dx) - rhs(x-h dx)) / 2h for the smooth case."""
    mesh, ca, u, phi, phi_old, phi_oold, sc = _setup()
    kw = dict(dim=2, with_split=False, monolithic=False)
    rng = np.random.default_rng(2)
    du = jnp.asarray(rng.normal(size=u.shape))
    dphi = jnp.asarray(rng.normal(size=phi.shape))
    ju, jp = physics.jacobian_vector_product(
        u, phi, du, dphi, phi_old, phi_oold, ca, sc, **kw)
    h = 1e-6
    rup, rpp = physics.assemble_residual(u + h * du, phi + h * dphi,
                                         phi_old, phi_oold, ca, sc, **kw)
    rum, rpm = physics.assemble_residual(u - h * du, phi - h * dphi,
                                         phi_old, phi_oold, ca, sc, **kw)
    fd_u = -(np.asarray(rup) - np.asarray(rum)) / (2 * h)
    fd_p = -(np.asarray(rpp) - np.asarray(rpm)) / (2 * h)
    assert np.allclose(np.asarray(ju), fd_u, rtol=1e-5, atol=1e-7)
    assert np.allclose(np.asarray(jp), fd_p, rtol=1e-5, atol=1e-7)


def test_block_triangular_structure():
    """Displacement rows must not couple to phase-field columns
    (pf_extra is extrapolated data, cracks.cc:2353-2366)."""
    mesh, ca, u, phi, phi_old, phi_oold, sc = _setup()
    kw = dict(dim=2, with_split=False, monolithic=False)
    dphi = jnp.asarray(np.random.default_rng(3).normal(size=phi.shape))
    ju, jp = physics.jacobian_vector_product(
        u, phi, jnp.zeros_like(u), dphi, phi_old, phi_oold, ca, sc, **kw)
    assert np.allclose(np.asarray(ju), 0.0, atol=1e-12)


def test_3d_residual_runs():
    mesh, ca, u, phi, phi_old, phi_oold, sc = _setup(n=2, dim=3)
    kw = dict(dim=3, with_split=False, monolithic=False)
    ru, rp = physics.assemble_residual(u, phi, phi_old, phi_oold, ca, sc, **kw)
    assert np.isfinite(np.asarray(ru)).all()
    assert np.isfinite(np.asarray(rp)).all()


def test_chunked_cell_sweep_equals_unchunked(monkeypatch):
    """The CELL_CHUNK-bounded element sweep (OOM guard for >=400k-cell
    meshes) must be exact."""
    import jax.numpy as jnp
    import numpy as np
    from cracks_tpu import meshio, problems
    from cracks_tpu.config import Parameters
    from cracks_tpu.mesh import Forest
    from cracks_tpu.ops import physics

    f = Forest(meshio.rect_mesh([0, 0], [1, 1]))
    f.refine_global(1)
    mesh = f.extract()
    p = Parameters(test_case="sneddon", pressure_expr="1.0e-3",
                   G_c=1.0, poisson_ratio_nu=0.2, E_modulus=1.0)
    lam, mu = problems.cell_lame_fields(p, mesh, None)
    ca = physics.build_cell_arrays(mesh, lam, mu)
    sc = physics.make_scalars(1e-3, 1e-8, 0.2, 1.0, 0.0, 1.0, 1.0, 0.0)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=mesh.n_vertices * 2) * 1e-2)
    phi = jnp.asarray(rng.uniform(0.1, 1.0, mesh.n_vertices))
    kw = dict(dim=2, with_split=True, monolithic=False)
    r_ref = physics.assemble_residual(u, phi, phi, phi, ca, sc, **kw)
    j_ref = physics.element_matrices(u, phi, phi, phi, ca, sc,
                                     cell_last=True, **kw)
    monkeypatch.setattr(physics, "CELL_CHUNK", 100)
    physics.assemble_residual._clear_cache()
    physics.element_matrices._clear_cache()
    r_chk = physics.assemble_residual(u, phi, phi, phi, ca, sc, **kw)
    j_chk = physics.element_matrices(u, phi, phi, phi, ca, sc,
                                     cell_last=True, **kw)
    physics.assemble_residual._clear_cache()
    physics.element_matrices._clear_cache()
    np.testing.assert_allclose(np.asarray(r_chk[0]), np.asarray(r_ref[0]),
                               rtol=0, atol=1e-13)
    np.testing.assert_allclose(np.asarray(r_chk[1]), np.asarray(r_ref[1]),
                               rtol=0, atol=1e-13)
    np.testing.assert_allclose(np.asarray(j_chk), np.asarray(j_ref),
                               rtol=1e-12, atol=1e-12)


def test_perm_padded_chunking(monkeypatch):
    """cell_arrays_from_core with a raster perm LONGER than the core
    cell count (seam lattices pad a phantom row, solvers/lattice.py)
    must chunk by the permuted count.  Regression: at miehe refine 8
    the phantom row pushed the raster past a chunk boundary computed
    from the unpadded count -> reshape error (BENCH miehe_shear r5)."""
    import jax.numpy as jnp
    import numpy as np
    from cracks_tpu import meshio, problems
    from cracks_tpu.config import Parameters
    from cracks_tpu.mesh import Forest
    from cracks_tpu.ops import physics

    f = Forest(meshio.rect_mesh([0, 0], [1, 1]))
    f.refine_global(3)                       # 64 cells
    mesh = f.extract()
    p = Parameters(test_case="sneddon", pressure_expr="1.0e-3",
                   G_c=1.0, poisson_ratio_nu=0.2, E_modulus=1.0)
    lam, mu = problems.cell_lame_fields(p, mesh, None)
    core = physics.build_cell_core(mesh, lam, mu)
    n_c = int(core.JxW.shape[0])
    # phantom row of 8 dead cells; CELL_CHUNK=64 so the padded raster
    # (72) needs 2 chunks while the unpadded count (64) needs none
    perm = np.concatenate([np.arange(n_c), np.full(8, -1)]).astype(
        np.int32)
    monkeypatch.setattr(physics, "CELL_CHUNK", 64)
    ca = physics.cell_arrays_from_core(core, perm=perm)
    assert ca.chunked is not None
    nch, ch = ca.chunked.JxW.shape[0], ca.chunked.JxW.shape[-1]
    assert nch * ch >= n_c + 8
    # chunk-major JxW must reproduce the permuted cell-last JxW (dead
    # cells zeroed), with zero fill in the padding tail
    jxw = np.moveaxis(np.asarray(ca.chunked.JxW), -1, 1).reshape(
        nch * ch, -1)
    ref = np.asarray(core.JxW)
    np.testing.assert_allclose(jxw[:n_c], ref, rtol=0, atol=0)
    np.testing.assert_allclose(jxw[n_c:], 0.0, rtol=0, atol=0)
