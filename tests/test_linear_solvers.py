"""Linear-solver consistency: direct (sparse LU) vs matrix-free CG, and
constraint-chain resolution when active-set dofs are hanging masters."""

import jax.numpy as jnp
import numpy as np
import pytest

from cracks_tpu.mesh import Forest
from cracks_tpu.meshio import rect_mesh
from cracks_tpu.ops import physics
from cracks_tpu.ops.constraints import (condense_residual, make_constraints)
from cracks_tpu.solvers import linear


def _setup_hanging_problem():
    """A refined-patch mesh with hanging nodes; the active set includes
    hanging masters (the configuration that exposed the constraint-chain
    bug in the direct path)."""
    forest = Forest(rect_mesh([0, 0], [1, 1], [4, 4]))
    mesh = forest.extract()
    flags = np.zeros(forest.n_cells, dtype=bool)
    centers = mesh.cell_coords.mean(1)
    flags[(centers[:, 0] > 0.5) & (centers[:, 1] > 0.5)] = True
    mesh, _, _ = forest.refine_and_transfer(flags, mesh, [np.zeros(mesh.n_vertices)])
    assert len(mesh.hang_child) > 0

    n_v = mesh.n_vertices
    ca = physics.build_cell_arrays(mesh, 1.5, 0.8)
    rng = np.random.default_rng(0)
    u = jnp.asarray(1e-2 * rng.normal(size=n_v * 2))
    phi = jnp.asarray(np.clip(0.6 + 0.3 * rng.normal(size=n_v), 0, 1))
    phi_old = jnp.asarray(np.clip(np.asarray(phi) + 0.05 * rng.normal(size=n_v), 0, 1))
    sc = physics.make_scalars(pressure=1e-3, constant_k=1e-8, alpha_eps=0.3,
                              G_c=1.0, gamma_dt=0.0, theta=2.0,
                              use_old_pf=0.0, decompose_rhs=1.0)
    mask_u = np.zeros((n_v, 2), dtype=bool)
    for b in range(4):
        mask_u[mesh.boundary_vertices[b]] = True
    con = make_constraints(mesh, mask_u, np.zeros(n_v, dtype=bool))
    # make some hanging masters active
    active = np.zeros(n_v, dtype=bool)
    masters = np.unique(mesh.hang_masters)
    active[masters[: max(1, len(masters) // 2)]] = True
    active[mesh.hang_child] = False
    active = jnp.asarray(active)
    return mesh, ca, con, active, u, phi, phi_old, sc


@pytest.mark.parametrize("with_split", [False, True])
def test_direct_update_satisfies_hanging_constraints(with_split):
    mesh, ca, con, active, u, phi, phi_old, sc = _setup_hanging_problem()
    kw = dict(dim=2, with_split=with_split, monolithic=False)
    ru, rp = physics.assemble_residual(u, phi, phi_old, phi_old, ca, sc, **kw)
    rhs_u, rhs_p = condense_residual(ru, rp, con, active)
    du, dp, _ = linear.solve_direct(u, phi, phi_old, phi_old, ca, sc, con,
                                    active, rhs_u, rhs_p, **kw)
    # hanging children must interpolate from masters; constrained masters
    # contribute zero (chain resolution, AffineConstraints::close())
    du_np = np.asarray(du).reshape(-1, 2)
    dp_np = np.asarray(dp)
    dir_u = np.asarray(con.dirichlet_u).reshape(-1, 2)
    act = np.asarray(active)
    m = mesh.hang_masters
    w = mesh.hang_weights
    mu_vals = du_np[m] * (~dir_u[m]).astype(float)
    expect_u = np.einsum("hm,hmd->hd", w, mu_vals)
    assert np.allclose(du_np[mesh.hang_child], expect_u, atol=1e-12)
    mp_vals = dp_np[m] * (~act[m]).astype(float)
    expect_p = np.einsum("hm,hm->h", w, mp_vals)
    assert np.allclose(dp_np[mesh.hang_child], expect_p, atol=1e-12)
    # constrained dofs must carry zero update
    assert np.allclose(du_np[dir_u], 0.0)
    assert np.allclose(dp_np[act], 0.0)


def test_direct_matches_cg():
    mesh, ca, con, active, u, phi, phi_old, sc = _setup_hanging_problem()
    kw = dict(dim=2, with_split=True, monolithic=False)
    ru, rp = physics.assemble_residual(u, phi, phi_old, phi_old, ca, sc, **kw)
    rhs_u, rhs_p = condense_residual(ru, rp, con, active)
    du_d, dp_d, _ = linear.solve_direct(u, phi, phi_old, phi_old, ca, sc, con,
                                        active, rhs_u, rhs_p, **kw)
    diag_u, diag_p = physics.jacobian_diagonal(u, phi, phi_old, phi_old, ca, sc, **kw)
    du_c, dp_c, iters = linear.solve_cg_block(
        u, phi, phi_old, phi_old, ca, sc, con, active, rhs_u, rhs_p,
        diag_u, diag_p, 1e-14, 1e-300, maxiter=5000, **kw)
    assert np.allclose(np.asarray(du_d), np.asarray(du_c), rtol=1e-7, atol=1e-11)
    assert np.allclose(np.asarray(dp_d), np.asarray(dp_c), rtol=1e-7, atol=1e-11)
