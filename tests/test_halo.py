"""Halo-exchange sharded-DoF path (parallel/halo.py): exactness of the
distributed residual and the block-triangular CG against the
single-device (replicated) formulation on the 8-virtual-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cracks_tpu import meshio, problems
from cracks_tpu.config import Parameters
from cracks_tpu.mesh import Forest
from cracks_tpu.ops import physics
from cracks_tpu.ops.constraints import make_constraints, condense_residual
from cracks_tpu.parallel import halo


def _setup(refine=2):
    f = Forest(meshio.rect_mesh([-10, -10], [10, 10]))
    f.refine_global(refine)
    mesh = f.extract()
    p = Parameters(test_case="sneddon", pressure_expr="1.0e-3", G_c=1.0,
                   poisson_ratio_nu=0.2, E_modulus=1.0)
    lam, mu = problems.cell_lame_fields(p, mesh, None)
    ca = physics.build_cell_arrays(mesh, lam, mu)
    sc = physics.make_scalars(
        pressure=1e-3, constant_k=1e-8, alpha_eps=1.0, G_c=1.0,
        gamma_dt=0.0, theta=1.0, use_old_pf=1.0, decompose_rhs=0.0)
    h = mesh.min_cell_diameter
    u0, phi0 = problems.initial_values(p, mesh, h)
    return mesh, lam, mu, ca, sc, u0.reshape(-1), phi0


def _dev_mesh(n=8):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip("needs the 8-device virtual mesh")
    return jax.sharding.Mesh(np.array(devs[:n]), (halo.AXIS,))


def test_partition_covers_everything():
    mesh, lam, mu, *_ = _setup()
    part = halo.build_halo_partition(mesh, lam, mu, 8)
    l2g = np.asarray(part.arrays.loc2glob)
    mask = np.asarray(part.arrays.own_mask_p)
    owned = l2g[mask]
    # every global vertex owned exactly once
    assert sorted(owned.tolist()) == list(range(mesh.n_vertices))
    # ghosts + owned cover each shard's cells
    for s in range(part.n_shards):
        local_verts = set(l2g[s][l2g[s] < mesh.n_vertices].tolist())
        gp = np.asarray(part.arrays.ca.gather_p[s])
        used = set(np.asarray(part.arrays.loc2glob[s])[
            np.unique(gp[gp < part.n_loc - 1])].tolist())
        assert used <= local_verts


def test_halo_residual_matches_replicated():
    mesh, lam, mu, ca, sc, u0, phi0 = _setup()
    dmesh = _dev_mesh()
    part = halo.build_halo_partition(mesh, lam, mu, 8)
    part = halo.device_put_partition(part, dmesh)

    rng = np.random.default_rng(0)
    u = u0 + rng.normal(size=u0.shape) * 1e-3
    phi = np.clip(phi0 + rng.normal(size=phi0.shape) * 1e-3, 0, 1)

    ru_ref, rp_ref = physics.assemble_residual(
        jnp.asarray(u), jnp.asarray(phi), jnp.asarray(phi0),
        jnp.asarray(phi0), ca, sc, dim=2, with_split=False,
        monolithic=False)

    fn = halo.halo_residual_fn(dmesh, part, with_split=False,
                               monolithic=False)
    ru_l, rp_l = fn(jnp.asarray(halo.global_to_local_u(part, u)),
                    jnp.asarray(halo.global_to_local_p(part, phi)),
                    jnp.asarray(halo.global_to_local_p(part, phi0)),
                    jnp.asarray(halo.global_to_local_p(part, phi0)), sc)
    ru = halo.local_to_global_u(part, np.asarray(ru_l))
    rp = halo.local_to_global_p(part, np.asarray(rp_l))
    np.testing.assert_allclose(ru, np.asarray(ru_ref), rtol=0, atol=1e-11)
    np.testing.assert_allclose(rp, np.asarray(rp_ref), rtol=0, atol=1e-11)


@pytest.mark.slow  # golden-grade (~1-5 min); default suite wall-clock budget (VERDICT r3 #8)
def test_halo_cg_matches_single_device():
    mesh, lam, mu, ca, sc, u0, phi0 = _setup()
    dmesh = _dev_mesh()
    part = halo.build_halo_partition(mesh, lam, mu, 8)
    part = halo.device_put_partition(part, dmesh)

    p = Parameters(test_case="sneddon", pressure_expr="1.0e-3", G_c=1.0,
                   poisson_ratio_nu=0.2, E_modulus=1.0)
    mask_u, _, mask_p, _ = problems.dirichlet_conditions(
        p, mesh, 0.0, initial_step=False)
    con = make_constraints(mesh, mask_u, mask_p)
    active = jnp.zeros(mesh.n_vertices, dtype=bool)

    u = jnp.asarray(u0)
    phi = jnp.asarray(phi0)
    pold = jnp.asarray(phi0)
    ru, rp = physics.assemble_residual(
        u, phi, pold, pold, ca, sc, dim=2, with_split=False,
        monolithic=False)
    rhs_u, rhs_p = condense_residual(ru, rp, con, active)

    # reference solution: single-device matrix-free Jacobi block-CG
    from cracks_tpu.solvers import linear
    diag_u, diag_p = physics.jacobi_diagonal_approx(
        u, phi, pold, pold, ca, sc, dim=2, monolithic=False)
    du_ref, dp_ref, _ = linear.solve_cg_block_chunked(
        u, phi, pold, pold, ca, sc, con, active, rhs_u, rhs_p,
        diag_u, diag_p, 1e-12, 1e-300, dim=2, with_split=False,
        monolithic=False, maxiter=2000, chunk=500)

    # halo solve: same free-space reduction expressed as local masks
    free_u = ~(np.asarray(con.dirichlet_u) | np.asarray(con.hang_mask_u))
    free_p = ~(np.asarray(con.dirichlet_p) | np.asarray(con.hang_mask_p)
               | np.asarray(active))
    fu_l = halo.global_to_local_u(part, free_u.astype(float)) > 0.5
    fp_l = halo.global_to_local_p(part, free_p.astype(float)) > 0.5
    solve = halo.halo_jacobi_cg_fn(dmesh, part, with_split=False,
                                   monolithic=False, maxiter=2000)
    du_l, dp_l, iters, rr = solve(
        jnp.asarray(halo.global_to_local_u(part, np.asarray(u))),
        jnp.asarray(halo.global_to_local_p(part, np.asarray(phi))),
        jnp.asarray(halo.global_to_local_p(part, np.asarray(pold))),
        jnp.asarray(halo.global_to_local_p(part, np.asarray(pold))),
        sc,
        jnp.asarray(halo.global_to_local_u(part, np.asarray(rhs_u))),
        jnp.asarray(halo.global_to_local_p(part, np.asarray(rhs_p))),
        jnp.asarray(fu_l), jnp.asarray(fp_l), 1e-12)
    assert int(iters) > 0
    du = halo.local_to_global_u(part, np.asarray(du_l))
    dp = halo.local_to_global_p(part, np.asarray(dp_l))

    scale_u = np.abs(np.asarray(du_ref)).max()
    scale_p = np.abs(np.asarray(dp_ref)).max()
    np.testing.assert_allclose(du, np.asarray(du_ref), rtol=0,
                               atol=1e-6 * scale_u)
    np.testing.assert_allclose(dp, np.asarray(dp_ref), rtol=0,
                               atol=1e-6 * scale_p)


def test_halo_residual_matches_replicated_3d():
    """The halo machinery is dimension-agnostic: 3d octree partition
    with face/edge/corner ghosts must reproduce the replicated
    residual."""
    f = Forest(meshio.rect_mesh([-10, -10, -10], [10, 10, 10]))
    f.refine_global(1)
    mesh = f.extract()
    dmesh = _dev_mesh()
    p = Parameters(test_case="sneddon", dimension=3,
                   pressure_expr="1.0e-3", G_c=1.0,
                   poisson_ratio_nu=0.2, E_modulus=1.0)
    lam, mu = problems.cell_lame_fields(p, mesh, None)
    ca = physics.build_cell_arrays(mesh, lam, mu)
    sc = physics.make_scalars(
        pressure=1e-3, constant_k=1e-8, alpha_eps=2.5, G_c=1.0,
        gamma_dt=0.0, theta=1.0, use_old_pf=1.0, decompose_rhs=0.0)
    part = halo.build_halo_partition(mesh, lam, mu, 8)
    part = halo.device_put_partition(part, dmesh)

    rng = np.random.default_rng(1)
    u = rng.normal(size=mesh.n_vertices * 3) * 1e-3
    phi = rng.uniform(0.2, 1.0, mesh.n_vertices)
    ru_ref, rp_ref = physics.assemble_residual(
        jnp.asarray(u), jnp.asarray(phi), jnp.asarray(phi),
        jnp.asarray(phi), ca, sc, dim=3, with_split=False,
        monolithic=False)

    fn = halo.halo_residual_fn(dmesh, part, with_split=False,
                               monolithic=False)
    ru_l, rp_l = fn(jnp.asarray(halo.global_to_local_u(part, u)),
                    jnp.asarray(halo.global_to_local_p(part, phi)),
                    jnp.asarray(halo.global_to_local_p(part, phi)),
                    jnp.asarray(halo.global_to_local_p(part, phi)), sc)
    ru = halo.local_to_global_u(part, np.asarray(ru_l))
    rp = halo.local_to_global_p(part, np.asarray(rp_l))
    np.testing.assert_allclose(ru, np.asarray(ru_ref), rtol=0, atol=1e-11)
    np.testing.assert_allclose(rp, np.asarray(rp_ref), rtol=0, atol=1e-11)
