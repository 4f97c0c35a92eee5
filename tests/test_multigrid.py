"""Geometric multigrid: hierarchy construction, transfer operators, and
GMG-preconditioned CG correctness/iteration counts."""

import jax.numpy as jnp
import numpy as np
import pytest

from cracks_tpu.config import load_parameters
from cracks_tpu.driver import Simulation
from cracks_tpu.mesh import Forest, interpolation_stencil
from cracks_tpu.meshio import rect_mesh
import os
from tests import regression


def test_truncated_forest():
    forest = Forest(rect_mesh([0, 0], [1, 1], [2, 2]))
    forest.refine_global(2)
    flags = np.zeros(forest.n_cells, dtype=bool)
    flags[:4] = True
    forest.execute_refinement(forest.balance_flags(flags))
    t1 = forest.truncated(1)
    assert t1.level.max() == 1
    assert t1.n_cells == 16
    t0 = forest.truncated(0)
    assert t0.n_cells == 4


def test_interpolation_stencil_linear_exactness():
    fc = Forest(rect_mesh([0, 0], [1, 1], [2, 2]))
    fc.refine_global(1)
    mc = fc.extract()
    ff = Forest(rect_mesh([0, 0], [1, 1], [2, 2]))
    ff.refine_global(2)
    mf = ff.extract()
    masters, weights = interpolation_stencil(fc, mc, mf)
    f_c = 2.0 * mc.vert_coords[:, 0] - mc.vert_coords[:, 1] + 0.25
    f_f = np.einsum("fm,fm->f", weights, f_c[masters])
    expect = 2.0 * mf.vert_coords[:, 0] - mf.vert_coords[:, 1] + 0.25
    assert np.allclose(f_f, expect)


def _sneddon_sim(preconditioner, refine=2, run=True):
    p = load_parameters(os.path.join(regression.PRM_DIR, "sneddon_2d_1.prm"),
                        output_dir="", max_no_timesteps=0,
                        n_global_pre_refine=refine, n_local_pre_refine=0,
                        n_refinement_cycles=0, linear_solver="cg",
                        preconditioner=preconditioner, cg_rtol=1e-10,
                        cg_maxiter=5000)
    sim = Simulation(p, verbose=False)
    if run:
        sim.run()
    return sim


def test_gmg_matches_jacobi_result():
    s_j = _sneddon_sim("jacobi")
    s_g = _sneddon_sim("gmg")
    bj = s_j.statistics.data["Bulk Energy"][-1]
    bg = s_g.statistics.data["Bulk Energy"][-1]
    assert bg == pytest.approx(bj, rel=1e-8)


def test_gmg_beats_jacobi_on_elasticity():
    """On the undegraded operator (phi = 1) the V-cycle converges
    mesh-independently; on the degraded fracture operator the sub-cell
    crack strip defeats geometric coarse spaces (see
    solvers/multigrid.py docstring), so the comparison is made on
    elasticity."""
    import jax.numpy as jnp
    from cracks_tpu.ops import physics
    from cracks_tpu.ops.constraints import condense_residual
    from cracks_tpu.solvers import linear

    sim = _sneddon_sim("gmg", refine=3, run=False)
    sim.setup_system()
    sim.determine_mesh_dependent_parameters()
    sim.sys.constant_k = sim.constant_k
    sim.sys.alpha_eps = sim.alpha_eps
    sim.sys.set_context(time=1.0, timestep=1.0, old_timestep=1.0,
                        old_old_timestep=1.0, use_old_timestep_pf=False,
                        timestep_number=0)
    n_v = sim.mesh.n_vertices
    u = jnp.zeros(n_v * 2)
    phi1 = jnp.ones(n_v)
    sc = sim.sys.scalars
    con = sim.sys.constraints(1.0)
    active = jnp.zeros(n_v, dtype=bool)
    kw = dict(dim=2, with_split=False, monolithic=False)
    rng = np.random.default_rng(0)
    rhs_u = jnp.asarray(rng.normal(size=n_v * 2))
    rhs_u, rhs_p = condense_residual(rhs_u, jnp.zeros(n_v), con, active)
    # build the legacy rediscretized hierarchy explicitly (the driver now
    # prefers the Galerkin hierarchy, solvers/galerkin.py)
    from cracks_tpu import problems
    from cracks_tpu.solvers import multigrid
    p = sim.p

    def lam_fn(m):
        return problems.cell_lame_fields(p, m, None)

    def dirichlet_fn(m):
        mu_, _, mp_, _ = problems.dirichlet_conditions(
            p, m, 0.0, initial_step=False)
        return mu_, mp_

    hierarchy = multigrid.build_hierarchy(
        sim.forest, sim.mesh, p, lam_fn, dirichlet_fn)
    _, _, it_g = linear.solve_cg_gmg(
        u, phi1, phi1, phi1, sim.sys.ca, sc, con, active, rhs_u, rhs_p,
        hierarchy, 1e-8, 1e-300, maxiter=2000, **kw)
    dgs = physics.jacobi_diagonal_approx(u, phi1, phi1, phi1, sim.sys.ca,
                                         sc, dim=2, monolithic=False)
    _, _, it_j = linear.solve_cg_block(
        u, phi1, phi1, phi1, sim.sys.ca, sc, con, active, rhs_u, rhs_p,
        *dgs, 1e-8, 1e-300, maxiter=2000, **kw)
    assert int(it_g) < int(it_j) / 3, (int(it_g), int(it_j))
