"""Geometric multigrid: hierarchy construction, transfer operators, and
GMG-preconditioned CG correctness/iteration counts."""

import jax.numpy as jnp
import numpy as np
import pytest

from cracks_tpu.config import load_parameters
from cracks_tpu.driver import Simulation
from cracks_tpu.mesh import Forest, interpolation_stencil
from cracks_tpu.meshio import rect_mesh


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


def _sneddon_sim(preconditioner, refine=3):
    p = load_parameters("/root/reference/tests/sneddon_2d_1.prm",
                        output_dir="", max_no_timesteps=0,
                        n_global_pre_refine=refine, n_local_pre_refine=0,
                        n_refinement_cycles=0, linear_solver="cg",
                        preconditioner=preconditioner, cg_rtol=1e-10)
    sim = Simulation(p, verbose=False)
    sim.run()
    return sim


def test_gmg_matches_jacobi_result():
    s_j = _sneddon_sim("jacobi")
    s_g = _sneddon_sim("gmg")
    bj = s_j.statistics.data["Bulk Energy"][-1]
    bg = s_g.statistics.data["Bulk Energy"][-1]
    assert bg == pytest.approx(bj, rel=1e-8)


def test_gmg_reduces_iteration_count():
    s_j = _sneddon_sim("jacobi", refine=4)
    s_g = _sneddon_sim("gmg", refine=4)
    it_j = s_j._last_state.last_log.linear_iterations
    it_g = s_g._last_state.last_log.linear_iterations
    assert it_g < it_j / 3, (it_g, it_j)
