"""Pin the bench workload configurations (bench.py _make_params).

The bench is the recorded perf artifact; its configs must keep matching
the BASELINE.json workload list and the reference prm files it claims
to run (a silently drifted bench config would invalidate the recorded
numbers)."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench  # noqa: E402


def test_sneddon_params():
    p = bench._make_params("sneddon", 6, "float64", "gmg", 2, dim=2)
    assert p.test_case == "sneddon"
    assert p.n_global_pre_refine == 6
    assert p.n_refinement_cycles == 0
    assert p.preconditioner == "gmg"
    assert p.linear_solver == "cg"
    assert p.pressure(time=1.0) == 1e-3


def test_hetero_3d_params():
    p = bench._make_params("hetero_3d", 5, "float64", "gmg", 2)
    assert p.test_case == "multiple het"
    assert p.dimension == 3
    # the reference ladder: fixed Eps reg = 0.1 needs global+local >= 8
    assert p.n_global_pre_refine + p.n_local_pre_refine >= 8
    assert p.eps_reg(0.02) == 0.1
    assert p.pressure(time=0.005) == 5.0
    assert p.mixed_precision_cg


def test_adaptive_params():
    p = bench._make_params("adaptive", 5, "float64", "gmg", 30)
    assert p.test_case == "sneddon"
    assert p.n_refinement_cycles == 1
    assert p.max_no_timesteps == 29


def test_miehe_shear_params():
    p = bench._make_params("miehe_shear", 8, "float64", "gmg", 2)
    assert p.test_case == "miehe shear"
    # the full 25-step golden trajectory, spectral split on both sides
    assert p.max_no_timesteps == 24
    assert p.decompose_stress_rhs == 1.0
    assert p.decompose_stress_matrix == 1.0
    assert p.switch_timestep == 1000
    # the reference prm asks for the direct inner solver; the bench
    # must override it to the iterative production backend
    assert p.linear_solver == "cg"
    # all cells at the level cap -> the phase-field strategy never
    # fires and the mesh stays fixed
    assert p.n_refinement_cycles == 0 and p.n_local_pre_refine == 0
