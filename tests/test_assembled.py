"""Stored-element-matrix Krylov paths vs the exact direct solver.

The assembled operator (solvers/assembled.py) and the Galerkin GMG
preconditioner (solvers/galerkin.py) must reproduce the direct-solver
solution of the same Newton systems — same physics, same constraints —
on a real fracture step (Sneddon pressurized crack, active set
nonempty).  Reference behavior: solve(), cracks.cc:2744-2777."""

import jax.numpy as jnp
import numpy as np
import pytest

from cracks_tpu.config import load_parameters
from cracks_tpu.driver import Simulation


def _run(precond, linear_solver, mixed=False, refine=3):
    p = load_parameters(
        "params/parameters_sneddon_2d.prm",
        n_global_pre_refine=refine, n_local_pre_refine=0,
        n_refinement_cycles=0, max_no_timesteps=0, output_dir="",
        linear_solver=linear_solver, preconditioner=precond,
        cg_rtol=1e-10, cg_maxiter=3000, dtype="float64",
        mixed_precision_cg=mixed)
    sim = Simulation(p, verbose=False)
    state = sim.run()
    return sim, state


@pytest.fixture(scope="module")
def direct_result():
    sim, state = _run("jacobi", "direct")
    return (float(sim.statistics.data["Bulk Energy"][-1]),
            np.asarray(state.u), np.asarray(state.phi))


@pytest.mark.parametrize("precond,mixed", [
    ("jacobi", False), ("jacobi", True),
    ("gmg", False), ("gmg", True),
])
def test_assembled_cg_matches_direct(direct_result, precond, mixed):
    bulk_d, u_d, phi_d = direct_result
    sim, state = _run(precond, "cg", mixed=mixed)
    bulk = float(sim.statistics.data["Bulk Energy"][-1])
    assert abs(bulk - bulk_d) <= 1e-9 * max(1.0, abs(bulk_d))
    # mixed precision may settle a (non-unique) active-set boundary dof
    # differently; the field tolerance reflects that, the energy above
    # stays tight
    tol = 1e-5 if mixed else 1e-7
    assert np.max(np.abs(np.asarray(state.u) - u_d)) < tol
    assert np.max(np.abs(np.asarray(state.phi) - phi_d)) < tol


def test_galerkin_hierarchy_exists():
    """The uniformly refined Sneddon mesh must get a coefficient-exact
    multilevel hierarchy: the tensor-grid lattice path when detected
    (solvers/lattice.py), else the generic Galerkin element-RAP one."""
    sim, _ = _run("gmg", "cg")
    if sim.sys.lattice_hierarchy is not None:
        assert sim.sys.lattice_hierarchy.n_levels >= 2
    else:
        assert sim.sys.galerkin_hierarchy is not None
        assert len(sim.sys.galerkin_hierarchy.levels) >= 1


def test_gmg_iterations_beat_jacobi():
    """The coefficient-exact Galerkin V-cycle must cut the Krylov
    iteration count substantially on the fracture operator (the round-1
    geometric V-cycle could not — solvers/multigrid.py docstring)."""
    sim_j, state_j = _run("jacobi", "cg")
    sim_g, state_g = _run("gmg", "cg")
    it_j = state_j.last_log.linear_iterations
    it_g = state_g.last_log.linear_iterations
    assert it_g * 4 < it_j, (it_g, it_j)
