"""Smoke tests for workload families not covered by golden regressions:
multiple interacting cracks (homo/het 2d), the penalized-monolithic
outer solver, and VTU output."""

import os

import numpy as np
import pytest

from cracks_tpu.config import load_parameters
from cracks_tpu.driver import Simulation, run_prm
from tests import regression


def test_multiple_homo_short(tmp_path):
    p = load_parameters(os.path.join(regression.PARAMS_DIR, "parameters_homo_multiple_cracks.prm"),
                        output_dir=str(tmp_path), max_no_timesteps=1,
                        n_global_pre_refine=3, n_refinement_cycles=0)
    sim = Simulation(p, verbose=False)
    state = sim.run()
    bulk = sim.statistics.data["Bulk Energy"]
    assert len(bulk) >= 1
    assert all(np.isfinite(b) and b >= 0 for b in bulk)
    # the two initial cracks must be present: phi == 0 somewhere
    assert float(np.asarray(state.phi).min()) == pytest.approx(0.0, abs=1e-12)


def test_multiple_het_2d_short(tmp_path):
    p = load_parameters(os.path.join(regression.PARAMS_DIR, "parameters_hetero_multiple_cracks.prm"),
                        output_dir=str(tmp_path), max_no_timesteps=1,
                        n_global_pre_refine=3, n_local_pre_refine=0,
                        n_refinement_cycles=0)
    sim = Simulation(p, verbose=False)
    state = sim.run()
    # heterogeneous stiffness: per-cell lambda must actually vary
    assert np.std(sim.sys.lam_cells) > 0
    assert np.isfinite(sim.statistics.data["Bulk Energy"][-1])


def test_simple_monolithic_sneddon(tmp_path):
    # the penalized-monolithic outer solver (cracks.cc:2997-3107) on a
    # small Sneddon problem
    p = load_parameters(os.path.join(regression.PRM_DIR, "sneddon_2d_1.prm"),
                        output_dir=str(tmp_path), max_no_timesteps=1,
                        n_local_pre_refine=0, n_refinement_cycles=0,
                        outer_solver="simple monolithic", gamma_penal=100.0)
    sim = Simulation(p, verbose=False)
    state = sim.run()
    assert np.isfinite(sim.statistics.data["Bulk Energy"][-1])
    # irreversibility penalization keeps phi in bounds after projection
    phi = np.asarray(state.phi)
    assert phi.min() >= 0.0 and phi.max() <= 1.0


def test_vtu_output(tmp_path):
    p = load_parameters(os.path.join(regression.PRM_DIR, "sneddon_2d_1.prm"),
                        output_dir=str(tmp_path), max_no_timesteps=0,
                        n_local_pre_refine=0, n_refinement_cycles=0,
                        write_vtu=True)
    sim = Simulation(p, verbose=False)
    sim.run()
    vtus = [f for f in os.listdir(tmp_path) if f.endswith(".vtu")]
    assert len(vtus) >= 1
    assert os.path.exists(os.path.join(tmp_path, "solution.pvd"))
    text = open(os.path.join(tmp_path, sorted(vtus)[0])).read()
    assert "phasefield" in text and "displacement" in text
    assert os.path.exists(os.path.join(tmp_path, "statistics"))
    assert os.path.exists(os.path.join(tmp_path, "parameters.prm"))


def test_mix_refinement_strategy():
    """The 'mix' strategy (phase-field flags + Kelly-style indicator +
    fixed-fraction 0.3, cracks.cc:4043-4103) produces sensible flags on
    the Sneddon 3d configuration that ships with it."""
    from cracks_tpu.config import load_parameters
    p = load_parameters(os.path.join(regression.PRM_DIR, "sneddon_3d_1.prm"),
                        output_dir="", max_no_timesteps=0,
                        n_global_pre_refine=0, n_refinement_cycles=0)
    sim = Simulation(p, verbose=False)
    state = sim.run()
    flags = sim._refine_flags(state)
    # phase-field criterion flags the crack, Kelly adds ~30% of cells
    assert 0 < flags.sum() <= 0.5 * len(flags)
