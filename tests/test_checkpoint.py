"""Checkpoint/resume round trip (a new capability — the reference keeps
run() state in memory only, SURVEY.md section 5)."""

import numpy as np

from cracks_tpu.checkpoint import load_checkpoint, save_checkpoint
from cracks_tpu.config import load_parameters
from cracks_tpu.driver import Simulation
import os
from tests import regression


def test_checkpoint_roundtrip(tmp_path):
    p = load_parameters(os.path.join(regression.PRM_DIR, "sneddon_2d_1.prm"),
                        output_dir="", max_no_timesteps=1)
    sim = Simulation(p, verbose=False)
    state = sim.run()
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, sim, state)

    sim2, state2 = load_checkpoint(path, p)
    assert sim2.mesh.n_dofs == sim.mesh.n_dofs
    assert sim2.time == sim.time
    assert sim2.timestep_number == sim.timestep_number
    assert np.array_equal(np.asarray(state2.phi), np.asarray(state.phi))
    assert np.array_equal(np.asarray(state2.u), np.asarray(state.u))

    # resuming must reproduce the uninterrupted run's next step: run a
    # full sim to step 2, and separately continue the checkpoint by one
    # step, comparing energies
    p_full = p.replace(max_no_timesteps=2)
    sim_full = Simulation(p_full, verbose=False)
    sim_full.run()

    from cracks_tpu import qoi
    sim2.p = sim2.p.replace(max_no_timesteps=2)
    # drive one more step manually through the same machinery
    from cracks_tpu.solvers.newton import newton_active_set
    state2.phi_oold = state2.phi_old
    state2.phi_old = state2.phi
    state2.u_old = state2.u
    sim2.old_old_timestep = sim2.old_timestep
    sim2.old_timestep = sim2.timestep
    sim2.time += sim2.timestep
    sim2.use_old_timestep_pf = False
    sim2._set_context()
    newton_active_set(sim2.sys, state2, sim2.time, verbose=False)
    sim2.project_back_phase_field(state2)

    bulk2, crack2 = qoi.compute_energy(
        sim2.mesh, sim2._u_mat(state2), np.asarray(state2.phi),
        sim2.sys.lam_cells, sim2.sys.mu_cells,
        sim2.constant_k, sim2.alpha_eps, p.G_c)
    bulk_full = sim_full.statistics.data["Bulk Energy"][-1]
    assert abs(bulk2 - bulk_full) < 1e-12 * max(1.0, abs(bulk_full)) + 1e-14
