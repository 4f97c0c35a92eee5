"""Checkpoint / resume.

The reference has no checkpoint-restart (SURVEY.md section 5 — run()
state lives in memory only); this is a new capability of the rebuild.
A checkpoint captures everything run() needs to continue a simulation:
the forest (cells), the solution triplet, and the time-stepping state.

Format: a single .npz (host arrays only — portable across backends and
device counts).
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np


def save_checkpoint(path: str, sim, state) -> None:
    """Write the full restartable state of a driver.Simulation."""
    meta = dict(
        time=sim.time, timestep=sim.timestep,
        timestep_number=sim.timestep_number,
        old_timestep=sim.old_timestep,
        old_old_timestep=sim.old_old_timestep,
        min_cell_diameter=sim.min_cell_diameter,
        constant_k=sim.constant_k, alpha_eps=sim.alpha_eps,
        output_counter=sim.output_counter,
        # Sneddon refinement-cycle countdown (driver.run) — carried so
        # a resumed run continues the remaining cycles
        refinement_cycle=getattr(sim, "refinement_cycle", None),
        refinement_cycles_left=getattr(sim, "refinement_cycles_left",
                                       None),
    )
    st = sim.statistics
    stats = dict(columns=st.columns, data=st.data, formats=st.formats,
                 n_rows=st.n_rows)
    np.savez_compressed(
        path,
        meta=json.dumps(meta),
        statistics=json.dumps(stats),
        forest_root=sim.forest.root,
        forest_level=sim.forest.level,
        forest_anchor=sim.forest.anchor,
        u=np.asarray(state.u),
        phi=np.asarray(state.phi),
        u_old=np.asarray(state.u_old),
        phi_old=np.asarray(state.phi_old),
        phi_oold=np.asarray(state.phi_oold),
    )


def load_checkpoint(path: str, params, verbose: bool = False):
    """Reconstruct (Simulation, SolutionState) from a checkpoint.

    The coarse mesh is rebuilt from the parameters (deterministic), the
    forest cells are restored verbatim, and the System is re-set-up for
    the restored mesh.
    """
    from .driver import Simulation, SolutionState

    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["meta"]))

    sim = Simulation(params.replace(n_global_pre_refine=0),
                     verbose=verbose)
    sim.forest.root = data["forest_root"]
    sim.forest.level = data["forest_level"]
    sim.forest.anchor = data["forest_anchor"]
    sim.mesh = sim.forest.extract()
    sim.min_cell_diameter = meta["min_cell_diameter"]
    sim.constant_k = meta["constant_k"]
    sim.alpha_eps = meta["alpha_eps"]
    sim.setup_system()
    sim.sys.constant_k = sim.constant_k
    sim.sys.alpha_eps = sim.alpha_eps
    sim.time = meta["time"]
    sim.timestep = meta["timestep"]
    sim.timestep_number = meta["timestep_number"]
    sim.old_timestep = meta["old_timestep"]
    sim.old_old_timestep = meta["old_old_timestep"]
    sim.output_counter = meta.get("output_counter", -1)
    sim.refinement_cycle = meta.get("refinement_cycle", None)
    sim.refinement_cycles_left = meta.get("refinement_cycles_left", None)
    if "statistics" in data:
        # restore the statistics table so the per-step rewrite
        # (cracks.cc:4469-4475 semantics) keeps the pre-checkpoint rows
        st = json.loads(str(data["statistics"]))
        sim.statistics.columns = list(st["columns"])
        sim.statistics.data = {k: list(v) for k, v in st["data"].items()}
        sim.statistics.formats = {k: tuple(v)
                                  for k, v in st["formats"].items()}
        sim.statistics.n_rows = st["n_rows"]

    state = SolutionState(
        u=jnp.asarray(data["u"]), phi=jnp.asarray(data["phi"]),
        u_old=jnp.asarray(data["u_old"]),
        phi_old=jnp.asarray(data["phi_old"]),
        phi_oold=jnp.asarray(data["phi_oold"]))
    assert state.phi.shape[0] == sim.mesh.n_vertices, (
        "checkpoint mesh does not match restored forest")
    return sim, state
