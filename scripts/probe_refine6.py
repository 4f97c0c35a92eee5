"""Phase-timed probe of the large-problem (refine-6, 1.23M DoF) path on
the TPU: prints wall-clock after every phase so the slow stage is
identifiable (host mesh build, system setup, residual compile, element
matrices compile, one full Newton solve...).

Usage: python scripts/probe_refine6.py [refine]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

T0 = time.time()


def mark(msg):
    print(f"[{time.time() - T0:8.1f}s] {msg}", flush=True)


refine = int(sys.argv[1]) if len(sys.argv) > 1 else 6

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

mark(f"jax up, devices={jax.devices()}")

from cracks_tpu.config import load_parameters  # noqa: E402

p = load_parameters(os.path.join(REPO, "params/parameters_sneddon_2d.prm"))
p = p.replace(n_global_pre_refine=refine, n_local_pre_refine=0,
              n_refinement_cycles=0, max_no_timesteps=0, output_dir="",
              linear_solver="cg", preconditioner="gmg", cg_rtol=1e-8,
              cg_maxiter=3000, dtype="float64", mixed_precision_cg=True)

from cracks_tpu.driver import Simulation  # noqa: E402

sim = Simulation(p, verbose=False)
mark(f"forest built: {sim.mesh.n_cells} cells, {sim.mesh.n_dofs} dofs")
sim.setup_system()
mark(f"system setup done (lattice={sim.sys.lattice_hierarchy is not None})")
sim.determine_mesh_dependent_parameters()
sim.sys.constant_k = sim.constant_k
sim.sys.alpha_eps = sim.alpha_eps

import numpy as np  # noqa: E402

from cracks_tpu.ops import physics  # noqa: E402
from cracks_tpu.ops.constraints import (condense_residual,  # noqa: E402
                                        hanging_transpose_p)

n_v = sim.mesh.n_vertices
state_u = jnp.zeros(n_v * 2)
from cracks_tpu import problems  # noqa: E402

u0, phi0 = problems.initial_values(p, sim.mesh, sim.min_cell_diameter)
u = jnp.asarray(u0.reshape(-1))
phi = jnp.asarray(phi0)
sim.time = p.timestep_size
sim._set_context()
sys_ = sim.sys
mark("state ready; compiling f64 residual...")
ru, rp = physics.assemble_residual(u, phi, phi, phi, sys_.ca,
                                   sys_.scalars, dim=2, with_split=False,
                                   monolithic=False)
jax.block_until_ready(ru)
mark("f64 residual compiled+ran")
t = time.time()
ru, rp = physics.assemble_residual(u, phi * 0.99, phi, phi, sys_.ca,
                                   sys_.scalars, dim=2, with_split=False,
                                   monolithic=False)
jax.block_until_ready(ru)
mark(f"f64 residual steady: {time.time() - t:.3f}s")

mark("compiling f32 element matrices (lattice raster)...")
sc32 = physics.Scalars(*(v.astype(jnp.float32) for v in sys_.scalars))
f32 = lambda x: x.astype(jnp.float32)
jacL = physics.element_matrices(
    f32(u), f32(phi), f32(phi), f32(phi), sys_.lattice_ca32, sc32,
    dim=2, with_split=False, monolithic=False, cell_last=True)
jax.block_until_ready(jacL)
mark("f32 element matrices compiled+ran")

mark("running one full PDAS Newton solve (driver path)...")
from cracks_tpu.driver import SolutionState  # noqa: E402
from cracks_tpu.solvers import newton  # noqa: E402

st = SolutionState(u=u, phi=phi, u_old=u, phi_old=phi, phi_oold=phi)
t = time.time()
newton.newton_active_set(sys_, st, sim.time, verbose=True)
mark(f"newton_active_set done in {time.time() - t:.1f}s "
     f"({st.last_log.newton_steps} its, "
     f"{st.last_log.linear_iterations} lin)")
