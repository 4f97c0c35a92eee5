"""Benchmark: wall-clock per load step, Sneddon 2d pressurized crack.

Runs the flagship workload (quasi-monolithic PDAS phase-field fracture,
matrix-free block-CG solver) on the available accelerator and prints ONE
JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference (deal.II + Trilinos, MPI) publishes no wall-clock
numbers in-repo (BASELINE.md). As a provisional anchor we use an
estimated 15 s per load step for deal.II's assembled-matrix GMRES+AMG
pipeline on the same Sneddon 2d problem at the benchmark DoF count on a
CPU socket — derived from the reference's own solver-effort counters
(3-4 Newton x 4-6 GMRES iterations per step, tests/sneddon_2d_1.output)
and typical deal.II assembly throughput (~1e5 cells/s/core for this
3x3-quadrature vector-valued kernel). vs_baseline = baseline / ours
(>1 means faster than baseline).

Environment knobs:
  BENCH_REFINE   global refinements of the 10x10 root grid (default 5
                 -> 102400 cells, 309k DoFs)
  BENCH_STEPS    timed load steps (default 2)
  BENCH_DTYPE    float64 (default) or float32
"""

import json
import os
import time

import numpy as np


def main():
    refine = int(os.environ.get("BENCH_REFINE", "5"))
    n_steps = int(os.environ.get("BENCH_STEPS", "2"))
    dtype = os.environ.get("BENCH_DTYPE", "float64")

    from cracks_tpu.config import load_parameters
    from cracks_tpu.driver import Simulation

    p = load_parameters("/root/reference/parameters_sneddon_2d.prm") \
        if os.path.exists("/root/reference/parameters_sneddon_2d.prm") else None
    if p is None:
        from cracks_tpu.config import Parameters
        p = Parameters(test_case="sneddon", pressure_expr="1.0e-3",
                       G_c=1.0, poisson_ratio_nu=0.2, E_modulus=1.0,
                       k_reg_expr="1e-8*h", eps_reg_expr="2.0*h",
                       lower_bound_newton_residual=1e-7,
                       max_no_newton_steps=50,
                       max_no_line_search_steps=10)
    p = p.replace(
        n_global_pre_refine=refine,
        n_local_pre_refine=0,
        n_refinement_cycles=0,
        max_no_timesteps=n_steps - 1,
        output_dir="",
        linear_solver="cg",
        cg_rtol=1e-8,
        cg_maxiter=4000,
        dtype=dtype,
    )

    sim = Simulation(p, verbose=False)
    t0 = time.time()
    state = sim.run()
    wall = time.time() - t0

    # the first step pays all JIT compilation; report steady-state cost
    # by timing one additional solved step explicitly
    sim2 = Simulation(p.replace(max_no_timesteps=n_steps), verbose=False)
    t0 = time.time()
    sim2.run()
    wall2 = time.time() - t0
    per_step = max(1e-9, (wall2 - wall))  # marginal cost of one more step

    n_dofs = sim.mesh.n_dofs
    bulk = sim.statistics.data["Bulk Energy"][-1]

    baseline_s_per_step = 15.0  # see module docstring
    result = {
        "metric": f"sneddon2d_{n_dofs}dofs_seconds_per_load_step",
        "value": round(per_step, 3),
        "unit": "s",
        "vs_baseline": round(baseline_s_per_step / per_step, 3),
    }
    print(json.dumps(result))
    # companion detail line on stderr for humans
    import sys
    print(f"# dofs={n_dofs} steps={n_steps} dtype={dtype} "
          f"first_run={wall:.1f}s second_run={wall2:.1f}s "
          f"bulk_energy={bulk:.6e}", file=sys.stderr)


if __name__ == "__main__":
    main()
