"""Benchmark: wall-clock per load step, Sneddon 2d pressurized crack.

Runs the flagship workload (quasi-monolithic PDAS phase-field fracture,
matrix-free block-CG solver, float64 outer / float32 Krylov) on the available accelerator and
prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference (deal.II + Trilinos, MPI) publishes no wall-clock
numbers in-repo (BASELINE.md). As a provisional anchor we use an
estimated 15 s per load step for deal.II's assembled-matrix GMRES+AMG
pipeline on the same Sneddon 2d problem at ~300k DoFs on one CPU socket
— derived from the reference's own solver-effort counters (3-4 Newton x
4-6 GMRES its per step, tests/sneddon_2d_1.output) and typical deal.II
assembly throughput (~1e5 cells/s/core for this 3x3-quadrature
vector-valued kernel), scaled linearly in DoFs.

Environment knobs:
  BENCH_REFINE   global refinements of the root grid (default 6 in 2d
                 -> 409600 cells, 1.23M DoFs — the BASELINE.json
                 north-star size; refine 5 = 309k DoFs; the retry
                 ladder falls back one refinement on worker failure)
  BENCH_DIM      2 (default) or 3: 3d runs the Sneddon penny crack on
                 the octree lattice path (11^3 roots, refine 2 ->
                 85,184 cells, 364k DoFs by default)
  BENCH_STEPS    timed load steps (default 2)
  BENCH_DTYPE    float64 (default) or float32
  BENCH_PRECOND  gmg (default) or jacobi
"""

import json
import os
import subprocess
import sys
import time


def _wait_for_device(max_wait_s: float = 1200.0):
    """Block until a JAX backend answers a device query (subprocess
    probe — a hung tunnel blocks jax.devices() indefinitely inside this
    process, a child can be killed).  The shared TPU worker restarts
    take minutes; starting the bench against a dead tunnel wastes the
    whole attempt ladder.  Proceeds anyway after max_wait_s."""
    deadline = time.time() + max_wait_s
    # honor a JAX_PLATFORMS override through jax.config — the env var
    # alone does not displace an installed TPU plugin
    probe = ("import os, jax; p = os.environ.get('JAX_PLATFORMS'); "
             "p and jax.config.update('jax_platforms', p); "
             "d = jax.devices(); print(d[0].platform, len(d))")
    while True:
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, timeout=120)
            if r.returncode == 0:
                print(f"# device probe: {r.stdout.decode().strip()}",
                      file=sys.stderr)
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            print("# device probe: no backend after "
                  f"{max_wait_s:.0f}s, proceeding", file=sys.stderr)
            return
        print("# device probe: backend unresponsive, retrying...",
              file=sys.stderr)
        time.sleep(60)


def _make_params(refine, dtype, precond, n_steps, dim=2):
    from cracks_tpu.config import Parameters, load_parameters
    name = ("parameters_sneddon_2d.prm" if dim == 2
            else "parameters_sneddon_3d.prm")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "params", name)
    if os.path.exists(path):
        p = load_parameters(path)
    else:
        p = Parameters(test_case="sneddon", pressure_expr="1.0e-3",
                       G_c=1.0, poisson_ratio_nu=0.2, E_modulus=1.0,
                       k_reg_expr="1e-8*h", eps_reg_expr="2.0*h",
                       lower_bound_newton_residual=1e-7,
                       max_no_newton_steps=50,
                       max_no_line_search_steps=10, dimension=dim)
    return p.replace(
        n_global_pre_refine=refine, n_local_pre_refine=0,
        n_refinement_cycles=0, max_no_timesteps=n_steps - 1,
        output_dir="", linear_solver="cg", preconditioner=precond,
        cg_rtol=1e-8, cg_maxiter=3000, dtype=dtype,
        mixed_precision_cg=(os.environ.get("BENCH_MIXED", "1") == "1"))


def _run_once(refine, dtype, precond, n_steps, dim):
    from cracks_tpu.driver import Simulation

    # warmup run (1 step): pays all JIT compilation (persistently cached)
    p1 = _make_params(refine, dtype, precond, 1, dim)
    sim = Simulation(p1, verbose=False)
    t0 = time.time()
    sim.run()
    warm = time.time() - t0
    n_dofs = sim.mesh.n_dofs

    # timed run: compiles come from the cache, so wall/steps is the
    # steady-state per-step cost (including mesh/setup amortized)
    p2 = _make_params(refine, dtype, precond, n_steps, dim)
    sim2 = Simulation(p2, verbose=False)
    t0 = time.time()
    sim2.run()
    wall = time.time() - t0
    bulk = sim2.statistics.data["Bulk Energy"][-1]
    return n_dofs, warm, wall, bulk


def main():
    dim = int(os.environ.get("BENCH_DIM", "2"))
    refine = int(os.environ.get("BENCH_REFINE", "6" if dim == 2 else "2"))
    n_steps = int(os.environ.get("BENCH_STEPS", "2"))
    dtype = os.environ.get("BENCH_DTYPE", "float64")
    precond = os.environ.get("BENCH_PRECOND", "gmg")
    if dim == 3 and "CRACKS_TPU_SNEDDON_REPS" not in os.environ:
        # 11^3 roots x refine 2 = 85,184 cells, 364k DoFs (>= 300k)
        os.environ["CRACKS_TPU_SNEDDON_REPS"] = "11"
    if os.environ.get("BENCH_WAIT_DEVICE", "1") == "1":
        _wait_for_device()

    # the shared TPU worker occasionally crashes/restarts under
    # sustained load; retry, then fall back to a smaller problem
    attempts = [(refine, 0), (refine, 120), (max(refine - 1, 2), 120)]
    last_err = None
    for r, pause in attempts:
        if pause:
            time.sleep(pause)
        try:
            n_dofs, warm, wall, bulk = _run_once(r, dtype, precond,
                                                 n_steps, dim)
            break
        except Exception as e:  # worker crash -> retry / shrink
            last_err = e
            msg = str(e).split("\n")[0][:300]
            print(f"# attempt refine={r} failed: {type(e).__name__}: {msg}",
                  file=sys.stderr)
    else:
        raise last_err
    per_step = wall / n_steps

    baseline_s_per_step = 15.0 * (n_dofs / 3.0e5)  # see module docstring
    result = {
        "metric": f"sneddon{dim}d_{n_dofs}dofs_seconds_per_load_step",
        "value": round(per_step, 3),
        "unit": "s",
        "vs_baseline": round(baseline_s_per_step / per_step, 3),
    }
    print(json.dumps(result))
    print(f"# dim={dim} dofs={n_dofs} steps={n_steps} dtype={dtype} "
          f"precond={precond} warmup={warm:.1f}s timed={wall:.1f}s "
          f"bulk_energy={bulk:.6e}", file=sys.stderr)


if __name__ == "__main__":
    main()
