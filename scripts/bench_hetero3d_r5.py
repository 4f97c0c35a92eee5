"""Record the hetero-3d production-scale bench artifact (round 5).

Single run, BENCH_CASE=hetero_3d parameterization (bench._make_params),
refine 5 + local 5 (~258k DoFs after the predictor-corrector settles).
Reports per-step wall times and the steady per-step cost = mean over
steps on the FINAL mesh excluding that epoch's first step (which
carries the epoch's XLA compiles); epoch-compile steps are listed
separately rather than averaged in, because a production trajectory
amortizes each epoch over many steps while this 3-step probe cannot.

Writes scripts/bench_hetero3d_r5.json.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench
from cracks_tpu.driver import Simulation

refine = int(os.environ.get("BENCH_REFINE", "5"))
nsteps = int(os.environ.get("BENCH_STEPS", "3"))
p = bench._make_params("hetero_3d", refine, "float64", "gmg", nsteps)
sim = Simulation(p, verbose=False)
t0 = time.time()
sim.run()
wall = time.time() - t0
n_dofs = sim.mesh.n_dofs
steps = [(int(d), round(t, 2)) for (_n, d, t) in sim.step_times]
final = [t for (d, t) in steps if d == n_dofs]
steady = final[1:] if len(final) > 1 else final
per_step = sum(steady) / len(steady)
baseline = 15.0 * (n_dofs / 3.0e5)
out = {
    "metric": f"hetero3d_{n_dofs}dofs_seconds_per_load_step",
    "value": round(per_step, 3),
    "unit": "s",
    "vs_baseline": round(baseline / per_step, 3),
    "wall_s": round(wall, 1),
    "n_dofs": n_dofs,
    "step_times": steps,
    "steady_steps_counted": len(steady),
    "bulk_energy": float(sim.statistics.data["Bulk Energy"][-1]),
    "crack_energy": float(sim.statistics.data["Crack Energy"][-1]),
}
with open(os.path.join(REPO, "scripts", "bench_hetero3d_r5.json"),
          "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
