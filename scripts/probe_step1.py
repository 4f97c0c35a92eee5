"""Reproduce the refine-6 step-1 u-pass zero-progress failure with
CRACKS_TPU_DEBUG_SOLVE diagnostics.  Runs 2 load steps at the given
refine level, verbose Newton trace + per-pass solve debug.

Usage: python scripts/probe_step1.py [refine]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("CRACKS_TPU_DEBUG_SOLVE", "1")

T0 = time.time()


def mark(msg):
    print(f"[{time.time() - T0:8.1f}s] {msg}", flush=True)


refine = int(sys.argv[1]) if len(sys.argv) > 1 else 6

import jax  # noqa: E402

mark(f"jax up {jax.devices()}")

sys.path.insert(0, REPO)
import bench  # noqa: E402
from cracks_tpu.driver import Simulation  # noqa: E402

p = bench._make_params(refine, "float64", "gmg", 2)
p = p.replace(max_no_newton_steps=int(
    os.environ.get("PROBE_MAX_NEWTON", "12")))
mark("Simulation()")
sim = Simulation(p, verbose=True)
t0 = time.time()
sim.run()
mark(f"run done in {time.time() - t0:.1f}s dofs={sim.mesh.n_dofs}")
print(f"bulk={sim.statistics.data['Bulk Energy'][-1]:.6e}")
