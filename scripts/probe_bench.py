"""Full bench flow with phase markers (find where refine-6 hangs)."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
T0 = time.time()


def mark(msg):
    print(f"[{time.time() - T0:8.1f}s] {msg}", flush=True)


refine = int(sys.argv[1]) if len(sys.argv) > 1 else 6
os.environ.setdefault("BENCH_REFINE", str(refine))

import jax  # noqa: E402

mark(f"jax up {jax.devices()}")

sys.path.insert(0, REPO)
import bench  # noqa: E402
from cracks_tpu.driver import Simulation  # noqa: E402

import cracks_tpu.driver as drv  # noqa: E402

# instrument the timestep loop with marks
orig_run = drv.Simulation.run
orig_setup = drv.Simulation.setup_system


def setup_mark(self):
    mark("setup_system begin")
    orig_setup(self)
    mark("setup_system end")


drv.Simulation.setup_system = setup_mark

p1 = bench._make_params(refine, "float64", "gmg", 1)
mark("warmup Simulation()")
sim = Simulation(p1, verbose=True)
mark("warmup run()")
t0 = time.time()
sim.run()
mark(f"warmup done in {time.time() - t0:.1f}s dofs={sim.mesh.n_dofs}")

p2 = bench._make_params(refine, "float64", "gmg", 2)
mark("timed Simulation()")
sim2 = Simulation(p2, verbose=True)
mark("timed run()")
t0 = time.time()
sim2.run()
wall = time.time() - t0
mark(f"timed run done in {wall:.1f}s -> {wall/2:.1f} s/step")
print(f"bulk={sim2.statistics.data['Bulk Energy'][-1]:.6e}")
