"""Record the miehe-shear crack-growth trajectory bench (round 5).

BENCH_CASE=miehe_shear parameterization: the FULL 25-step golden
load-displacement trajectory (tests/miehe_shear_2.statistics scaled
up) on a fixed uniformly refined unit_slit mesh.

The shared TPU worker dies stochastically under sustained load (a
blocked client then hangs forever), so the trajectory runs under the
framework's own checkpoint/resume: every step snapshots
(checkpoint_every=1), each attempt is a subprocess with a hard
timeout, and a wedged attempt resumes from the rolling snapshot —
exactly the elastic-training pattern the checkpoint subsystem was
built for (driver.py run(), checkpoint.py).  Per-step wall times are
merged across attempts from the CRACKS_TPU_STEP_LOG heartbeats; each
attempt's first two steps carry that process's XLA compiles and are
excluded from the steady mean (listed separately in the artifact).

Writes scripts/bench_miehe_r5_refine<N>.json.
"""
import json
import os
import re
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHILD = r"""
import os, sys, time
sys.path.insert(0, %(repo)r)
import bench
from cracks_tpu.driver import Simulation
p = bench._make_params("miehe_shear", %(refine)d, "float64", "gmg", 25)
p = p.replace(checkpoint_every=1, output_dir=%(outdir)r,
              write_vtu=False)
ck = os.path.join(%(outdir)r, "checkpoint.npz")
resume = None
if os.path.exists(ck):
    from cracks_tpu.checkpoint import load_checkpoint
    sim, resume = load_checkpoint(ck, p, verbose=True)
else:
    sim = Simulation(p, verbose=False)
sim.run(resume_state=resume)
print("# CHILD DONE")
"""


def wait_device():
    for _ in range(12):
        try:
            r = subprocess.run(
                [sys.executable, os.path.join(REPO, "scripts",
                                              "tpu_poll.py")],
                timeout=120, capture_output=True)
            if b"ALIVE" in r.stdout:
                return
        except subprocess.TimeoutExpired:
            pass
        time.sleep(40)


def main():
    refine = int(os.environ.get("BENCH_REFINE", "8"))
    outdir = os.environ.get("BENCH_OUTDIR",
                            f"/tmp/miehe_traj_r5_ref{refine}")
    attempt_timeout = int(os.environ.get("BENCH_ATTEMPT_TIMEOUT",
                                         "1800"))
    if os.environ.get("BENCH_FRESH", "1") == "1" and \
            os.path.isdir(outdir):
        shutil.rmtree(outdir)
    os.makedirs(outdir, exist_ok=True)
    child_src = CHILD % dict(repo=REPO, refine=refine, outdir=outdir)

    walls = {}          # step -> wall seconds (first attempt to run it)
    compile_steps = set()  # steps paying a fresh process's compiles
    attempts = 0
    t0 = time.time()
    done = False
    for attempt in range(8):
        attempts += 1
        env = dict(os.environ, CRACKS_TPU_STEP_LOG="1")
        try:
            r = subprocess.run([sys.executable, "-u", "-c", child_src],
                               env=env, timeout=attempt_timeout,
                               stdout=subprocess.PIPE,
                               stderr=subprocess.STDOUT)
            out = r.stdout.decode()
        except subprocess.TimeoutExpired as e:
            out = (e.stdout or b"").decode()
        steps_this = []
        for m in re.finditer(r"# step (\d+) time=\S+ dofs=(\d+) "
                             r"wall=([0-9.]+)s", out):
            s, dofs, w = int(m.group(1)), int(m.group(2)), \
                float(m.group(3))
            steps_this.append(s)
            walls.setdefault(s, w)
        compile_steps.update(steps_this[:2])
        print(f"# attempt {attempt}: steps {steps_this[:1]}..."
              f"{steps_this[-1:]} ({len(steps_this)})", flush=True)
        if "# CHILD DONE" in out:
            done = True
            break
        wait_device()
    wall = time.time() - t0

    stats_path = os.path.join(outdir, "statistics")
    loads, bulk, crack, n_dofs = [], None, None, 0
    with open(stats_path) as f:
        cols = {}
        for line in f:
            if line.startswith("#"):
                m = re.match(r"# (\d+): (.*)", line.strip())
                if m:      # TableHandler headers are 1-based
                    cols[m.group(2).strip()] = int(m.group(1)) - 1
                continue
            parts = line.split()
            if not parts:
                continue
            loads.append(float(parts[cols["Load x"]]))
            bulk = float(parts[cols["Bulk Energy"]])
            crack = float(parts[cols["Crack Energy"]])
            n_dofs = int(parts[cols["DoFs"]])

    steady = [w for s, w in sorted(walls.items())
              if s >= 5 and s not in compile_steps]
    per_step = sum(steady) / max(len(steady), 1)
    baseline = 15.0 * (n_dofs / 3.0e5)
    pre = [w for s, w in sorted(walls.items())
           if 5 <= s < 13 and s not in compile_steps]
    soft = [w for s, w in sorted(walls.items())
            if s >= 13 and s not in compile_steps]
    out = {
        "metric": (f"miehe_shear2_traj_{n_dofs}dofs_"
                   f"seconds_per_load_step"),
        "value": round(per_step, 3),
        "unit": "s",
        "vs_baseline": round(baseline / per_step, 3),
        "wall_s": round(wall, 1),
        "n_dofs": n_dofs,
        "refine": refine,
        "completed": done,
        "attempts": attempts,
        "n_steps_timed": len(walls),
        "steady_steps_counted": len(steady),
        "step_times": {str(s): walls[s] for s in sorted(walls)},
        "compile_steps_excluded": sorted(compile_steps),
        "pre_peak_mean_s": round(sum(pre) / max(len(pre), 1), 2),
        "softening_mean_s": round(sum(soft) / max(len(soft), 1), 2),
        "load_x": [round(v, 3) for v in loads],
        "load_x_peak": round(max(loads), 3) if loads else None,
        "bulk_energy": bulk,
        "crack_energy": crack,
    }
    path = os.path.join(REPO, "scripts",
                        f"bench_miehe_r5_refine{refine}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("metric", "value", "vs_baseline", "wall_s",
                       "completed", "attempts", "load_x_peak")}))


if __name__ == "__main__":
    main()
