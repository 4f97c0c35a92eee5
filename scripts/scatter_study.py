"""Solver-knob scatter study for the softening-branch tolerance
overrides (the analogue of the study already documented in
tests/test_regression_adaptive.py:44-57).

The reference's np1/np2 golden pair agrees to numdiff -a 1e-6 -r 1e-8
(tests/run_test.sh:13) because both runs use the SAME solver.  Across
*different but equally converged* solver configurations the non-convex
softening branch is path-sensitive; the honest tolerance for a
cross-implementation comparison is the measured intra-implementation
scatter across benign solver knobs.  This script measures that scatter
for miehe_shear_2 and hetero_3d_1: it runs each workload under several
solver configurations (CG tolerance, preconditioner, mixed precision,
direct solver) and reports the max relative spread per statistics
column, split into the pre-peak and softening phases.

Usage:  python scripts/scatter_study.py [shear2|hetero3d] ...
Writes results to scripts/scatter_<case>.json.
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from cracks_tpu.driver import run_prm  # noqa: E402
from regression import PRM_DIR, parse_statistics  # noqa: E402


CONFIGS = {
    "A-cg8-gmg-mixed": dict(linear_solver="cg", preconditioner="gmg",
                            cg_rtol=1e-8, mixed_precision_cg=True),
    "B-cg10-gmg-f64": dict(linear_solver="cg", preconditioner="gmg",
                           cg_rtol=1e-10, mixed_precision_cg=False),
    "C-cg8-jacobi": dict(linear_solver="cg", preconditioner="jacobi",
                         cg_rtol=1e-8, mixed_precision_cg=True),
    "D-direct": dict(linear_solver="direct"),
}

CASES = {
    "shear2": ("miehe_shear_2.prm", dict(), 19),   # softening from row 19
    "hetero3d": ("hetero_3d_1.prm", dict(), 1),    # softening-ish row 1+
    "threepoint": ("threepoint_1.prm", dict(), 7),  # crack grows at 7-8
    # the adaptive tension case: softening rows 27-32 carry the widest
    # overrides in test_regression_adaptive.py — measure their honest
    # intra-implementation scatter (VERDICT r3 weak #2 / next #7)
    "tension_adaptive": ("miehe_tension_adaptive_1.prm", dict(), 27),
}


def run_case(case):
    prm, overrides, split_row = CASES[case]
    rows_by_cfg = {}
    names = None
    for tag, cfg in CONFIGS.items():
        out = f"/tmp/scatter/{case}-{tag}"
        os.makedirs(out, exist_ok=True)
        try:
            sim, _ = run_prm(os.path.join(PRM_DIR, prm), output_dir=out,
                             **{**overrides, **cfg})
        except Exception as e:  # noqa: BLE001
            print(f"{case} {tag}: FAILED {type(e).__name__}: {e}")
            continue
        names, rows = parse_statistics(sim.statistics.write_text())
        rows_by_cfg[tag] = rows
        print(f"{case} {tag}: {rows.shape[0]} rows")
    tags = list(rows_by_cfg)
    base = rows_by_cfg[tags[0]]
    nrow = min(r.shape[0] for r in rows_by_cfg.values())
    result = {"case": case, "configs": tags, "columns": names,
              "split_row": split_row, "scatter": {}}
    for j, name in enumerate(names):
        col = np.stack([rows_by_cfg[t][:nrow, j] for t in tags])
        spread = col.max(0) - col.min(0)
        rel = spread / np.maximum(np.abs(col).max(0), 1e-300)
        result["scatter"][name] = {
            "pre_peak_max_rel": float(rel[:split_row].max()),
            "softening_max_rel": float(rel[split_row:].max())
            if nrow > split_row else None,
            "max_abs": float(spread.max()),
        }
        print(f"  {name}: pre-peak rel {rel[:split_row].max():.2e}  "
              f"softening rel "
              f"{rel[split_row:].max() if nrow > split_row else 0:.2e}")
    path = os.path.join(REPO, "scripts", f"scatter_{case}.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    for case in (sys.argv[1:] or ["shear2", "hetero3d"]):
        run_case(case)
