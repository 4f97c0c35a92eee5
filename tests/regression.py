"""Shared helpers for golden-statistics regression tests.

The comparison mirrors the reference's numdiff invocation
(tests/run_test.sh:13: numdiff -a 1e-6 -r 1e-8): two numeric fields are
equal if the absolute difference <= atol OR the relative difference
<= rtol."""

import os

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
PRM_DIR = os.path.join(REPO_ROOT, "params", "tests")
PARAMS_DIR = os.path.join(REPO_ROOT, "params")
MESH_DIR = os.path.join(REPO_ROOT, "meshes")


def parse_statistics(text: str):
    """Parse a statistics table into (column names, rows of floats)."""
    names = []
    rows = []
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        if line.startswith("#"):
            names.append(line.split(":", 1)[1].strip())
        else:
            rows.append([float(x) if x != '""' else np.nan
                         for x in line.split()])
    return names, np.array(rows)


def load_golden(name: str):
    with open(os.path.join(GOLDEN_DIR, name)) as f:
        return parse_statistics(f.read())


def compare_statistics(ours: str, golden_name: str, atol=1e-6, rtol=1e-8,
                       col_overrides: dict | None = None,
                       softening_from: int | None = None,
                       softening_overrides: dict | None = None):
    """numdiff-style comparison of our statistics table against a golden
    file.  col_overrides maps column-name substrings to (atol, rtol)
    pairs for quantities where a from-scratch rebuild legitimately
    differs beyond the reference's own noise floor (documented per test).

    softening_from/softening_overrides add PHASE-AWARE tolerances: rows
    >= softening_from (the softening branch, where the non-convex
    energy amplifies solver round-off to measured 1e-3..1e-2-level
    intra-implementation scatter — scripts/scatter_*.json) use
    softening_overrides, while the pre-peak rows keep the tight
    col_overrides.  This keeps the loose bound confined to the rows
    whose measured scatter requires it."""
    g_names, g_rows = load_golden(golden_name)
    o_names, o_rows = parse_statistics(ours)
    assert o_names[: len(g_names)] == g_names, (
        f"column mismatch: {o_names} vs {g_names}")
    assert o_rows.shape[0] == g_rows.shape[0], (
        f"row count {o_rows.shape[0]} != golden {g_rows.shape[0]}")
    failures = []
    for j, name in enumerate(g_names):
        a, r = atol, rtol
        if col_overrides:
            for key, (ka, kr) in col_overrides.items():
                if key in name:
                    a, r = ka, kr
        a_soft, r_soft = a, r
        if softening_overrides:
            for key, (ka, kr) in softening_overrides.items():
                if key in name:
                    a_soft, r_soft = ka, kr
        for i in range(g_rows.shape[0]):
            gv, ov = g_rows[i, j], o_rows[i, j]
            if np.isnan(gv) and np.isnan(ov):
                continue
            diff = abs(gv - ov)
            rel = diff / max(abs(gv), abs(ov), 1e-300)
            ai, ri = ((a_soft, r_soft)
                      if softening_from is not None and i >= softening_from
                      else (a, r))
            if diff > ai and rel > ri:
                failures.append(
                    f"row {i} col '{name}': ours {ov!r} vs golden {gv!r} "
                    f"(abs {diff:.3e}, rel {rel:.3e})")
    assert not failures, "statistics mismatch:\n" + "\n".join(failures)
