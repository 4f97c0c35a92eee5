"""Operator-reuse parity for the PDAS-tail caches.

Round-5 perf work caches active-set-independent operator data across
Newton iterations: the Galerkin RAP chain + u-block level spectra in
both the fused solve (galerkin.solve_newton_system, reuse bundle) and
the split-dispatch solve (galerkin.solve_split, keyed on the jac32
identity).  The f64 Newton operator is always exact (re-linearized per
call), so reuse may only change preconditioner quality — never the
converged physics beyond solver tolerance.  These tests pin that
contract on the hetero-3d golden miniature (hanging nodes + bitmap
material, the workload the caches were built for; reference
cracks.cc:2477-2497 rebuilds its AMG per assembly, so parity here is a
capability the rebuild must not buy with accuracy).

The caches are gated to production sizes (multigrid.sharp_spectrum);
CRACKS_TPU_REUSE=1/0 forces them on/off at golden size.
"""

import numpy as np
import pytest

from cracks_tpu.driver import run_prm

from .regression import PRM_DIR


def _energies(sim):
    d = sim.statistics.data
    return np.array([d["Bulk Energy"], d["Crack Energy"]], float)


def _run(tmp_path, tag, **over):
    sim, _ = run_prm(f"{PRM_DIR}/hetero_3d_1.prm",
                     output_dir=str(tmp_path / tag),
                     max_no_timesteps=1, linear_solver="cg",
                     preconditioner="gmg", mixed_precision_cg=True,
                     **over)
    return sim


def test_fused_reuse_parity(tmp_path, monkeypatch):
    """Fused-path reuse (sharp gate forced on via CRACKS_TPU_REUSE)
    reproduces the no-reuse statistics to solver tolerance."""
    monkeypatch.setenv("CRACKS_TPU_REUSE", "0")
    e0 = _energies(_run(tmp_path, "off"))
    monkeypatch.setenv("CRACKS_TPU_REUSE", "1")
    sim1 = _run(tmp_path, "on")
    e1 = _energies(sim1)
    assert sim1.sys.galerkin_hierarchy is not None
    # reuse engaged at least once across the PDAS tail
    assert getattr(sim1.sys, "_fused_cache_g", None) is not None
    np.testing.assert_allclose(e1, e0, rtol=1e-6, atol=1e-14)


def test_split_reuse_parity(tmp_path, monkeypatch):
    """Split-dispatch path (forced at golden size): the u-level/RAP
    cache keyed on jac32 identity reproduces the cache-disabled
    statistics to solver tolerance."""
    from cracks_tpu.solvers import lattice

    monkeypatch.setattr(lattice, "FUSED_SOLVE_MAX_DOFS", 0)
    monkeypatch.setenv("CRACKS_TPU_REUSE", "0")
    e0 = _energies(_run(tmp_path, "s_off"))
    monkeypatch.delenv("CRACKS_TPU_REUSE")
    sim1 = _run(tmp_path, "s_on")
    e1 = _energies(sim1)
    assert getattr(sim1.sys, "_split_levels_cache_g", None) is not None
    np.testing.assert_allclose(e1, e0, rtol=1e-6, atol=1e-14)
