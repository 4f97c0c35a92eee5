"""Golden regression: three-point bending (gmsh import, vertex-pinned
constraints, stress split, adaptive refinement with level cap 1)."""

import pytest

from cracks_tpu.driver import run_prm

from .regression import PRM_DIR, compare_statistics
from .test_regression_adaptive import _prefix_match


def test_threepoint_prefix(tmp_path):
    sim, _ = run_prm(f"{PRM_DIR}/threepoint_1.prm", output_dir=str(tmp_path),
                     max_no_timesteps=3)
    # pre-softening rows agree to ~1e-4 relative (the golden file is
    # an mpirun=2 run; the vertex-pinned point load makes the case more
    # sensitive than the miehe tests, which match digit-for-digit)
    _prefix_match(sim, "threepoint_1.mpirun=2.statistics", 4, atol=1e-6,
                  rtol=1e-3)
    assert sim.mesh.n_dofs == 975


@pytest.mark.slow
def test_threepoint_full(tmp_path):
    sim, _ = run_prm(f"{PRM_DIR}/threepoint_1.prm", output_dir=str(tmp_path))
    # crack growth at steps 7-8 triggers refinement to 1155/1347 dofs.
    # Measured deviation vs golden (round 3): Energy <= 4.4e-7 rel /
    # 1.9e-7 abs (inside plain numdiff — no override needed), Load P11
    # 8.1e-6 rel.  The four-config solver-knob study reproduces
    # identical statistics to print precision
    # (scripts/scatter_threepoint.json), so the round-2 2e-3 overrides
    # were far looser than warranted; Load keeps a 5e-5 rel band for
    # cross-platform f64 rounding headroom.
    compare_statistics(
        sim.statistics.write_text(), "threepoint_1.mpirun=2.statistics",
        col_overrides={"Load": (1e-6, 5e-5)})
