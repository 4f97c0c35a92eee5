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
    # crack growth at steps 7-8 triggers refinement to 1155/1347 dofs;
    # the softening values are path-sensitive like miehe_shear_2
    compare_statistics(
        sim.statistics.write_text(), "threepoint_1.mpirun=2.statistics",
        col_overrides={"Energy": (1e-3, 2e-3), "Load": (1e-6, 2e-3)})
