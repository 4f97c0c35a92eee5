"""Golden regression: Sneddon 2d pressurized crack
(reference tests/sneddon_2d_1 — the minimum end-to-end slice)."""

import numpy as np
import pytest

from cracks_tpu.driver import run_prm

from .regression import PRM_DIR, compare_statistics


@pytest.fixture(scope="module")
def sneddon_run(tmp_path_factory):
    out = tmp_path_factory.mktemp("sneddon_out")
    sim, state = run_prm(f"{PRM_DIR}/sneddon_2d_1.prm",
                         output_dir=str(out))
    return sim, state


def test_statistics_match_golden(sneddon_run):
    sim, _ = sneddon_run
    compare_statistics(sim.statistics.write_text(), "sneddon_2d_1.statistics")


def test_tcv_and_l2_error(sneddon_run):
    sim, _ = sneddon_run
    # TCV 0.0418879 and phi_L2_error 0.978645 (tests/sneddon_2d_1.output:95,100)
    tcv = sim.statistics.data["TCV"][-1]
    assert tcv == pytest.approx(0.0418879, abs=1e-6)
    l2 = sim.statistics.data["phi_L2_error"][-1]
    assert l2 == pytest.approx(0.978645, abs=1e-5)


def test_final_mesh_refined(sneddon_run):
    sim, _ = sneddon_run
    # after the stationarity-triggered refinement cycle:
    # DoFs: 518 solid + 259 phase = 777 (tests/sneddon_2d_1.output:107)
    assert sim.mesh.n_dofs == 777
