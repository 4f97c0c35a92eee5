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


def test_cod_array_file_and_middle_value(sneddon_run):
    """cod-NN.txt (compute_cod_array, cracks.cc:3339-3449) is written
    next to cod-NNb.txt at Sneddon stationarity; COD at x=0 from the
    line-integral sweep pins the reference's 0.00296695
    (tests/sneddon_2d_1.output cod table, 453 DoFs)."""
    import glob
    import os

    sim, _ = sneddon_run
    out = sim.p.output_dir
    files = sorted(glob.glob(os.path.join(out, "cod-??.txt")))
    assert files, "cod-NN.txt was not written at stationarity"
    data = np.loadtxt(files[0])
    assert data.shape[1] == 3
    xs, exact = data[:, 0], data[:, 2]
    np.testing.assert_allclose(
        exact, 1.92e-3 * np.sqrt(np.maximum(0.0, 1.0 - xs ** 2)),
        atol=1e-15)
    # the paired b-sweep carries the exact line-integral COD; at x=0 it
    # must reproduce the golden table value on the 453-DoF mesh
    bfile = files[0].replace(".txt", "b.txt")
    assert os.path.exists(bfile), "cod-NNb.txt pair missing"
    sweep = np.loadtxt(bfile)
    at0 = sweep[np.isclose(sweep[:, 0], 0.0)]
    assert len(at0) == 1
    assert at0[0, 1] == pytest.approx(0.00296695, abs=1e-8)


def test_final_mesh_refined(sneddon_run):
    sim, _ = sneddon_run
    # after the stationarity-triggered refinement cycle:
    # DoFs: 518 solid + 259 phase = 777 (tests/sneddon_2d_1.output:107)
    assert sim.mesh.n_dofs == 777
