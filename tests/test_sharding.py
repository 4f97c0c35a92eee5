"""Multi-chip SPMD tests on the 8-device virtual CPU mesh (conftest sets
xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cracks_tpu.mesh import Forest
from cracks_tpu.meshio import rect_mesh
from cracks_tpu.ops import physics
from cracks_tpu.parallel import sharding
import os
from tests import regression


@pytest.fixture(scope="module")
def problem():
    forest = Forest(rect_mesh([0, 0], [1, 1], [5, 5]))
    forest.refine_global(1)
    mesh = forest.extract()
    ca = physics.build_cell_arrays(mesh, 1.5, 0.8)
    rng = np.random.default_rng(0)
    n_v = mesh.n_vertices
    u = jnp.asarray(0.01 * rng.normal(size=n_v * 2))
    phi = jnp.asarray(np.clip(0.5 + 0.3 * rng.normal(size=n_v), 0, 1))
    phi_old = phi
    phi_oold = phi
    sc = physics.make_scalars(pressure=1e-3, constant_k=1e-8, alpha_eps=0.2,
                              G_c=1.0, gamma_dt=0.0, theta=2.0,
                              use_old_pf=0.0, decompose_rhs=0.0)
    return mesh, ca, u, phi, phi_old, phi_oold, sc


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_residual_matches_single_device(problem):
    mesh, ca, u, phi, phi_old, phi_oold, sc = problem
    kw = dict(dim=2, with_split=False, monolithic=False)
    ru0, rp0 = physics.assemble_residual(u, phi, phi_old, phi_oold, ca, sc, **kw)

    dmesh = sharding.make_device_mesh()
    ca_sh = sharding.shard_cell_arrays(ca, dmesh)
    fn = sharding.sharded_residual_fn(dmesh, **kw)
    ru, rp = jax.jit(fn)(u, phi, phi_old, phi_oold, ca_sh, sc)
    assert np.allclose(np.asarray(ru), np.asarray(ru0), rtol=1e-12, atol=1e-14)
    assert np.allclose(np.asarray(rp), np.asarray(rp0), rtol=1e-12, atol=1e-14)


def test_sharded_jvp_matches_single_device(problem):
    mesh, ca, u, phi, phi_old, phi_oold, sc = problem
    kw = dict(dim=2, with_split=True, monolithic=False)
    rng = np.random.default_rng(1)
    du = jnp.asarray(rng.normal(size=u.shape))
    dphi = jnp.asarray(rng.normal(size=phi.shape))
    ju0, jp0 = physics.jacobian_vector_product(
        u, phi, du, dphi, phi_old, phi_oold, ca, sc, **kw)

    dmesh = sharding.make_device_mesh()
    ca_sh = sharding.shard_cell_arrays(ca, dmesh)
    jv = sharding.sharded_jvp_fn(dmesh, **kw)
    ju, jp = jax.jit(jv)(u, phi, du, dphi, phi_old, phi_oold, ca_sh, sc)
    assert np.allclose(np.asarray(ju), np.asarray(ju0), rtol=1e-10, atol=1e-12)
    assert np.allclose(np.asarray(jp), np.asarray(jp0), rtol=1e-10, atol=1e-12)


def test_padding_preserves_result(problem):
    mesh, ca, u, phi, phi_old, phi_oold, sc = problem
    kw = dict(dim=2, with_split=False, monolithic=False)
    ru0, rp0 = physics.assemble_residual(u, phi, phi_old, phi_oold, ca, sc, **kw)
    ca_pad = sharding.pad_cell_arrays(ca, 7)  # awkward padding
    ru, rp = physics.assemble_residual(u, phi, phi_old, phi_oold, ca_pad, sc, **kw)
    assert np.allclose(np.asarray(ru), np.asarray(ru0), rtol=1e-14)
    assert np.allclose(np.asarray(rp), np.asarray(rp0), rtol=1e-14)


def test_driver_multidevice_matches_single(tmp_path):
    """Full driver run with n_devices=2 (GSPMD) must match single-device."""
    from cracks_tpu.config import load_parameters
    from cracks_tpu.driver import Simulation

    p = load_parameters(os.path.join(regression.PRM_DIR, "sneddon_2d_1.prm"),
                        output_dir="", max_no_timesteps=1,
                        n_local_pre_refine=0, n_refinement_cycles=0,
                        linear_solver="cg")
    s1 = Simulation(p, verbose=False); s1.run()
    s2 = Simulation(p.replace(n_devices=2), verbose=False); s2.run()
    b1 = s1.statistics.data["Bulk Energy"]
    b2 = s2.statistics.data["Bulk Energy"]
    # reduction order differs across partitionings; values agree to ~1e-9
    assert b1 == pytest.approx(b2, rel=1e-6)


def test_driver_dcn_product_mesh_matches_flat(tmp_path):
    """Multi-host layout: the same run on a host-major ("dcn","cells")
    product mesh (mesh_dcn=2 x 4 chips — the 2-host slice layout,
    parallel/sharding.make_device_mesh) must match the flat 8-device
    mesh.  The cell partition is identical (jax.devices() is
    process-major), only the collective lowering changes."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from cracks_tpu.config import load_parameters
    from cracks_tpu.driver import Simulation

    p = load_parameters(os.path.join(regression.PRM_DIR, "sneddon_2d_1.prm"),
                        output_dir="", max_no_timesteps=0,
                        n_local_pre_refine=0, n_refinement_cycles=0,
                        linear_solver="cg", preconditioner="gmg",
                        n_devices=8)
    s_flat = Simulation(p, verbose=False); s_flat.run()
    s_dcn = Simulation(p.replace(mesh_dcn=2), verbose=False); s_dcn.run()
    assert tuple(s_dcn.sys._device_mesh.axis_names) == ("dcn", "cells")
    assert s_dcn.sys._device_mesh.devices.shape == (2, 4)
    b1 = s_flat.statistics.data["Bulk Energy"]
    b2 = s_dcn.statistics.data["Bulk Energy"]
    assert b1 == pytest.approx(b2, rel=1e-8)
