"""Device-derived cell arrays (physics.CellCore) vs the host pipeline.

The driver derives every CellArrays variant (dtype x cell order x
chunk layout) from one device-resident CellCore (ops/physics.py
build_cell_core / cell_arrays_from_core) instead of repeated
transposing host sweeps.  These tests pin the derived arrays
bit-identical to the original host pipeline they replaced
(build_cell_arrays_host / cell_arrays_from_host /
lattice.permuted_cell_arrays)."""

import jax.numpy as jnp
import numpy as np
import pytest

import cracks_tpu.solvers.lattice as lat
from cracks_tpu import meshio, problems
from cracks_tpu.config import Parameters
from cracks_tpu.mesh import Forest
from cracks_tpu.ops import physics


def _mesh_and_lame(dim):
    if dim == 2:
        f = Forest(meshio.rect_mesh([-10, -10], [10, 10]))
        f.refine_global(3)
    else:
        f = Forest(meshio.rect_mesh([0, 0, 0], [1, 1, 1], [1, 1, 1]))
        f.refine_global(2)
    mesh = f.extract()
    p = Parameters(test_case="sneddon", pressure_expr="1.0e-3",
                   G_c=1.0, poisson_ratio_nu=0.2, E_modulus=1.0,
                   dimension=dim)
    lam, mu = problems.cell_lame_fields(p, mesh, None)
    return mesh, lam, mu


def _assert_ca_equal(ca_host, ca_core):
    for name in physics.CellArrays._fields:
        a, b = getattr(ca_host, name), getattr(ca_core, name)
        if name == "chunked":
            assert (a is None) == (b is None)
            if a is not None:
                for cn in physics.ChunkedCells._fields:
                    ac, bc = np.asarray(getattr(a, cn)), \
                        np.asarray(getattr(b, cn))
                    assert ac.dtype == bc.dtype, (cn, ac.dtype, bc.dtype)
                    np.testing.assert_array_equal(ac, bc, err_msg=cn)
            continue
        a, b = np.asarray(a), np.asarray(b)
        assert a.dtype == b.dtype, (name, a.dtype, b.dtype)
        np.testing.assert_array_equal(a, b, err_msg=name)


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("dtype", [jnp.float64, jnp.float32])
def test_core_matches_host_pipeline(dim, dtype):
    mesh, lam, mu = _mesh_and_lame(dim)
    host = physics.build_cell_arrays_host(mesh, lam, mu)
    core = physics.build_cell_core(mesh, lam, mu)
    ca_h = physics.cell_arrays_from_host(host, dtype=dtype, chunk=False)
    ca_c = physics.cell_arrays_from_core(core, dtype=dtype, chunk=False)
    _assert_ca_equal(ca_h, ca_c)


@pytest.mark.parametrize("dim", [2, 3])
def test_core_matches_permuted_lattice_arrays(dim):
    """Raster-permuted variant: cell_arrays_from_core(perm=...) vs
    lattice.permuted_cell_arrays (both orderings feed the lattice
    solve's element-matrix build)."""
    mesh, lam, mu = _mesh_and_lame(dim)
    lay = lat.detect_tensor_grid(mesh)
    assert lay is not None
    host = physics.build_cell_arrays_host(mesh, lam, mu)
    core = physics.build_cell_core(mesh, lam, mu)
    for dtype in (jnp.float32, jnp.float64):
        ca_h = lat.permuted_cell_arrays(mesh, lam, mu, lay, dtype=dtype,
                                        chunk=False, host=host)
        ca_c = physics.cell_arrays_from_core(core, dtype=dtype,
                                             chunk=False,
                                             perm=lay.cell_perm)
        _assert_ca_equal(ca_h, ca_c)


def test_core_chunked_matches_host(monkeypatch):
    """Chunk-major scan layout equality, with CELL_CHUNK shrunk so a
    test-size mesh actually chunks (production threshold is 131072
    cells).  Pins chunk partitioning, padding fills and the
    (n_chunks, ..., ch) axis order of the device derivation."""
    monkeypatch.setattr(physics, "CELL_CHUNK", 100)
    mesh, lam, mu = _mesh_and_lame(2)   # 1024 cells -> 11 chunks of 128
    assert physics.chunk_spec(mesh.n_cells) is not None
    host = physics.build_cell_arrays_host(mesh, lam, mu)
    core = physics.build_cell_core(mesh, lam, mu)
    for dtype in (jnp.float64, jnp.float32):
        ca_h = physics.cell_arrays_from_host(host, dtype=dtype,
                                             chunk=True)
        ca_c = physics.cell_arrays_from_core(core, dtype=dtype,
                                             chunk=True)
        assert ca_c.chunked is not None
        _assert_ca_equal(ca_h, ca_c)
