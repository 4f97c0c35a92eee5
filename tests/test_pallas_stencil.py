"""Pallas lattice stencil-matvec kernel vs the XLA slice formulation.

Runs in Pallas interpreter mode so it verifies on the CPU test mesh;
the compiled-TPU measurement lives in PERFORMANCE.md."""

import jax.numpy as jnp
import numpy as np
import pytest

from cracks_tpu.ops import pallas_stencil as ps
from cracks_tpu.solvers import lattice as lat


@pytest.mark.parametrize("k,lo,hi", [(2, 0, 8), (1, 8, 12)])
def test_stencil_matvec_matches_xla(k, lo, hi):
    rng = np.random.default_rng(0)
    GY = GX = 41
    jacL = jnp.asarray(rng.normal(size=(12, 12, GY - 1, GX - 1)),
                       jnp.float32)
    X = jnp.asarray(rng.normal(size=(k, GY, GX)), jnp.float32)
    y_ref = lat.matvec(jacL, X, lo, hi, k)
    y_pl = ps.stencil_matvec(jacL[lo:hi, lo:hi], X, k=k, ty=16, tx=16,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("k,lo,hi", [(2, 0, 8), (1, 8, 12)])
def test_stencil_matvec_sharded_matches_xla(k, lo, hi):
    """The shard_map (GSPMD) kernel wrapper: per-shard halo'd jac
    layout + one-row ppermute halo exchange must reproduce the XLA
    slice matvec on an 8-way row-slab sharded lattice — including the
    row-pad (gyp > GY) and shard-boundary rows."""
    from cracks_tpu.parallel.sharding import make_device_mesh

    rng = np.random.default_rng(1)
    GY, GX = 43, 37            # gyp = 48: pad rows cross shards
    mesh = make_device_mesh(8)
    ax = mesh.axis_names[0]
    D = 8
    gyp = -(-GY // D) * D
    jacL = jnp.asarray(rng.normal(size=(12, 12, GY - 1, GX - 1)),
                       jnp.float32)
    X = jnp.asarray(rng.normal(size=(k, GY, GX)), jnp.float32)
    y_ref = lat.matvec(jacL, X, lo, hi, k)
    JPs = ps.pad_jac_sharded(jacL[lo:hi, lo:hi], mesh=mesh, axis=ax,
                             gyp=gyp, ty=16, tx=16)
    y_pl = ps.stencil_matvec_sharded(JPs, X, k=k, GY=GY, GX=GX,
                                     mesh=mesh, axis=ax, gyp=gyp,
                                     ty=16, tx=16, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("k,lo,hi", [(3, 0, 24), (1, 24, 32)])
def test_stencil_matvec3d_matches_xla(k, lo, hi):
    """3d kernel (streamed corner-pair schedule) vs the XLA slice
    matvec, non-tile-aligned grid."""
    rng = np.random.default_rng(2)
    GZ, GY, GX = 11, 13, 19
    jacL = jnp.asarray(
        rng.normal(size=(32, 32, GZ - 1, GY - 1, GX - 1)), jnp.float32)
    X = jnp.asarray(rng.normal(size=(k, GZ, GY, GX)), jnp.float32)
    y_ref = lat.matvec(jacL, X, lo, hi, k)
    y_pl = ps.stencil_matvec3d(jacL[lo:hi, lo:hi], X, k=k, tz=4, ty=8,
                               tx=16, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("k,lo,hi", [(3, 0, 24), (1, 24, 32)])
def test_stencil_matvec3d_sharded_matches_xla(k, lo, hi):
    """The shard_map 3d kernel wrapper: per-shard halo'd jac layout +
    one-plane ppermute halo exchange must reproduce the XLA slice
    matvec on an 8-way z-slab sharded lattice, including the z-pad
    (gzp > GZ) and shard-boundary planes."""
    from cracks_tpu.parallel.sharding import make_device_mesh

    rng = np.random.default_rng(3)
    GZ, GY, GX = 11, 13, 19       # gzp = 16: pad planes cross shards
    mesh = make_device_mesh(8)
    ax = mesh.axis_names[0]
    D = 8
    gzp = -(-GZ // D) * D
    jacL = jnp.asarray(
        rng.normal(size=(32, 32, GZ - 1, GY - 1, GX - 1)), jnp.float32)
    X = jnp.asarray(rng.normal(size=(k, GZ, GY, GX)), jnp.float32)
    y_ref = lat.matvec(jacL, X, lo, hi, k)
    JPs = ps.pad_jac3d_sharded(jacL[lo:hi, lo:hi], mesh=mesh, axis=ax,
                               gzp=gzp, tz=2, ty=8, tx=16)
    y_pl = ps.stencil_matvec3d_sharded(JPs, X, k=k, GZ=GZ, GY=GY,
                                       GX=GX, mesh=mesh, axis=ax,
                                       gzp=gzp, tz=2, ty=8, tx=16,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-4)
