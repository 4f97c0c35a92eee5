"""Pallas TPU kernel for the lattice stencil matvec.

The lattice Newton operator (solvers/lattice.py) applies a stored
element-matrix stencil: for vertex (d, vy, vx)

    Y[d,vy,vx] = sum_{a,b,e} J[a*k+d, b*k+e, vy-oy_a, vx-ox_a]
                              * X[e, vy-oy_a+oy_b, vx-ox_a+ox_b]

XLA evaluates this as 4 shifted window reads + a batched einsum + 4
shifted window adds, materializing the (nvc*k, GCY, GCX) intermediate
through HBM both ways.  On this chip (~33 GB/s effective stream
bandwidth, PERFORMANCE.md) the jac itself is the unavoidable traffic
(16k^2 planes of (GCY, GCX) f32); the XLA form moves ~2.3x that.  This
kernel computes Y tile-by-tile in one pass: per (TY, TX) vertex tile it
DMAs the J tile (+1 halo ring) and X tile (+2 halo) from HBM into VMEM
and accumulates the 16k^2-term stencil product on the VPU — J is read
exactly once and no intermediate ever touches HBM.  Halo'd (overlapping)
tile reads are done with explicit async copies because BlockSpec blocks
cannot overlap.

Layout contract: J (4k, 4k, GCY, GCX) f32 with local dof = corner*k +
comp (corner offsets (oy, ox) in lattice._OFFS order); X, Y (k, GY, GX)
with GY = GCY+1.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_OFFS = [(0, 0), (0, 1), (1, 0), (1, 1)]   # corner a -> (oy, ox)


def _kernel(j_hbm, x_hbm, y_ref, jt, xt, sem_j, sem_x, *, k, TY_, TX_):
    # halo'd tiles are DMA'd at (8, 128)-aligned sizes (TY+8, TX+128):
    # Mosaic requires slice shapes aligned to the tiling; the extra
    # rows/cols beyond the +1/+2 halo are simply unused
    # under jax_enable_x64 the program ids trace as s64, which Mosaic's
    # memref slicing rejects — force i32 (slice sizes stay static)
    i = jnp.asarray(pl.program_id(0), jnp.int32)
    j = jnp.asarray(pl.program_id(1), jnp.int32)
    TY, TX = TY_, TX_
    kl = 4 * k
    cp_j = pltpu.make_async_copy(
        j_hbm.at[:, :, pl.ds(i * TY, TY + 8), pl.ds(j * TX, TX + 128)],
        jt, sem_j)
    cp_x = pltpu.make_async_copy(
        x_hbm.at[:, pl.ds(i * TY, TY + 8), pl.ds(j * TX, TX + 128)],
        xt, sem_x)
    cp_j.start()
    cp_x.start()
    cp_j.wait()
    cp_x.wait()
    for d in range(k):
        acc = jnp.zeros((TY, TX), jnp.float32)
        for a, (oya, oxa) in enumerate(_OFFS):
            jy0, jx0 = 1 - oya, 1 - oxa
            for b, (oyb, oxb) in enumerate(_OFFS):
                xy0, xx0 = jy0 + oyb, jx0 + oxb
                for e in range(k):
                    J = jt[a * k + d, b * k + e,
                           jy0: jy0 + TY, jx0: jx0 + TX]
                    Xv = xt[e, xy0: xy0 + TY, xx0: xx0 + TX]
                    acc = acc + J * Xv
        y_ref[d] = acc


def pad_jac(jacL, *, ty: int = 128, tx: int = 128):
    """One-off padded jac layout for `stencil_matvec_prepadded`: 1-ring
    zero pad (out-of-domain cells contribute zero) grown to the tile
    grid + the (8, 128) DMA-alignment margin.  Hoist this out of the
    per-matvec path (it costs ~2x the kernel itself)."""
    kl = jacL.shape[0]
    GCY, GCX = jacL.shape[2], jacL.shape[3]
    nty = -(-(GCY + 1) // ty)
    ntx = -(-(GCX + 1) // tx)
    JP = jnp.zeros((kl, kl, nty * ty + 8, ntx * tx + 128), jnp.float32)
    return JP.at[:, :, 1: 1 + GCY, 1: 1 + GCX].set(jacL)


@partial(jax.jit, static_argnames=("k", "GY", "GX", "ty", "tx",
                                   "interpret"))
def stencil_matvec_prepadded(JP, X, *, k: int, GY: int, GX: int,
                             ty: int = 128, tx: int = 128,
                             interpret: bool = False):
    """Y = A X with the jac already in `pad_jac` layout."""
    kl = 4 * k
    nty = -(-GY // ty)
    ntx = -(-GX // tx)
    XP = jnp.zeros((k, nty * ty + 8, ntx * tx + 128), jnp.float32)
    XP = XP.at[:, 1: 1 + GY, 1: 1 + GX].set(X)
    out = _call_kernel(JP, XP, k=k, ty=ty, tx=tx, nty=nty, ntx=ntx,
                       interpret=interpret)
    return out[:, :GY, :GX]


@partial(jax.jit, static_argnames=("k", "ty", "tx", "interpret"))
def stencil_matvec(jacL, X, *, k: int, ty: int = 128, tx: int = 128,
                   interpret: bool = False):
    """Y = A X on the lattice via the fused Pallas stencil kernel.

    jacL (4k, 4k, GCY, GCX) f32; X (k, GY, GX) f32 -> (k, GY, GX)."""
    kl = 4 * k
    kk, GY, GX = X.shape
    assert kk == k and jacL.shape[:2] == (kl, kl)
    GCY, GCX = jacL.shape[2], jacL.shape[3]
    assert (GCY, GCX) == (GY - 1, GX - 1)
    JP = pad_jac(jacL, ty=ty, tx=tx)
    return stencil_matvec_prepadded(JP, X, k=k, GY=GY, GX=GX, ty=ty,
                                    tx=tx, interpret=interpret)


def _call_kernel(JP, XP, *, k, ty, tx, nty, ntx, interpret):
    kl = 4 * k
    out = pl.pallas_call(
        partial(_kernel, k=k, TY_=ty, TX_=tx),
        grid=(nty, ntx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((k, ty, tx), lambda i, j: (i * 0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, nty * ty, ntx * tx),
                                       jnp.float32),
        interpret=interpret,
        scratch_shapes=[
            pltpu.VMEM((kl, kl, ty + 8, tx + 128), jnp.float32),
            pltpu.VMEM((k, ty + 8, tx + 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(JP, XP)
    return out
