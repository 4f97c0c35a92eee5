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


# ---------------------------------------------------------------------------
# multi-chip (GSPMD) variant: shard_map manual partitioning
# ---------------------------------------------------------------------------
#
# A tpu_custom_call does not partition under GSPMD, so the multi-chip
# lattice solve historically fell back to the XLA slice matvec
# (PERFORMANCE.md).  The standard fix is shard_map manual partitioning
# with explicit halo exchange: DoF vectors are row-slab sharded along
# the leading grid axis (solvers/lattice_newton.py), and the stencil
# reach is ONE vertex row, so
#  * the jac is laid out per shard ONCE per Newton solve with the
#    neighbouring shard's last cell row attached (pad_jac_sharded —
#    one ppermute at prepare time), and
#  * each matvec exchanges a single (k, 1, GX) vertex row in each
#    direction (two ppermutes over ICI) before one per-shard kernel
#    call; every owned output row is then complete locally — no
#    combine step.
# Local padded row pl maps to global cell row r0-1+pl (jac) / vertex
# row r0-1+pl (X) where r0 is the shard's first owned row; row 0 is
# the halo (zero on the boundary shards — ppermute's non-circular
# permutation delivers zeros).

def pad_jac_sharded(jacB, *, mesh, axis: str, gyp: int,
                    ty: int = 128, tx: int = 128):
    """Per-shard halo'd `pad_jac` layout of one jac block, built once
    per Newton solve.  jacB (kl, kl, GCY, GCX) f32, row-slab sharded;
    returns the shard_map-stacked (kl, kl, D*(nty*ty+8), ntx*tx+128)
    carrier consumed by `stencil_matvec_sharded`."""
    kl = jacB.shape[0]
    GCY, GCX = jacB.shape[2], jacB.shape[3]
    D = mesh.shape[axis]
    rows_loc = gyp // D
    nty = -(-rows_loc // ty)
    ntx = -(-(GCX + 1) // tx)
    jp = jnp.zeros((kl, kl, gyp, GCX), jnp.float32)
    jp = jp.at[:, :, :GCY].set(jacB.astype(jnp.float32))
    from jax.sharding import PartitionSpec as P

    @partial(jax.shard_map, mesh=mesh,
             in_specs=P(None, None, axis, None),
             out_specs=P(None, None, axis, None))
    def build(jl):
        halo = jax.lax.ppermute(jl[:, :, -1:], axis,
                                [(i, i + 1) for i in range(D - 1)])
        out = jnp.zeros((kl, kl, nty * ty + 8, ntx * tx + 128),
                        jnp.float32)
        out = out.at[:, :, 0:1, 1: 1 + GCX].set(halo)
        out = out.at[:, :, 1: 1 + rows_loc, 1: 1 + GCX].set(jl)
        return out

    return build(jp)


def stencil_matvec_sharded(JPs, X, *, k: int, GY: int, GX: int, mesh,
                           axis: str, gyp: int, ty: int = 128,
                           tx: int = 128, interpret: bool = False):
    """Y = A X on a row-slab sharded lattice via the Pallas kernel under
    shard_map.  X (k, GY, GX) f32 (any row sharding — constrained to the
    slab layout by the pad); JPs from `pad_jac_sharded`."""
    D = mesh.shape[axis]
    rows_loc = gyp // D
    nty = -(-rows_loc // ty)
    ntx = -(-GX // tx)
    Xp = jnp.zeros((k, gyp, GX), jnp.float32).at[:, :GY].set(X)
    from jax.sharding import PartitionSpec as P

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(None, None, axis, None), P(None, axis, None)),
             out_specs=P(None, axis, None),
             # pallas_call's out_shape carries no varying-mesh-axes
             # annotation; the kernel output is per-shard by
             # construction
             check_vma=False)
    def run(jp, xl):
        up = jax.lax.ppermute(xl[:, -1:], axis,
                              [(i, i + 1) for i in range(D - 1)])
        dn = jax.lax.ppermute(xl[:, :1], axis,
                              [(i + 1, i) for i in range(D - 1)])
        XP = jnp.zeros((k, nty * ty + 8, ntx * tx + 128), jnp.float32)
        XP = XP.at[:, 0:1, 1: 1 + GX].set(up)
        XP = XP.at[:, 1: 1 + rows_loc, 1: 1 + GX].set(xl)
        XP = XP.at[:, 1 + rows_loc: 2 + rows_loc, 1: 1 + GX].set(dn)
        out = _call_kernel(jp, XP, k=k, ty=ty, tx=tx, nty=nty, ntx=ntx,
                           interpret=interpret)
        return out[:, :rows_loc, :GX]

    return run(JPs, Xp)[:, :GY]


# ---------------------------------------------------------------------------
# 3d variant
# ---------------------------------------------------------------------------
#
# Same stencil contract one dimension up: for vertex (d, vz, vy, vx)
#
#   Y[d,vz,vy,vx] = sum_{a,b,e} J[a*k+d, b*k+e, vz-oz_a, vy-oy_a, vx-ox_a]
#                               * X[e, (vz,vy,vx) - o_a + o_b]
#
# with 8 corners (lattice._offsets(3) order: o_a = ((a>>2)&1, (a>>1)&1,
# a&1)).  The VMEM budget changes the schedule: the 2d kernel holds the
# whole (4k, 4k) J tile resident (8.9 MB at k=2), but the 3d u-block is
# (24, 24) — 9x the planes — so the J tile is streamed PER CORNER PAIR
# (a, b) as 64 double-buffered (k, k, TZ+1, TY+8, TX+128) async copies
# (~1.3 MB each at the default tile) overlapped with the VPU
# accumulation of the previous pair.  J is still read exactly once and
# no intermediate touches HBM.
#
# Layout contract: J (8k, 8k, GCZ, GCY, GCX) f32, corner-major local
# dofs; X, Y (k, GZ, GY, GX) with G* = GC*+1.

_OFFS3 = [(0, 0, 0), (0, 0, 1), (0, 1, 0), (0, 1, 1),
          (1, 0, 0), (1, 0, 1), (1, 1, 0), (1, 1, 1)]


def _kernel3d(j_hbm, x_hbm, y_ref, jt0, jt1, xt, sem_j0, sem_j1, sem_x,
              *, k, TZ_, TY_, TX_):
    iz = jnp.asarray(pl.program_id(0), jnp.int32)
    iy = jnp.asarray(pl.program_id(1), jnp.int32)
    ix = jnp.asarray(pl.program_id(2), jnp.int32)
    TZ, TY, TX = TZ_, TY_, TX_
    cp_x = pltpu.make_async_copy(
        x_hbm.at[:, pl.ds(iz * TZ, TZ + 2), pl.ds(iy * TY, TY + 8),
                 pl.ds(ix * TX, TX + 128)],
        xt, sem_x)
    cp_x.start()
    pairs = [(a, b) for a in range(8) for b in range(8)]
    bufs, sems = (jt0, jt1), (sem_j0, sem_j1)

    def cp_j(p):
        a, b = pairs[p]
        return pltpu.make_async_copy(
            j_hbm.at[a * k:(a + 1) * k, b * k:(b + 1) * k,
                     pl.ds(iz * TZ, TZ + 1), pl.ds(iy * TY, TY + 8),
                     pl.ds(ix * TX, TX + 128)],
            bufs[p % 2], sems[p % 2])

    cp_j(0).start()
    cp_x.wait()
    acc = [jnp.zeros((TZ, TY, TX), jnp.float32) for _ in range(k)]
    for p, (a, b) in enumerate(pairs):
        cp_j(p).wait()
        if p + 1 < len(pairs):
            # prefetch the next pair into the other buffer while this
            # pair's 9 (k^2) fused multiply-adds run on the VPU
            cp_j(p + 1).start()
        jt = bufs[p % 2]
        oza, oya, oxa = _OFFS3[a]
        ozb, oyb, oxb = _OFFS3[b]
        jz0, jy0, jx0 = 1 - oza, 1 - oya, 1 - oxa
        xz0, xy0, xx0 = jz0 + ozb, jy0 + oyb, jx0 + oxb
        for d in range(k):
            for e in range(k):
                J = jt[d, e, jz0: jz0 + TZ, jy0: jy0 + TY,
                       jx0: jx0 + TX]
                Xv = xt[e, xz0: xz0 + TZ, xy0: xy0 + TY,
                        xx0: xx0 + TX]
                acc[d] = acc[d] + J * Xv
    for d in range(k):
        y_ref[d] = acc[d]


def pad_jac3d(jacL, *, tz: int = 8, ty: int = 8, tx: int = 128):
    """One-off padded jac layout for `stencil_matvec3d_prepadded`:
    1-ring zero pad grown to the tile grid + the (8, 128) alignment
    margin on the minor dims (z is untiled — +1 halo row only)."""
    kl = jacL.shape[0]
    GCZ, GCY, GCX = jacL.shape[2], jacL.shape[3], jacL.shape[4]
    ntz = -(-(GCZ + 1) // tz)
    nty = -(-(GCY + 1) // ty)
    ntx = -(-(GCX + 1) // tx)
    JP = jnp.zeros((kl, kl, ntz * tz + 1, nty * ty + 8,
                    ntx * tx + 128), jnp.float32)
    return JP.at[:, :, 1: 1 + GCZ, 1: 1 + GCY, 1: 1 + GCX].set(jacL)


@partial(jax.jit, static_argnames=("k", "GZ", "GY", "GX", "tz", "ty",
                                   "tx", "interpret"))
def stencil_matvec3d_prepadded(JP, X, *, k: int, GZ: int, GY: int,
                               GX: int, tz: int = 8, ty: int = 8,
                               tx: int = 128, interpret: bool = False):
    """Y = A X with the jac already in `pad_jac3d` layout."""
    ntz = -(-GZ // tz)
    nty = -(-GY // ty)
    ntx = -(-GX // tx)
    XP = jnp.zeros((k, ntz * tz + 2, nty * ty + 8, ntx * tx + 128),
                   jnp.float32)
    XP = XP.at[:, 1: 1 + GZ, 1: 1 + GY, 1: 1 + GX].set(X)
    out = _call_kernel3d(JP, XP, k=k, tz=tz, ty=ty, tx=tx, ntz=ntz,
                         nty=nty, ntx=ntx, interpret=interpret)
    return out[:, :GZ, :GY, :GX]


def _call_kernel3d(JP, XP, *, k, tz, ty, tx, ntz, nty, ntx, interpret):
    return pl.pallas_call(
        partial(_kernel3d, k=k, TZ_=tz, TY_=ty, TX_=tx),
        grid=(ntz, nty, ntx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((k, tz, ty, tx),
                               lambda i, j, l: (0, i, j, l),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, ntz * tz, nty * ty,
                                        ntx * tx), jnp.float32),
        interpret=interpret,
        scratch_shapes=[
            pltpu.VMEM((k, k, tz + 1, ty + 8, tx + 128), jnp.float32),
            pltpu.VMEM((k, k, tz + 1, ty + 8, tx + 128), jnp.float32),
            pltpu.VMEM((k, tz + 2, ty + 8, tx + 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(JP, XP)


def pad_jac3d_sharded(jacB, *, mesh, axis: str, gzp: int, tz: int = 8,
                      ty: int = 8, tx: int = 128):
    """Per-shard halo'd `pad_jac3d` layout of one 3d jac block (z-slab
    sharded along the leading grid axis), built once per Newton solve:
    each shard attaches the neighbouring shard's last cell z-plane
    (one ppermute), so every owned output plane is complete locally."""
    kl = jacB.shape[0]
    GCZ, GCY, GCX = jacB.shape[2], jacB.shape[3], jacB.shape[4]
    D = mesh.shape[axis]
    z_loc = gzp // D
    ntz = -(-z_loc // tz)
    nty = -(-(GCY + 1) // ty)
    ntx = -(-(GCX + 1) // tx)
    jp = jnp.zeros((kl, kl, gzp, GCY, GCX), jnp.float32)
    jp = jp.at[:, :, :GCZ].set(jacB.astype(jnp.float32))
    from jax.sharding import PartitionSpec as P

    @partial(jax.shard_map, mesh=mesh,
             in_specs=P(None, None, axis, None, None),
             out_specs=P(None, None, axis, None, None))
    def build(jl):
        halo = jax.lax.ppermute(jl[:, :, -1:], axis,
                                [(i, i + 1) for i in range(D - 1)])
        out = jnp.zeros((kl, kl, ntz * tz + 1, nty * ty + 8,
                         ntx * tx + 128), jnp.float32)
        out = out.at[:, :, 0:1, 1: 1 + GCY, 1: 1 + GCX].set(halo)
        out = out.at[:, :, 1: 1 + z_loc, 1: 1 + GCY,
                     1: 1 + GCX].set(jl)
        return out

    return build(jp)


def stencil_matvec3d_sharded(JPs, X, *, k: int, GZ: int, GY: int,
                             GX: int, mesh, axis: str, gzp: int,
                             tz: int = 8, ty: int = 8, tx: int = 128,
                             interpret: bool = False):
    """Y = A X on a z-slab sharded 3d lattice via the Pallas kernel
    under shard_map: one (k, 1, GY, GX) vertex plane exchanged in each
    direction (two ppermutes over ICI) per matvec, then one per-shard
    kernel call; JPs from `pad_jac3d_sharded`."""
    D = mesh.shape[axis]
    z_loc = gzp // D
    ntz = -(-z_loc // tz)
    nty = -(-GY // ty)
    ntx = -(-GX // tx)
    Xp = jnp.zeros((k, gzp, GY, GX), jnp.float32).at[:, :GZ].set(X)
    from jax.sharding import PartitionSpec as P

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(None, None, axis, None, None),
                       P(None, axis, None, None)),
             out_specs=P(None, axis, None, None),
             check_vma=False)
    def run(jp, xl):
        up = jax.lax.ppermute(xl[:, -1:], axis,
                              [(i, i + 1) for i in range(D - 1)])
        dn = jax.lax.ppermute(xl[:, :1], axis,
                              [(i + 1, i) for i in range(D - 1)])
        XP = jnp.zeros((k, ntz * tz + 2, nty * ty + 8, ntx * tx + 128),
                       jnp.float32)
        XP = XP.at[:, 0:1, 1: 1 + GY, 1: 1 + GX].set(up)
        XP = XP.at[:, 1: 1 + z_loc, 1: 1 + GY, 1: 1 + GX].set(xl)
        XP = XP.at[:, 1 + z_loc: 2 + z_loc, 1: 1 + GY,
                   1: 1 + GX].set(dn)
        out = _call_kernel3d(jp, XP, k=k, tz=tz, ty=ty, tx=tx, ntz=ntz,
                             nty=nty, ntx=ntx, interpret=interpret)
        return out[:, :z_loc, :GY, :GX]

    return run(JPs, Xp)[:, :GZ]


@partial(jax.jit, static_argnames=("k", "tz", "ty", "tx", "interpret"))
def stencil_matvec3d(jacL, X, *, k: int, tz: int = 8, ty: int = 8,
                     tx: int = 128, interpret: bool = False):
    """Y = A X on the 3d lattice via the fused Pallas stencil kernel.

    jacL (8k, 8k, GCZ, GCY, GCX) f32; X (k, GZ, GY, GX) f32."""
    kl = 8 * k
    kk, GZ, GY, GX = X.shape
    assert kk == k and jacL.shape[:2] == (kl, kl)
    assert jacL.shape[2:] == (GZ - 1, GY - 1, GX - 1)
    JP = pad_jac3d(jacL, tz=tz, ty=ty, tx=tx)
    return stencil_matvec3d_prepadded(JP, X, k=k, GZ=GZ, GY=GY, GX=GX,
                                      tz=tz, ty=ty, tx=tx,
                                      interpret=interpret)


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
