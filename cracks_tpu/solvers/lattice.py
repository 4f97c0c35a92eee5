"""Tensor-grid (monolattice) fast path for the Newton-system solve.

Measured on the attached TPU (PERFORMANCE.md): effective HBM streaming
is ~33 GB/s and *element-granular dynamic gathers run ~100x slower than
streams* (11.3 ms to gather 8x102400 f32 vs 3.9 ms to stream 64 MB).
The generic stored-matrix Krylov operator (solvers/assembled.py) does a
gather + batched einsum + scatter per application, so its cost was
gather-dominated (16.8 ms vs 3.4 ms for the einsum), and the V-cycle
built from it cost ~84 ms per application — the entire load-step
budget.

On a uniformly refined tensor-product mesh (the production Sneddon /
bench configurations: ``rect_mesh`` roots, ``n_global_pre_refine``
refinements, no hanging nodes) the mesh IS a global (GY x GX) lattice,
and every FEM gather/scatter is a SHIFTED ARRAY SLICE:

  * cell->vertex gather   = 4 shifted (GCY, GCX) windows of the vertex
    lattice;
  * vertex scatter-add    = 4 shifted window adds;
  * 2:1 restriction/prolongation = strided slices ([::2]);
  * Galerkin element-RAP coarsening = [di::2, dj::2] slices + einsum
    with the constant embedding matrices;
  * the active-set injection to level l = [::2**l, ::2**l].

No dynamic gather appears anywhere in the Krylov loop; everything
streams.  This is the TPU-native analogue of the reference's
assembled-matrix solve path (cracks.cc:2744-2777), specialized to the
structured meshes where production cycles are spent.

Lattice state layout: vectors are (comp, GY, GX) with comp tiny and
LEADING (the last two dims carry the (8, 128) tiling; GY/GX in the
hundreds pad by <= 20%).  Element data is (..., GCY, GCX).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import physics
from .galerkin import embedding_matrices

# lexicographic Q1 vertex order (bit 0 -> x, bit 1 -> y), matching
# fem.py: local a = (ax, ay) with offsets below in (y, x) slicing order
_OFFS = [(0, 0), (0, 1), (1, 0), (1, 1)]  # a -> (oy, ox)


class LatticeLayout(NamedTuple):
    """Host-built tensor-grid identification of a MeshData."""

    GY: int                 # vertex rows
    GX: int                 # vertex cols
    vert_idx: np.ndarray    # (GY, GX) int32 global vertex id per node
    vert_pos: np.ndarray    # (n_v,) int32 flat lattice pos per vertex
    cell_perm: np.ndarray   # (n_cells,) raster (cy, cx) -> mesh cell id


def detect_tensor_grid(mesh) -> LatticeLayout | None:
    """Identify a mesh whose vertices form an exact 2d tensor grid.

    Returns None for 3d meshes, meshes with hanging nodes, or any
    vertex set that is not a full (GY x GX) product grid."""
    if mesh.dim != 2 or len(mesh.hang_child):
        return None

    def axis_index(vals):
        """Cluster coordinates that differ only by multilinear-map float
        noise across roots (observed ~1e-16 relative); returns (index
        per value, n_clusters)."""
        s = np.sort(np.unique(vals))
        span = s[-1] - s[0]
        if span <= 0:
            return None
        tol = 1e-9 * span
        brk = np.diff(s) > tol
        cid = np.r_[0, np.cumsum(brk)]
        # reject if clusters are not well separated vs the tolerance
        if len(s) > 1 and np.diff(s)[brk].min(initial=np.inf) < 100 * tol:
            return None
        idx = cid[np.searchsorted(s, vals)]
        return idx, cid[-1] + 1

    rx = axis_index(mesh.vert_coords[:, 0])
    ry = axis_index(mesh.vert_coords[:, 1])
    if rx is None or ry is None:
        return None
    ix, GX = rx
    iy, GY = ry
    if GX * GY != mesh.n_vertices or GX < 5 or GY < 5:
        return None
    pos = iy * GX + ix
    if len(np.unique(pos)) != mesh.n_vertices:
        return None
    vert_idx = np.full(GY * GX, -1, np.int64)
    vert_idx[pos] = np.arange(mesh.n_vertices)
    if (vert_idx < 0).any():
        return None
    vert_idx = vert_idx.reshape(GY, GX)

    # cells: locate each cell by its lower-left vertex; require the full
    # (GY-1)x(GX-1) raster and the lexicographic corner convention
    if mesh.n_cells != (GY - 1) * (GX - 1):
        return None
    ll = mesh.cell2vert[:, 0]
    cy, cx = pos[ll] // GX, pos[ll] % GX
    expect = np.stack([
        vert_idx[cy, cx], vert_idx[cy, cx + 1],
        vert_idx[cy + 1, cx], vert_idx[cy + 1, cx + 1]], axis=1)
    if not (expect == mesh.cell2vert).all():
        return None
    raster = np.full((GY - 1) * (GX - 1), -1, np.int64)
    raster[cy * (GX - 1) + cx] = np.arange(mesh.n_cells)
    if (raster < 0).any():
        return None
    return LatticeLayout(GY=GY, GX=GX,
                         vert_idx=vert_idx.astype(np.int32),
                         vert_pos=pos.astype(np.int32),
                         cell_perm=raster.astype(np.int32))


def permuted_cell_arrays(mesh, lam, mu, lay: LatticeLayout,
                         dtype=jnp.float32) -> physics.CellArrays:
    """CellArrays with cells in lattice raster order, so the element
    matrices come out of physics.element_matrices already reshapable to
    (ndl, ndl, GCY, GCX)."""
    ca = physics.build_cell_arrays(mesh, lam, mu, dtype=dtype)
    p = lay.cell_perm
    take = lambda a: jnp.asarray(np.asarray(a)[..., p])
    return physics.CellArrays(
        gather_u=take(ca.gather_u), gather_p=take(ca.gather_p),
        JxW=take(ca.JxW), grads=take(ca.grads), shape_v=ca.shape_v,
        lam=take(ca.lam), mu=take(ca.mu), inv_diam2=take(ca.inv_diam2))


# ---------------------------------------------------------------------------
# lattice primitives (device; all shapes static)
# ---------------------------------------------------------------------------

def gather_windows(X):
    """(k, GY, GX) vertex lattice -> per-corner cell windows
    (nvc, k, GCY, GCX)."""
    wins = [X[:, oy: X.shape[1] - 1 + oy, ox: X.shape[2] - 1 + ox]
            for (oy, ox) in _OFFS]
    return jnp.stack(wins, axis=0)


def scatter_windows(Ye, GY, GX):
    """(nvc, k, GCY, GCX) per-corner cell values -> vertex lattice
    (k, GY, GX) by shifted window adds."""
    k = Ye.shape[1]
    Y = jnp.zeros((k, GY, GX), Ye.dtype)
    for a, (oy, ox) in enumerate(_OFFS):
        Y = Y.at[:, oy: GY - 1 + oy, ox: GX - 1 + ox].add(Ye[a])
    return Y


def matvec(jacL, X, lo, hi, k):
    """Masked-free lattice matvec for one block.

    jacL: (ndl, ndl, GCY, GCX); X: (k, GY, GX) -> (k, GY, GX).
    Local dof order inside [lo, hi): corner-major, k comps per corner."""
    GY, GX = X.shape[1], X.shape[2]
    Xe = gather_windows(X)                            # (nvc, k, cy, cx)
    nvc = Xe.shape[0]
    Xf = Xe.reshape(nvc * k, GY - 1, GX - 1)
    J = jacL[lo:hi, lo:hi]
    Yf = jnp.einsum("ijyx,jyx->iyx", J, Xf)
    return scatter_windows(Yf.reshape(nvc, k, GY - 1, GX - 1), GY, GX)


def block_diag(jacL, lo, hi, k, GY, GX):
    """Lattice diagonal of one block: (k, GY, GX)."""
    idx = jnp.arange(lo, hi)
    d = jacL[idx, idx]                                # (b, cy, cx)
    nvc = (hi - lo) // k
    return scatter_windows(d.reshape(nvc, k, GY - 1, GX - 1), GY, GX)


def gershgorin(jacL, free, Dinv, lo, hi, k, GY, GX):
    """Upper bound on lambda_max(D^-1 A) via element-wise over-counted
    Gershgorin row sums (same bound as galerkin._gershgorin_lambda_max)."""
    rs = jnp.sum(jnp.abs(jacL[lo:hi, lo:hi]), axis=1)  # (b, cy, cx)
    nvc = (hi - lo) // k
    s = scatter_windows(rs.reshape(nvc, k, GY - 1, GX - 1), GY, GX)
    return jnp.max(jnp.where(free, s * jnp.abs(Dinv), 0.0))


def coarsen(jacL, P_embed):
    """Galerkin element-RAP one level down on the lattice:
    (ndl, ndl, GCY, GCX) -> (ndl, ndl, GCY//2, GCX//2)."""
    out = 0.0
    for pos, (oy, ox) in enumerate(_OFFS):
        A = jacL[:, :, oy::2, ox::2]
        P = P_embed[pos].astype(jacL.dtype)
        out = out + jnp.einsum("ai,abyx,bj->ijyx", P, A, P)
    return out


def prolong(Xc, GY, GX, k):
    """Q1 2:1 lattice prolongation (kGYc GXc) -> (k, GY, GX)."""
    Xf = jnp.zeros((k, GY, GX), Xc.dtype)
    Xf = Xf.at[:, ::2, ::2].set(Xc)
    # x-midpoints on even rows
    Xf = Xf.at[:, ::2, 1::2].set(0.5 * (Xc[:, :, :-1] + Xc[:, :, 1:]))
    # y-midpoints on even cols
    Xf = Xf.at[:, 1::2, ::2].set(0.5 * (Xc[:, :-1, :] + Xc[:, 1:, :]))
    # centers
    Xf = Xf.at[:, 1::2, 1::2].set(
        0.25 * (Xc[:, :-1, :-1] + Xc[:, :-1, 1:]
                + Xc[:, 1:, :-1] + Xc[:, 1:, 1:]))
    return Xf


def restrict(Xf, k):
    """Transpose of prolong: (k, GY, GX) -> (k, GYc, GXc)."""
    Xc = Xf[:, ::2, ::2] + 0.0
    ex = 0.5 * Xf[:, ::2, 1::2]
    Xc = Xc.at[:, :, :-1].add(ex)
    Xc = Xc.at[:, :, 1:].add(ex)
    ey = 0.5 * Xf[:, 1::2, ::2]
    Xc = Xc.at[:, :-1, :].add(ey)
    Xc = Xc.at[:, 1:, :].add(ey)
    ec = 0.25 * Xf[:, 1::2, 1::2]
    Xc = Xc.at[:, :-1, :-1].add(ec)
    Xc = Xc.at[:, :-1, 1:].add(ec)
    Xc = Xc.at[:, 1:, :-1].add(ec)
    Xc = Xc.at[:, 1:, 1:].add(ec)
    return Xc


# ---------------------------------------------------------------------------
# hierarchy
# ---------------------------------------------------------------------------

class LatticeHierarchy(NamedTuple):
    """Static per-epoch data for the lattice GMG solve."""

    GY: int
    GX: int
    n_levels: int           # total levels incl. finest
    vert_idx: jax.Array     # (GY, GX) int32
    vert_pos: jax.Array     # (n_v,) int32
    # per-level Dirichlet masks, coarsest..finest, as (1|dim, gy, gx)
    dir_u: tuple
    dir_p: tuple
    P_embed: jax.Array      # (nvc+1, ndl, ndl)


def build_lattice_hierarchy(mesh, lay: LatticeLayout, dirichlet_fn,
                            min_coarse: int = 100):
    """Host construction.  Levels halve (GY-1, GX-1) while both stay
    even and the coarse vertex count stays above `min_coarse`."""
    GY, GX = lay.GY, lay.GX
    dims = [(GY, GX)]
    while (dims[-1][0] - 1) % 2 == 0 and (dims[-1][1] - 1) % 2 == 0 \
            and ((dims[-1][0] - 1) // 2 + 1) * ((dims[-1][1] - 1) // 2
                                                + 1) >= min_coarse:
        dims.append(((dims[-1][0] - 1) // 2 + 1,
                     (dims[-1][1] - 1) // 2 + 1))
    if len(dims) < 2:
        return None
    dims = dims[::-1]       # coarsest..finest

    mask_u, mask_p = dirichlet_fn(mesh)
    mask_u = np.asarray(mask_u).reshape(mesh.n_vertices, 2)
    mask_p = np.asarray(mask_p)
    # geometric Dirichlet masks per level: a coarse-lattice node is the
    # fine node at stride 2^l, so masks inject exactly
    MU = np.zeros((lay.GY, lay.GX, 2), bool)
    MP = np.zeros((lay.GY, lay.GX), bool)
    MU[lay.vert_pos // lay.GX, lay.vert_pos % lay.GX] = mask_u
    MP[lay.vert_pos // lay.GX, lay.vert_pos % lay.GX] = mask_p
    dir_u, dir_p = [], []
    for (gy, gx) in dims:
        s = (lay.GY - 1) // (gy - 1)
        du = np.moveaxis(MU[::s, ::s], -1, 0)          # (2, gy, gx)
        dp = MP[::s, ::s][None]                        # (1, gy, gx)
        dir_u.append(jnp.asarray(du))
        dir_p.append(jnp.asarray(dp))
    return LatticeHierarchy(
        GY=GY, GX=GX, n_levels=len(dims),
        vert_idx=jnp.asarray(lay.vert_idx),
        vert_pos=jnp.asarray(lay.vert_pos),
        dir_u=tuple(dir_u), dir_p=tuple(dir_p),
        P_embed=jnp.asarray(embedding_matrices(2), jnp.float32))


# ---------------------------------------------------------------------------
# the fused lattice solve
# ---------------------------------------------------------------------------

def _chebyshev(op, Dinv, b, lam_max, degree):
    upper = 1.2 * lam_max
    lower = lam_max / 20.0
    theta = 0.5 * (upper + lower)
    delta = 0.5 * (upper - lower)
    r = b
    p = (1.0 / theta) * (Dinv * r)
    x = p
    sigma = theta / delta
    rho_old = 1.0 / sigma
    for _ in range(degree - 1):
        r = b - op(x)
        rho = 1.0 / (2.0 * sigma - rho_old)
        p = (rho * rho_old) * p + (2.0 * rho / delta) * (Dinv * r)
        x = x + p
        rho_old = rho
    return x


class _LOps(NamedTuple):
    jac: jax.Array
    free: jax.Array
    Dinv: jax.Array
    lam: jax.Array


def _build_block_levels(jacs, dir_u, dir_p, GY, active_L, lo, hi,
                        k, which):
    """Per-level (_LOps coarsest..finest) for one block."""
    out = []
    for l in range(len(jacs)):
        jac = jacs[l]
        gy, gx = jac.shape[2] + 1, jac.shape[3] + 1
        dmask = dir_u[l] if which == "u" else dir_p[l]
        if which == "p":
            s = (GY - 1) // (gy - 1)
            act = active_L[:, ::s, ::s]
            free = ~(dmask | act)
        else:
            free = ~dmask & jnp.ones((k, gy, gx), bool)
        d = block_diag(jac, lo, hi, k, gy, gx)
        Dinv = jnp.where(free & (jnp.abs(d) > 0), 1.0 / d, 1.0)
        lam = gershgorin(jac, free, Dinv, lo, hi, k, gy, gx)
        out.append(_LOps(jac=jac, free=free, Dinv=Dinv, lam=lam))
    return out


def _masked_mv(lv: _LOps, lo, hi, k):
    def op(X):
        X = jnp.where(lv.free, X, 0.0)
        Y = matvec(lv.jac, X, lo, hi, k)
        return jnp.where(lv.free, Y, 0.0)
    return op


def _coarse_dense_factor(lv0: _LOps, lo, hi, k):
    """Dense Cholesky of the coarsest-level block (Jacobi-scaled, f64)."""
    gy, gx = lv0.free.shape[1], lv0.free.shape[2]
    n0 = k * gy * gx
    # assemble dense from lattice element matrices via the (tiny)
    # coarsest grid: vertex flat index = comp-major (k, gy, gx)
    pos = jnp.arange(gy * gx).reshape(gy, gx)
    wins = jnp.stack([pos[oy: gy - 1 + oy, ox: gx - 1 + ox]
                      for (oy, ox) in _OFFS])          # (nvc, cy, cx)
    nvc = 4
    # local dof ldof = a*k + d  ->  flat = d*gy*gx + win[a]
    comp = jnp.arange(k)
    lflat = (comp[None, :, None, None] * gy * gx
             + wins[:, None, :, :])                    # (nvc, k, cy, cx)
    lflat = lflat.reshape((hi - lo), -1)               # (b, n_cells0)
    A = lv0.jac[lo:hi, lo:hi].reshape(hi - lo, hi - lo, -1)
    rows = jnp.broadcast_to(lflat[:, None, :],
                            (hi - lo, hi - lo, lflat.shape[1]))
    cols = jnp.broadcast_to(lflat[None, :, :],
                            (hi - lo, hi - lo, lflat.shape[1]))
    A0 = jnp.zeros((n0, n0), jnp.float64)
    A0 = A0.at[rows.reshape(-1), cols.reshape(-1)].add(
        A.reshape(-1).astype(jnp.float64))
    m = lv0.free.reshape(-1)
    A0 = jnp.where(m[:, None] & m[None, :], A0, 0.0)
    A0 = A0 + jnp.diag(jnp.where(m, 0.0, 1.0))
    s = 1.0 / jnp.sqrt(jnp.abs(jnp.diagonal(A0)))
    A0s = A0 * s[:, None] * s[None, :]
    return jax.scipy.linalg.cho_factor(A0s), s


def make_vcycle(levels, lo, hi, k, degree=2, coarse_factor=None,
                fine_op=None):
    L = len(levels)
    if coarse_factor is None:
        cho, cho_scale = _coarse_dense_factor(levels[0], lo, hi, k)
    else:
        cho_c, cho_scale = coarse_factor
        cho = (cho_c, False)
    shape0 = levels[0].free.shape

    def cycle(l, b):
        lv = levels[l]
        b = jnp.where(lv.free, b, 0.0)
        if l == 0:
            bs = cho_scale * b.reshape(-1).astype(jnp.float64)
            x = (cho_scale * jax.scipy.linalg.cho_solve(cho, bs)
                 ).astype(b.dtype).reshape(shape0)
            return jnp.where(lv.free, x, 0.0)
        op = (fine_op if (fine_op is not None and l == L - 1)
              else _masked_mv(lv, lo, hi, k))
        x = _chebyshev(op, lv.Dinv, b, lv.lam, degree)
        r = b - op(x)
        r_c = restrict(r, k)
        e_c = cycle(l - 1, r_c)
        gy, gx = lv.free.shape[1], lv.free.shape[2]
        x = x + jnp.where(lv.free, prolong(e_c, gy, gx, k), 0.0)
        r = b - op(x)
        x = x + _chebyshev(op, lv.Dinv, r, lv.lam, degree)
        return x

    return lambda b: cycle(L - 1, b)


# Above ~150k DoFs a single fused solve dispatch runs long enough to
# crash the shared TPU worker (observed deterministically at 309k DoFs;
# PERFORMANCE.md: sustained ~20 s XLA executions kill it), so large
# problems use the split-dispatch variant: same algorithm, one bounded
# device call per CG pass / f64 refinement residual.
FUSED_SOLVE_MAX_DOFS = 150_000


def solve_lattice(sys, u, phi, phi_old, phi_oold, con, active, rhs_u,
                  rhs_p, with_split):
    """Driver-facing entry: unpacks the System's lattice bundle into the
    jitted fused solve (small problems) or the split-dispatch solve."""
    hier: LatticeHierarchy = sys.lattice_hierarchy
    p = sys.params
    if sys.mesh.n_dofs > FUSED_SOLVE_MAX_DOFS:
        return _solve_split(sys, hier, u, phi, phi_old, phi_oold, con,
                            active, rhs_u, rhs_p, with_split)
    du, dp, its, _rr = _solve_newton_system(
        u, phi, phi_old, phi_oold, sys.ca, sys.lattice_ca32,
        sys.scalars, hier.vert_pos, hier.dir_u, hier.dir_p,
        hier.P_embed, con, active, rhs_u, rhs_p, p.cg_rtol,
        GY=hier.GY, GX=hier.GX, n_levels=hier.n_levels, dim=sys.dim,
        with_split=with_split, monolithic=sys.monolithic)
    return du, dp, int(its)


# ---------------------------------------------------------------------------
# split-dispatch variant (large problems)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("GY", "GX", "n_levels", "dim",
                                   "with_split", "monolithic"))
def _prepare(u, phi, phi_old, phi_oold, caL32, sc, P_embed, *, GY, GX,
             n_levels, dim, with_split, monolithic):
    """jac32 on the lattice + the Galerkin coarse chain."""
    f32 = lambda x: x.astype(jnp.float32)
    sc32 = physics.Scalars(*(f32(v) for v in sc))
    jacL = physics.element_matrices(
        f32(u), f32(phi), f32(phi_old), f32(phi_oold), caL32, sc32,
        dim=dim, with_split=with_split, monolithic=monolithic,
        cell_last=True).reshape(12, 12, GY - 1, GX - 1)
    jacs = [jacL]
    for _ in range(n_levels - 1):
        jacs.insert(0, coarsen(jacs[0], P_embed))
    return tuple(jacs)


@partial(jax.jit, static_argnames=("dim", "with_split", "monolithic"))
def _op64_apply(u, phi, phi_old, phi_oold, ca64, sc, con, active, xu,
                xp, *, dim, with_split, monolithic):
    """Condensed exact f64 Newton-operator action (J_uu xu,
    J_pu xu + J_pp xp) via one jvp."""
    from ..ops.constraints import condense_residual, expand_update

    def res64(uu, pp):
        return physics.assemble_residual(
            uu, pp, phi_old, phi_oold, ca64, sc,
            dim=dim, with_split=with_split, monolithic=monolithic)

    eu, ep = expand_update(xu, xp, con, active)
    _, (ju, jp) = jax.jvp(res64, (u, phi), (eu, ep))
    return condense_residual(-ju, -jp, con, active)


@partial(jax.jit, static_argnames=("GY", "which", "pallas"))
def _prepare_levels(jacs, dir_u, dir_p, vert_pos, active, *, GY: int,
                    which: str, pallas: bool = False):
    """Per-block level operator data + the coarse dense factor, built
    ONCE per Newton solve (not per restart pass).  With pallas=True the
    finest-level jac block is additionally laid out in the Pallas
    kernel's padded format (ops/pallas_stencil.pad_jac)."""
    k = 2 if which == "u" else 1
    lo, hi = (0, 8) if which == "u" else (8, 12)
    GX = jacs[-1].shape[3] + 1
    active_L = jnp.zeros((GY * GX,), bool).at[vert_pos].set(
        active)[None].reshape(1, GY, GX)
    levels = _build_block_levels(list(jacs), dir_u, dir_p, GY, active_L,
                                 lo, hi, k, which)
    (cho_c, _lower), scale = _coarse_dense_factor(levels[0], lo, hi, k)
    # drop the python bool from cho_factor's return (it cannot cross the
    # jit boundary); cho_solve is reconstructed with lower=False
    fine_pad = None
    if pallas:
        from ..ops import pallas_stencil as ps
        fine_pad = ps.pad_jac(jacs[-1][lo:hi, lo:hi])
    return tuple(levels), (cho_c, scale), fine_pad


@partial(jax.jit, static_argnames=("GY", "GX", "which", "degree",
                                   "inner_max"))
def _cg_pass(levels, coarse, fine_pad, vert_pos, r_g, rr0, rtol,
             target2, *, GY, GX, which, degree=2, inner_max=96):
    """One float32 lattice-GMG CG pass on the scaled residual; returns
    (dx in f64 global layout, inner iterations).

    With fine_pad given, the finest-level matvec (the dominant op in
    both the CG loop and the V-cycle smoother) runs through the Pallas
    stencil kernel on the pre-padded jac layout."""
    k = 2 if which == "u" else 1
    lo, hi = (0, 8) if which == "u" else (8, 12)
    levels = list(levels)
    fin = levels[-1]
    if fine_pad is not None:
        from ..ops import pallas_stencil as ps

        def fine_op(X):
            X = jnp.where(fin.free, X, 0.0)
            Y = ps.stencil_matvec_prepadded(fine_pad, X, k=k, GY=GY,
                                            GX=GX)
            return jnp.where(fin.free, Y, 0.0)
    else:
        fine_op = _masked_mv(fin, lo, hi, k)
    M32 = make_vcycle(levels, lo, hi, k, degree=degree,
                      coarse_factor=coarse, fine_op=fine_op)
    op32 = fine_op

    scale = jnp.sqrt(rr0)
    inv_scale = jnp.where(scale > 0, 1.0 / scale, 0.0)
    if k == 1:
        R0 = jnp.zeros((GY * GX,), jnp.float32).at[vert_pos].set(
            (r_g * inv_scale).astype(jnp.float32)).reshape(1, GY, GX)
    else:
        rm = (r_g * inv_scale).astype(jnp.float32).reshape(-1, k)
        R0 = jnp.moveaxis(
            jnp.zeros((GY * GX, k), jnp.float32).at[vert_pos].set(rm)
            .reshape(GY, GX, k), -1, 0)
    R0 = jnp.where(fin.free, R0, 0.0)
    # pass target 1e-6 relative: the f32 V-cycle-preconditioned CG
    # reaches it reliably on the normalized system, and a deeper pass
    # halves the number of restarts (each restart costs a ~0.2 s f64
    # exact-residual application)
    tol2 = jnp.asarray(
        jnp.maximum(jnp.maximum(rtol, 1e-6) ** 2,
                    jnp.where(rr0 > 0, target2 / rr0, 1.0)), jnp.float32)
    Z0 = M32(R0)

    def cond(s):
        X, R, Z, Pv, rz, kk, Xb, rrb = s
        return (rrb > tol2) & (kk < inner_max)

    def body(s):
        X, R, Z, Pv, rz, kk, Xb, rrb = s
        Ap = op32(Pv)
        denom = jnp.vdot(Pv, Ap)
        alpha = jnp.where(denom != 0, rz / denom, 0.0)
        X = X + alpha * Pv
        R = R - alpha * Ap
        rr = jnp.vdot(R, R).real
        better = rr < rrb
        Xb = jnp.where(better, X, Xb)
        rrb = jnp.where(better, rr, rrb)
        Z = M32(R)
        rz_new = jnp.vdot(R, Z)
        beta = jnp.where(rz != 0, rz_new / rz, 0.0)
        Pv = Z + beta * Pv
        return X, R, Z, Pv, rz_new, kk + 1, Xb, rrb

    s0 = (jnp.zeros_like(R0), R0, Z0, Z0, jnp.vdot(R0, Z0),
          jnp.asarray(0), jnp.zeros_like(R0),
          jnp.asarray(1.0, jnp.float32))
    s = jax.lax.while_loop(cond, body, s0)
    Xb = s[6].astype(jnp.float64)
    if k == 1:
        dx = Xb.reshape(-1)[vert_pos]
    else:
        dx = jnp.moveaxis(Xb, 0, -1).reshape(-1, k)[vert_pos].reshape(-1)
    return dx * scale, s[5]


def _solve_split(sys, hier: LatticeHierarchy, u, phi, phi_old, phi_oold,
                 con, active, rhs_u, rhs_p, with_split, passes=3):
    """Host-orchestrated restarted-refinement solve with bounded device
    executions.  Mathematically identical to _solve_newton_system."""
    p = sys.params
    rtol = p.cg_rtol
    eps64 = float(np.finfo(np.float64).eps)
    kw = dict(dim=sys.dim, with_split=with_split,
              monolithic=sys.monolithic)
    jacs = _prepare(u, phi, phi_old, phi_oold, sys.lattice_ca32,
                    sys.scalars, hier.P_embed, GY=hier.GY, GX=hier.GX,
                    n_levels=hier.n_levels, **kw)

    op64 = lambda xu, xp: _op64_apply(
        u, phi, phi_old, phi_oold, sys.ca, sys.scalars, con, active,
        xu, xp, **kw)
    zero_u = jnp.zeros_like(rhs_u)
    zero_p = jnp.zeros_like(rhs_p)
    total_its = 0
    last_ju_pu = [None]   # J_pu du of the final accepted u iterate

    # The Pallas stencil kernel is opt-in (CRACKS_TPU_PALLAS=1): it is
    # validated standalone (tests/test_pallas_stencil.py, measured 1.3x
    # the XLA matvec on TPU), but XLA's X64-rewrite pass currently
    # cannot process a computation that mixes the tpu_custom_call with
    # f64 ops ("While rewriting computation to not contain X64 element
    # types ... not implemented"), and the solve needs f64 for the
    # coarse factor + refinement scalars.  Revisit when the kernel can
    # live in an all-f32 jit or the rewrite pass learns custom calls.
    import os
    use_pallas = (os.environ.get("CRACKS_TPU_PALLAS") == "1"
                  and jax.default_backend() != "cpu")

    def block(which, b):
        nonlocal total_its
        levels, coarse, fine_pad = _prepare_levels(
            jacs, hier.dir_u, hier.dir_p, hier.vert_pos, active,
            GY=hier.GY, which=which, pallas=use_pallas)
        bnorm = float(jnp.sqrt(jnp.vdot(b, b).real))
        target2 = max(rtol * bnorm, 100.0 * eps64 * bnorm) ** 2
        x_acc = jnp.zeros_like(b)
        r_cur = b
        rr_cur = bnorm * bnorm
        for _ in range(passes):
            if rr_cur <= target2:
                break
            dx, k = _cg_pass(levels, coarse, fine_pad, hier.vert_pos,
                             r_cur, jnp.asarray(rr_cur), rtol,
                             jnp.asarray(target2), GY=hier.GY,
                             GX=hier.GX, which=which)
            total_its += int(k)
            x_try = x_acc + dx
            if which == "u":
                ju, jp = op64(x_try, zero_p)
                r_try = b - ju
            else:
                _, jp2 = op64(zero_u, x_try)
                r_try = b - jp2
            rr_try = float(jnp.vdot(r_try, r_try).real)
            if not np.isfinite(rr_try) or rr_try >= rr_cur:
                break
            progress = rr_try / max(rr_cur, 1e-300)
            x_acc, r_cur = x_try, r_try
            if which == "u":
                last_ju_pu[0] = jp
            rr_cur = rr_try
            if rr_cur <= target2 or progress > 0.25:
                break
        return x_acc

    du = block("u", rhs_u)
    if last_ju_pu[0] is None:
        _, jp = op64(du, zero_p)
        last_ju_pu[0] = jp
    rhs_p2 = rhs_p - last_ju_pu[0]
    dp = block("p", rhs_p2)
    return du, dp, total_its


@partial(jax.jit, static_argnames=("GY", "GX", "n_levels", "dim",
                                   "with_split", "monolithic", "degree",
                                   "inner_max", "passes"))
def _solve_newton_system(u, phi, phi_old, phi_oold, ca64, caL32, sc,
                         vert_pos, dir_u, dir_p, P_embed, con, active,
                         rhs_u, rhs_p, rtol, *, GY: int, GX: int,
                         n_levels: int, dim: int, with_split: bool,
                         monolithic: bool, degree: int = 2,
                         inner_max: int = 64, passes: int = 3):
    """Fused Newton-system solve on the tensor-grid lattice.

    Same mathematical structure as galerkin.solve_newton_system —
    float32 lattice-GMG-preconditioned CG with float64 matrix-free
    refinement passes — but every Krylov-loop memory access is a
    contiguous slice.  Returns (du, dp, iters, rnorm2) on the free
    subspace in GLOBAL vector layout."""
    from ..ops.constraints import condense_residual, expand_update

    f32 = lambda x: x.astype(jnp.float32)
    sc32 = physics.Scalars(*(f32(v) for v in sc))
    jacL = physics.element_matrices(
        f32(u), f32(phi), f32(phi_old), f32(phi_oold), caL32, sc32,
        dim=dim, with_split=with_split, monolithic=monolithic,
        cell_last=True).reshape(12, 12, GY - 1, GX - 1)

    # f64 Newton operator, matrix-free (exact; global layout)
    def res64(uu, pp):
        return physics.assemble_residual(
            uu, pp, phi_old, phi_oold, ca64, sc,
            dim=dim, with_split=with_split, monolithic=monolithic)

    _, jvp64 = jax.linearize(res64, u, phi)

    def op64_both(xu, xp):
        eu, ep = expand_update(xu, xp, con, active)
        ju, jp = jvp64(eu, ep)
        return condense_residual(-ju, -jp, con, active)

    # Galerkin coarse lattice matrices
    jacs = [jacL]
    for _ in range(n_levels - 1):
        jacs.insert(0, coarsen(jacs[0], P_embed))

    # lattice <-> global converters
    vp = vert_pos

    def to_lat(xg, k):
        if k == 1:
            X = jnp.zeros((GY * GX,), xg.dtype).at[vp].set(xg)
            return X.reshape(1, GY, GX)
        xm = xg.reshape(-1, k)
        X = jnp.zeros((GY * GX, k), xg.dtype).at[vp].set(xm)
        return jnp.moveaxis(X.reshape(GY, GX, k), -1, 0)

    def to_glob(X, k):
        if k == 1:
            return X.reshape(-1)[vp]
        Xf = jnp.moveaxis(X, 0, -1).reshape(-1, k)
        return Xf[vp].reshape(-1)

    # active set on the lattice (phi block)
    active_L = to_lat(active.astype(jnp.float32), 1) > 0.5
    eps64 = float(jnp.finfo(jnp.float64).eps)
    zero_u = jnp.zeros_like(rhs_u)
    zero_p = jnp.zeros_like(rhs_p)

    def block_solve(which, b):
        k = dim if which == "u" else 1
        lo, hi = (0, 8) if which == "u" else (8, 12)
        levels = _build_block_levels(jacs, dir_u, dir_p, GY, active_L,
                                     lo, hi, k, which)
        fin = levels[-1]
        M32 = make_vcycle(levels, lo, hi, k, degree=degree)
        op32 = _masked_mv(fin, lo, hi, k)
        if which == "u":
            op64 = lambda x: op64_both(x, zero_p)[0]
        else:
            op64 = lambda x: op64_both(zero_u, x)[1]
        bnorm = jnp.sqrt(jnp.vdot(b, b).real)
        target2 = jnp.maximum(rtol * bnorm, 100.0 * eps64 * bnorm) ** 2

        def one_pass(r0g, rr0):
            scale = jnp.sqrt(rr0)
            inv_scale = jnp.where(scale > 0, 1.0 / scale, 0.0)
            R0 = to_lat((r0g * inv_scale), k).astype(jnp.float32)
            R0 = jnp.where(fin.free, R0, 0.0)
            tol2 = jnp.asarray(
                jnp.maximum(jnp.maximum(rtol, 1e-5) ** 2,
                            jnp.where(rr0 > 0, target2 / rr0, 1.0)),
                jnp.float32)
            Z0 = M32(R0)

            def cond(s):
                X, R, Z, Pv, rz, kk, Xb, rrb = s
                return (rrb > tol2) & (kk < inner_max)

            def body(s):
                X, R, Z, Pv, rz, kk, Xb, rrb = s
                Ap = op32(Pv)
                denom = jnp.vdot(Pv, Ap)
                alpha = jnp.where(denom != 0, rz / denom, 0.0)
                X = X + alpha * Pv
                R = R - alpha * Ap
                rr = jnp.vdot(R, R).real
                better = rr < rrb
                Xb = jnp.where(better, X, Xb)
                rrb = jnp.where(better, rr, rrb)
                Z = M32(R)
                rz_new = jnp.vdot(R, Z)
                beta = jnp.where(rz != 0, rz_new / rz, 0.0)
                Pv = Z + beta * Pv
                return X, R, Z, Pv, rz_new, kk + 1, Xb, rrb

            s0 = (jnp.zeros_like(R0), R0, Z0, Z0, jnp.vdot(R0, Z0),
                  jnp.asarray(0), jnp.zeros_like(R0),
                  jnp.asarray(1.0, jnp.float32))
            s = jax.lax.while_loop(cond, body, s0)
            dx = to_glob(s[6].astype(jnp.float64), k) * scale
            return dx, s[5]

        def outer_body(carry):
            x_acc, r_cur, rr_cur, its, done = carry
            dx, kk = one_pass(r_cur, rr_cur)
            x_try = x_acc + dx
            r_try = b - op64(x_try)
            rr_try = jnp.vdot(r_try, r_try).real
            ok = jnp.isfinite(rr_try) & (rr_try < rr_cur)
            x_acc = jnp.where(ok, x_try, x_acc)
            r_cur = jnp.where(ok, r_try, r_cur)
            rr_new = jnp.where(ok, rr_try, rr_cur)
            done = (~ok) | (rr_new <= target2) | (rr_new > 0.25 * rr_cur)
            return x_acc, r_cur, rr_new, its + kk, done

        def outer_cond(carry):
            _, _, rr_cur, its, done = carry
            return (~done) & (rr_cur > target2)

        rr_b = jnp.vdot(b, b).real
        carry = (jnp.zeros_like(b), b, rr_b, jnp.asarray(0),
                 jnp.asarray(False))
        carry = outer_body(carry)
        for _ in range(passes - 1):
            carry = jax.lax.cond(outer_cond(carry), outer_body,
                                 lambda c: c, carry)
        x_acc, r_cur, rr_cur, its, _ = carry
        return x_acc, its, rr_cur

    du, it_u, rr_u = block_solve("u", rhs_u)
    rhs_p2 = rhs_p - op64_both(du, zero_p)[1]
    dp, it_p, rr_p = block_solve("p", rhs_p2)
    return du, dp, it_u + it_p, rr_u + rr_p
