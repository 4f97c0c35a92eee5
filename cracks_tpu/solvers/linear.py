"""Linear solvers for the Newton systems.

Two paths, mirroring the reference's solve() (cracks.cc:2744-2777):

 * direct — assemble the element Jacobians on device (batched dense
   jacfwd, ops/physics.element_matrices), reduce with the constraint
   matrix on the host and factorize with SuperLU.  This replaces
   Trilinos Amesos SolverDirect (cracks.cc:2750-2758) and is exact, so
   it also serves as the correctness oracle for the matrix-free path.

 * cg — matrix-free block-triangular solve.  The quasi-monolithic
   Jacobian is block *lower* triangular (displacement rows do not couple
   to phase-field columns because pf_extra is extrapolated,
   cracks.cc:2353-2366), so instead of GMRES on the monolithic system
   (cracks.cc:2762-2771) we solve A_uu du = b_u and then
   A_pp dpf = b_p - B du with two preconditioned CG iterations — both
   blocks are symmetric positive definite on the free dofs.  Dot
   products reduce over ICI when sharded (parallel/).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from ..ops import physics
from ..ops.constraints import (Constraints, condense_residual, expand_update)


# ---------------------------------------------------------------------------
# direct path
# ---------------------------------------------------------------------------

def _global_dof_ids(c2v: np.ndarray, dim: int, n_v: int) -> np.ndarray:
    """Per-cell global dof ids in the local ordering of
    ops.physics.element_matrices: u dofs vertex-major, then pf dofs.
    Global numbering: u dof = vertex*dim + comp; pf dof = n_v*dim + vertex."""
    n_c, nvc = c2v.shape
    u_ids = (c2v[:, :, None] * dim + np.arange(dim)[None, None, :]).reshape(n_c, -1)
    p_ids = n_v * dim + c2v
    return np.concatenate([u_ids, p_ids], axis=1)


def _constraint_matrix(con: Constraints, active: np.ndarray, n_v: int,
                       dim: int) -> sp.csr_matrix:
    """C such that x_full = C x_free resolves hanging nodes and zeroes
    Dirichlet/active dofs (homogeneous constraints)."""
    n_dofs = n_v * (dim + 1)
    hang_child = np.asarray(con.hang_child)
    hang_masters = np.asarray(con.hang_masters)
    hang_weights = np.asarray(con.hang_weights)
    dir_u = np.asarray(con.dirichlet_u)
    dir_p = np.asarray(con.dirichlet_p)

    constrained = np.zeros(n_dofs, dtype=bool)
    for d in range(dim):
        constrained[np.where(dir_u[:, d])[0] * dim + d] = True
    constrained[n_v * dim + np.where(dir_p | active)[0]] = True
    hang_mask = np.zeros(n_v, dtype=bool)
    hang_mask[hang_child] = True
    for d in range(dim):
        constrained[np.where(hang_mask)[0] * dim + d] = True
    constrained[n_v * dim + np.where(hang_mask)[0]] = True

    rows, cols, vals = [], [], []
    free = np.where(~constrained)[0]
    rows.append(free)
    cols.append(free)
    vals.append(np.ones(len(free)))
    # hanging rows (only where not otherwise constrained to zero);
    # note: deal.II's merge makes hanging constraints win over Dirichlet
    # lines for the child (cracks.cc:1640, 2910), so children interpolate
    # from masters; masters that are Dirichlet carry zero updates anyway.
    for d in range(dim):
        child_dofs = hang_child * dim + d
        for m in range(hang_masters.shape[1]):
            rows.append(child_dofs)
            cols.append(hang_masters[:, m] * dim + d)
            vals.append(hang_weights[:, m])
    child_p = n_v * dim + hang_child
    for m in range(hang_masters.shape[1]):
        rows.append(child_p)
        cols.append(n_v * dim + hang_masters[:, m])
        vals.append(hang_weights[:, m])

    C = sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(n_dofs, n_dofs)).tocsr()
    # Resolve constraint chains the way AffineConstraints::close() does:
    # a hanging child whose master is itself constrained (Dirichlet or
    # active) interpolates a zero from it in the homogeneous update
    # space, so constrained *columns* must be dropped.  (Without this,
    # C^T A C has spurious entries in constrained rows and the
    # distributed update violates the hanging constraints whenever an
    # active-set dof is a hanging master — which stalls Newton.)
    free_diag = sp.diags((~constrained).astype(np.float64))
    C = (C @ free_diag).tocsr()
    return C, constrained


def solve_direct(u, phi, phi_old, phi_oold, ca: physics.CellArrays,
                 sc: physics.Scalars, con: Constraints, active,
                 rhs_u, rhs_p, *, dim: int, with_split: bool,
                 monolithic: bool):
    """Exact sparse solve of the reduced Newton system.

    Returns (du (n_v, dim), dp (n_v,)) with constraints distributed."""
    n_v = u.shape[0]
    jac = np.asarray(physics.element_matrices(
        u, phi, phi_old, phi_oold, ca, sc,
        dim=dim, with_split=with_split, monolithic=monolithic))
    gids = _global_dof_ids(np.asarray(ca.c2v), dim, n_v)
    n_c, ndl = gids.shape
    rows = np.repeat(gids, ndl, axis=1).ravel()
    cols = np.tile(gids, (1, ndl)).ravel()
    n_dofs = n_v * (dim + 1)
    A = sp.coo_matrix((jac.ravel(), (rows, cols)),
                      shape=(n_dofs, n_dofs)).tocsr()

    C, constrained = _constraint_matrix(con, np.asarray(active), n_v, dim)
    A_red = (C.T @ A @ C).tolil()
    cidx = np.where(constrained)[0]
    A_red[cidx, cidx] = 1.0
    A_red = A_red.tocsc()

    b = np.concatenate([np.asarray(rhs_u).ravel(), np.asarray(rhs_p)])
    # rhs is already condensed+zeroed; but reduce again for safety:
    x = spla.splu(A_red).solve(b)
    x = C @ x
    du = x[: n_v * dim].reshape(n_v, dim)
    dp = x[n_v * dim:]
    return jnp.asarray(du), jnp.asarray(dp), 1


# ---------------------------------------------------------------------------
# matrix-free CG path
# ---------------------------------------------------------------------------

class CGResult(NamedTuple):
    x_u: jax.Array
    x_p: jax.Array
    iters_u: jax.Array
    iters_p: jax.Array


def _pcg(op: Callable, b, Minv, rtol, atol, maxiter):
    """Preconditioned conjugate gradients on a pytree vector space."""
    dot = lambda a, c: sum(jnp.vdot(x, y) for x, y in
                           zip(jax.tree_util.tree_leaves(a),
                               jax.tree_util.tree_leaves(c)))
    x0 = jax.tree_util.tree_map(jnp.zeros_like, b)
    r0 = b
    z0 = jax.tree_util.tree_map(lambda m, r: m * r, Minv, r0)
    bnorm = jnp.sqrt(dot(b, b).real)
    tol2 = jnp.maximum(rtol * bnorm, atol) ** 2

    def cond(state):
        x, r, z, p, rz, k = state
        return (dot(r, r).real > tol2) & (k < maxiter)

    def body(state):
        x, r, z, p, rz, k = state
        Ap = op(p)
        alpha = rz / dot(p, Ap)
        x = jax.tree_util.tree_map(lambda xx, pp: xx + alpha * pp, x, p)
        r = jax.tree_util.tree_map(lambda rr, aa: rr - alpha * aa, r, Ap)
        z = jax.tree_util.tree_map(lambda m, rr: m * rr, Minv, r)
        rz_new = dot(r, z)
        beta = rz_new / rz
        p = jax.tree_util.tree_map(lambda zz, pp: zz + beta * pp, z, p)
        return x, r, z, p, rz_new, k + 1

    state = (x0, r0, z0, z0, dot(r0, z0), jnp.asarray(0))
    x, r, z, p, rz, k = jax.lax.while_loop(cond, body, state)
    return x, k


@partial(jax.jit, static_argnames=("dim", "with_split", "monolithic",
                                   "maxiter"))
def solve_cg_block(u, phi, phi_old, phi_oold, ca: physics.CellArrays,
                   sc: physics.Scalars, con: Constraints, active,
                   rhs_u, rhs_p, diag_u, diag_p, rtol, atol,
                   *, dim: int, with_split: bool, monolithic: bool,
                   maxiter: int):
    """Block-triangular matrix-free solve (see module docstring).

    diag_u/diag_p: Jacobi preconditioner diagonals (raw Jacobian diag;
    entries at constrained dofs are ignored).
    Returns (du, dp, iters) with constraints distributed."""
    zero_p = jnp.zeros_like(phi)
    zero_u = jnp.zeros_like(u)

    def jv(du, dp):
        eu, ep = expand_update(du, dp, con, active)
        ju, jp = physics.jacobian_vector_product(
            u, phi, eu, ep, phi_old, phi_oold, ca, sc,
            dim=dim, with_split=with_split, monolithic=monolithic)
        return condense_residual(ju, jp, con, active)

    hang = jnp.zeros(phi.shape[0], dtype=bool).at[con.hang_child].set(True)
    free_u = ~(con.dirichlet_u | hang[:, None])
    free_p = ~(con.dirichlet_p | hang | active)
    Minv_u = jnp.where(free_u & (jnp.abs(diag_u) > 0), 1.0 / diag_u, 1.0)
    Minv_p = jnp.where(free_p & (jnp.abs(diag_p) > 0), 1.0 / diag_p, 1.0)

    # u block
    op_u = lambda du: jv(du, zero_p)[0]
    du, it_u = _pcg(op_u, rhs_u, Minv_u, rtol, atol, maxiter)

    # coupling: b_p' = rhs_p - B du
    _, b_coupled = jv(du, zero_p)
    rhs_p2 = rhs_p - b_coupled

    op_p = lambda dp: jv(zero_u, dp)[1]
    dp, it_p = _pcg(op_p, rhs_p2, Minv_p, rtol, atol, maxiter)

    du, dp = expand_update(du, dp, con, active)
    return du, dp, it_u + it_p
