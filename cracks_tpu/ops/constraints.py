"""Constraint handling: hanging nodes, Dirichlet masks, active-set masks.

Replaces deal.II AffineConstraints (reference cracks.cc:1630-1642,
2439-2464): hanging-node constraints are (child, masters, weights) index
arrays applied as gathers/scatter-adds; Dirichlet and active-set
constraints are boolean masks per vertex/component.  All constraints in
the Newton update system are homogeneous (the reference's inhomogeneous
initial boundary values are written into the solution directly by
set_initial_bc, cracks.cc:2699-2707), so

 * distribute  == set children from masters, zero the masked dofs
 * distribute_local_to_global residual == scatter, then add each hanging
   child's residual row to its masters and zero the child
 * set_zero    == zero all constrained rows.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Constraints(NamedTuple):
    """Device-side constraint data.

    Vertex-based hanging constraints apply to every solution component.
    dirichlet masks are booleans marking constrained dofs (True = fixed).
    """

    hang_child: jax.Array     # (n_h,) int32
    hang_masters: jax.Array   # (n_h, 4) int32
    hang_weights: jax.Array   # (n_h, 4)
    dirichlet_u: jax.Array    # (n_v, dim) bool
    dirichlet_p: jax.Array    # (n_v,) bool


def make_constraints(mesh, dirichlet_u: np.ndarray, dirichlet_p: np.ndarray,
                     dtype=jnp.float64) -> Constraints:
    return Constraints(
        hang_child=jnp.asarray(mesh.hang_child, dtype=jnp.int32),
        hang_masters=jnp.asarray(mesh.hang_masters, dtype=jnp.int32),
        hang_weights=jnp.asarray(mesh.hang_weights, dtype=dtype),
        dirichlet_u=jnp.asarray(dirichlet_u, dtype=bool),
        dirichlet_p=jnp.asarray(dirichlet_p, dtype=bool),
    )


@jax.jit
def hanging_interpolate(x: jax.Array, con: Constraints) -> jax.Array:
    """Set hanging children to the interpolation of their masters
    (AffineConstraints::distribute for a vertex field of any shape
    (n_v,) or (n_v, k))."""
    if x.ndim == 1:
        vals = jnp.einsum("hm,hm->h", con.hang_weights, x[con.hang_masters])
    else:
        vals = jnp.einsum("hm,hmk->hk", con.hang_weights, x[con.hang_masters])
    return x.at[con.hang_child].set(vals)


@jax.jit
def hanging_transpose(r: jax.Array, con: Constraints) -> jax.Array:
    """Condense a residual: add each hanging child's row to its masters
    (weighted) and zero the child row — the effect of
    distribute_local_to_global with hanging-node constraints."""
    child_vals = r[con.hang_child]
    if r.ndim == 1:
        r = r.at[con.hang_masters].add(con.hang_weights * child_vals[:, None])
    else:
        r = r.at[con.hang_masters].add(
            con.hang_weights[:, :, None] * child_vals[:, None, :])
    return r.at[con.hang_child].set(0.0)


@jax.jit
def zero_constrained(ru, rp, con: Constraints, active: jax.Array):
    """constraints.set_zero on the (u, phi) residual pair; `active` is the
    active-set mask over phase-field vertices."""
    hang = jnp.zeros(rp.shape[0], dtype=bool).at[con.hang_child].set(True)
    ru = jnp.where(con.dirichlet_u | hang[:, None], 0.0, ru)
    rp = jnp.where(con.dirichlet_p | hang | active, 0.0, rp)
    return ru, rp


@jax.jit
def condense_residual(ru, rp, con: Constraints, active: jax.Array):
    """Full reduction of a raw assembled residual to the Newton system
    right-hand side: hanging condensation then zeroing of all
    constrained rows (cracks.cc:2442-2443 + set_zero 2918)."""
    ru = hanging_transpose(ru, con)
    rp = hanging_transpose(rp, con)
    return zero_constrained(ru, rp, con, active)


@jax.jit
def expand_update(du, dp, con: Constraints, active: jax.Array):
    """Map a free-dof update into the full space: zero constrained dofs,
    then interpolate hanging children (constraints.distribute on the
    homogeneous Newton update, cracks.cc:2756/2773)."""
    du, dp = zero_constrained(du, dp, con, active)
    du = hanging_interpolate(du, con)
    dp = hanging_interpolate(dp, con)
    return du, dp


def residual_norm(ru, rp) -> jax.Array:
    """l2 norm over the combined (u, phi) residual."""
    return jnp.sqrt(jnp.sum(ru * ru) + jnp.sum(rp * rp))


def residual_linfty(ru, rp) -> jax.Array:
    return jnp.maximum(jnp.max(jnp.abs(ru)), jnp.max(jnp.abs(rp)))
