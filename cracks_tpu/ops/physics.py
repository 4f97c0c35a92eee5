"""The quasi-monolithic phase-field fracture element kernel.

Replaces the reference's ``assemble_system`` cell loop
(cracks.cc:2129-2498) with batched dense tensor math over
``(n_cells, ...)`` arrays — the natural TPU formulation — and obtains
the Newton system *matrix-free*: the reference's hand-assembled Jacobian
(cracks.cc:2308-2389) is exactly the derivative of its residual form
(cracks.cc:2393-2430), so the Jacobian action here is ``jax.jvp`` of the
residual and the element matrices (for the direct solver path) are
``jax.jacfwd`` of the per-cell residual.

Weak form being discretized (notation of Heister/Wheeler/Wick 2015):

  displacement rows:
      ((1-k) pf_extra^2 + k) sigma+(u) : grad(v)
      + chi_rhs * sigma-(u) : grad(v)
      - (alpha_b - 1) p pf_extra^2 div(v)                [cracks.cc:2404-2410]
  phase-field rows:
      gamma/dt/h^2 max(0, pf - pf_old) w                 [penalized monolithic]
      + (1-k) (sigma+(u) : E(u)) pf w
      - G_c/eps (1 - pf) w
      + G_c eps grad(pf) . grad(w)
      - 2 (alpha_b - 1) p pf div(u) w                    [cracks.cc:2419-2429]

with pf_extra the clamped theta-extrapolation of the two previous time
steps (cracks.cc:2262-2277), alpha_b (Biot) = 0 in all shipped cases
(cracks.cc:1497).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fem import element_tables
from .spectral import full_stress, stress_split_2d

ALPHA_BIOT = 0.0  # reference cracks.cc:1497


class CellArrays(NamedTuple):
    """Static per-mesh element data resident on device."""

    c2v: jax.Array        # (n_c, nvc) int32 — cell -> vertex gather map
    JxW: jax.Array        # (n_c, n_q)
    grads: jax.Array      # (n_c, n_q, nvc, dim) real-space shape grads
    shape_v: jax.Array    # (n_q, nvc)
    lam: jax.Array        # (n_c,) per-cell Lame lambda
    mu: jax.Array         # (n_c,) per-cell Lame mu
    inv_diam2: jax.Array  # (n_c,) 1/diameter^2 (gamma penalization scaling)


class Scalars(NamedTuple):
    """Per-solve scalars (traced; no recompilation when they change)."""

    pressure: jax.Array        # current pressure p(time)
    constant_k: jax.Array      # regularization k
    alpha_eps: jax.Array       # regularization eps
    G_c: jax.Array             # fracture toughness
    gamma_dt: jax.Array        # gamma_penal / timestep
    theta: jax.Array           # (dt_old + dt_oold)/dt_oold extrapolation factor
    use_old_pf: jax.Array      # 1.0 -> pf_extra := pf_old (retry mode)
    decompose_rhs: jax.Array   # chi for sigma- in the residual


def make_scalars(pressure, constant_k, alpha_eps, G_c, gamma_dt, theta,
                 use_old_pf, decompose_rhs, dtype=jnp.float64) -> Scalars:
    c = lambda v: jnp.asarray(v, dtype=dtype)
    return Scalars(c(pressure), c(constant_k), c(alpha_eps), c(G_c),
                   c(gamma_dt), c(theta), c(use_old_pf), c(decompose_rhs))


def _straight_through_clamp_below(x):
    """max(0, x) in the residual, identity in the linearization.

    The penalized-monolithic mode clamps pf values (cracks.cc:2251-2256)
    but the reference's hand Jacobian linearizes as if d(clamp)/d(pf)=1,
    so the tangent must pass straight through."""
    return x + jax.lax.stop_gradient(jnp.maximum(0.0, x) - x)


def _qpoint_fields(u_e, phi_e, pf_old_e, pf_oold_e, ca: CellArrays):
    """Interpolate solution fields to quadrature points (batched)."""
    grad_u = jnp.einsum("cad,cqae->cqde", u_e, ca.grads)
    pf = jnp.einsum("qa,ca->cq", ca.shape_v, phi_e)
    grad_pf = jnp.einsum("ca,cqad->cqd", phi_e, ca.grads)
    pf_old = jnp.einsum("qa,ca->cq", ca.shape_v, pf_old_e)
    pf_oold = jnp.einsum("qa,ca->cq", ca.shape_v, pf_oold_e)
    return grad_u, pf, grad_pf, pf_old, pf_oold


def _pf_extra(pf, pf_old, pf_oold, sc: Scalars):
    """Time-lagged extrapolated phase field (cracks.cc:2262-2277)."""
    extra = pf_oold + sc.theta * (pf_old - pf_oold)
    extra = jnp.clip(extra, 0.0, 1.0)
    return jnp.where(sc.use_old_pf > 0.5, pf_old, extra)


@partial(jax.jit, static_argnames=("dim", "with_split", "monolithic"))
def assemble_residual(u, phi, phi_old, phi_oold, ca: CellArrays, sc: Scalars,
                      *, dim: int, with_split: bool, monolithic: bool):
    """Global Newton right-hand side (the *negative* residual, matching the
    reference's local_rhs sign convention, cracks.cc:2404/2423).

    Returns (ru (n_v, dim), rp (n_v,)) — raw scatter-add, no constraints.
    """
    u_e = u[ca.c2v]
    phi_e = phi[ca.c2v]
    pf_old_e = phi_old[ca.c2v]
    pf_oold_e = phi_oold[ca.c2v]

    grad_u, pf, grad_pf, pf_old, pf_oold = _qpoint_fields(
        u_e, phi_e, pf_old_e, pf_oold_e, ca)

    if monolithic:
        pf = _straight_through_clamp_below(pf)
        pf_old = jnp.maximum(0.0, pf_old)
        pf_oold = jnp.maximum(0.0, pf_oold)

    pf_extra = _pf_extra(pf, pf_old, pf_oold, sc)

    E = 0.5 * (grad_u + jnp.swapaxes(grad_u, -1, -2))
    div_u = jnp.trace(grad_u, axis1=-2, axis2=-1)

    lam_q = ca.lam[:, None]
    mu_q = ca.mu[:, None]
    if with_split:
        sp, sm = stress_split_2d(E, lam_q, mu_q)
    else:
        sp = full_stress(E, lam_q, mu_q)
        sm = jnp.zeros_like(sp)

    degr = (1.0 - sc.constant_k) * pf_extra**2 + sc.constant_k   # (c,q)
    M = degr[..., None, None] * sp + sc.decompose_rhs * sm       # (c,q,d,e)
    p_term = (ALPHA_BIOT - 1.0) * sc.pressure * pf_extra**2       # (c,q)

    # displacement rows: -[ M : grad(v) - p_term div(v) ]
    ru_e = -(jnp.einsum("cqde,cqae,cq->cad", M, ca.grads, ca.JxW)
             - jnp.einsum("cq,cqad,cq->cad", p_term, ca.grads, ca.JxW))

    # phase-field rows
    sp_E = jnp.einsum("cqde,cqde->cq", sp, E)
    gap_plus = jnp.where(pf - pf_old < 0.0, 0.0, pf - pf_old)
    S = (sc.gamma_dt * ca.inv_diam2[:, None] * gap_plus
         + (1.0 - sc.constant_k) * sp_E * pf
         - sc.G_c / sc.alpha_eps * (1.0 - pf)
         - 2.0 * (ALPHA_BIOT - 1.0) * sc.pressure * pf * div_u)
    rp_e = -(jnp.einsum("cq,qa,cq->ca", S, ca.shape_v, ca.JxW)
             + sc.G_c * sc.alpha_eps
             * jnp.einsum("cqd,cqad,cq->ca", grad_pf, ca.grads, ca.JxW))

    n_v = u.shape[0]
    ru = jnp.zeros((n_v, dim), dtype=u.dtype).at[ca.c2v].add(ru_e)
    rp = jnp.zeros((n_v,), dtype=u.dtype).at[ca.c2v].add(rp_e)
    return ru, rp


@partial(jax.jit, static_argnames=("dim", "with_split", "monolithic"))
def jacobian_vector_product(u, phi, du, dphi, phi_old, phi_oold,
                            ca: CellArrays, sc: Scalars,
                            *, dim: int, with_split: bool, monolithic: bool):
    """Action of the Newton system matrix J = -d(rhs)/d(u,phi) on (du, dphi).

    Equals the reference's assembled matrix-vector product
    (cracks.cc:2308-2389) because that matrix is the exact derivative of
    the residual form (see module docstring)."""
    f = lambda uu, pp: assemble_residual(
        uu, pp, phi_old, phi_oold, ca, sc,
        dim=dim, with_split=with_split, monolithic=monolithic)
    _, (dru, drp) = jax.jvp(f, (u, phi), (du, dphi))
    return -dru, -drp


def _single_cell_residual(u_e, phi_e, pf_old_e, pf_oold_e, JxW, grads,
                          shape_v, lam, mu, inv_diam2, sc: Scalars,
                          *, dim, with_split, monolithic):
    """Same physics for one cell (used under vmap/jacfwd for the element
    matrices of the direct solver path)."""
    ca1 = CellArrays(
        c2v=None, JxW=JxW[None], grads=grads[None], shape_v=shape_v,
        lam=lam[None], mu=mu[None], inv_diam2=inv_diam2[None])
    u1 = u_e[None]
    phi1 = phi_e[None]
    grad_u, pf, grad_pf, pf_old, pf_oold = _qpoint_fields(
        u1, phi1, pf_old_e[None], pf_oold_e[None], ca1)
    if monolithic:
        pf = _straight_through_clamp_below(pf)
        pf_old = jnp.maximum(0.0, pf_old)
        pf_oold = jnp.maximum(0.0, pf_oold)
    pf_extra = _pf_extra(pf, pf_old, pf_oold, sc)
    E = 0.5 * (grad_u + jnp.swapaxes(grad_u, -1, -2))
    div_u = jnp.trace(grad_u, axis1=-2, axis2=-1)
    if with_split:
        sp, sm = stress_split_2d(E, ca1.lam[:, None], ca1.mu[:, None])
    else:
        sp = full_stress(E, ca1.lam[:, None], ca1.mu[:, None])
        sm = jnp.zeros_like(sp)
    degr = (1.0 - sc.constant_k) * pf_extra**2 + sc.constant_k
    M = degr[..., None, None] * sp + sc.decompose_rhs * sm
    p_term = (ALPHA_BIOT - 1.0) * sc.pressure * pf_extra**2
    ru_e = -(jnp.einsum("cqde,cqae,cq->cad", M, ca1.grads, ca1.JxW)
             - jnp.einsum("cq,cqad,cq->cad", p_term, ca1.grads, ca1.JxW))
    sp_E = jnp.einsum("cqde,cqde->cq", sp, E)
    gap_plus = jnp.where(pf - pf_old < 0.0, 0.0, pf - pf_old)
    S = (sc.gamma_dt * ca1.inv_diam2[:, None] * gap_plus
         + (1.0 - sc.constant_k) * sp_E * pf
         - sc.G_c / sc.alpha_eps * (1.0 - pf)
         - 2.0 * (ALPHA_BIOT - 1.0) * sc.pressure * pf * div_u)
    rp_e = -(jnp.einsum("cq,qa,cq->ca", S, ca1.shape_v, ca1.JxW)
             + sc.G_c * sc.alpha_eps
             * jnp.einsum("cqd,cqad,cq->ca", grad_pf, ca1.grads, ca1.JxW))
    return ru_e[0], rp_e[0]


@partial(jax.jit, static_argnames=("dim", "with_split", "monolithic"))
def element_matrices(u, phi, phi_old, phi_oold, ca: CellArrays, sc: Scalars,
                     *, dim: int, with_split: bool, monolithic: bool):
    """Dense element Jacobians J_loc = -d(rhs_loc)/d(x_loc) for every cell.

    Local dof ordering: [u(vertex0,d0..), ..., u(vertexN,..), phi(vertex0..)]
    i.e. u dofs (nvc*dim, vertex-major) followed by nvc phi dofs.
    Returns (n_cells, ndl, ndl)."""
    nvc = ca.c2v.shape[1]
    ndl = nvc * (dim + 1)

    def local(x, pf_old_e, pf_oold_e, JxW, grads, lam, mu, invd2):
        u_e = x[: nvc * dim].reshape(nvc, dim)
        phi_e = x[nvc * dim:]
        ru, rp = _single_cell_residual(
            u_e, phi_e, pf_old_e, pf_oold_e, JxW, grads, ca.shape_v,
            lam, mu, invd2, sc,
            dim=dim, with_split=with_split, monolithic=monolithic)
        return -jnp.concatenate([ru.reshape(-1), rp])

    x_all = jnp.concatenate(
        [u[ca.c2v].reshape(-1, nvc * dim), phi[ca.c2v]], axis=1)
    jac = jax.vmap(jax.jacfwd(local))(
        x_all, phi_old[ca.c2v], phi_oold[ca.c2v], ca.JxW, ca.grads,
        ca.lam, ca.mu, ca.inv_diam2)
    assert jac.shape[-1] == ndl
    return jac


@partial(jax.jit, static_argnames=("dim", "with_split", "monolithic"))
def jacobian_diagonal(u, phi, phi_old, phi_oold, ca: CellArrays, sc: Scalars,
                      *, dim: int, with_split: bool, monolithic: bool):
    """Global diagonal of J (for Jacobi preconditioning of CG)."""
    nvc = ca.c2v.shape[1]
    jac = element_matrices(u, phi, phi_old, phi_oold, ca, sc,
                           dim=dim, with_split=with_split,
                           monolithic=monolithic)
    d_loc = jnp.diagonal(jac, axis1=-2, axis2=-1)   # (n_c, ndl)
    du_loc = d_loc[:, : nvc * dim].reshape(-1, nvc, dim)
    dp_loc = d_loc[:, nvc * dim:]
    n_v = u.shape[0]
    du = jnp.zeros((n_v, dim), dtype=u.dtype).at[ca.c2v].add(du_loc)
    dp = jnp.zeros((n_v,), dtype=u.dtype).at[ca.c2v].add(dp_loc)
    return du, dp


def build_cell_arrays(mesh, lam, mu, dtype=jnp.float64) -> CellArrays:
    """Precompute the per-cell geometry tables for a MeshData."""
    from ..fem import cell_geometry

    t = element_tables(mesh.dim)
    JxW, grads = cell_geometry(mesh.cell_coords, t)
    n_c = mesh.n_cells
    lam_arr = np.broadcast_to(np.asarray(lam, dtype=np.float64), (n_c,))
    mu_arr = np.broadcast_to(np.asarray(mu, dtype=np.float64), (n_c,))
    return CellArrays(
        c2v=jnp.asarray(mesh.cell2vert, dtype=jnp.int32),
        JxW=jnp.asarray(JxW, dtype=dtype),
        grads=jnp.asarray(grads, dtype=dtype),
        shape_v=jnp.asarray(t.shape_v, dtype=dtype),
        lam=jnp.asarray(lam_arr, dtype=dtype),
        mu=jnp.asarray(mu_arr, dtype=dtype),
        inv_diam2=jnp.asarray(1.0 / mesh.diameters**2, dtype=dtype),
    )
