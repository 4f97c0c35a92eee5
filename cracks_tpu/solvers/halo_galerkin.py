"""Pooled (sharded-DoF) Galerkin multigrid over the owned+ghost halo
partition: the production preconditioner of the halo sharded mode
(solvers/halo_newton) — the same element-RAP coefficient-exact GMG as
solvers/galerkin.py, with every level's vectors, gathers and hanging
stencils living in per-shard local pools so all traffic is the
partition surface.

Stage layout (built incrementally):
  build_pooled_hierarchy(...)  -> per-level pooled partitions + maps
  build_solver(...)            -> the split-dispatch pooled solve
Until the pooled hierarchy lands, build_pooled_hierarchy returns None
and halo_newton falls back to its Jacobi block CG.
"""

from __future__ import annotations


def build_pooled_hierarchy(forest, fine_mesh, sys, part):
    """Pooled GMG hierarchy (None => halo_newton uses Jacobi CG)."""
    return None


def build_solver(sys, mesh, part, hier, *, dim, with_split):
    raise NotImplementedError("pooled Galerkin solver not built yet")
