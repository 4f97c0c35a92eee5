"""Tensor-grid monolattice solve path (solvers/lattice.py): layout
detection, lattice primitives vs their gather/scatter equivalents, and
the fused lattice solve vs the generic Galerkin solve."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cracks_tpu.solvers.lattice as lat
from cracks_tpu import meshio, problems
from cracks_tpu.config import Parameters
from cracks_tpu.mesh import Forest
from cracks_tpu.ops import physics


def _sneddon_sim(refine=3, precond="gmg"):
    from cracks_tpu.driver import Simulation
    p = Parameters(
        test_case="sneddon", pressure_expr="1.0e-3", G_c=1.0,
        poisson_ratio_nu=0.2, E_modulus=1.0, k_reg_expr="1e-8*h",
        eps_reg_expr="2.0*h", lower_bound_newton_residual=1e-7,
        max_no_newton_steps=50, max_no_line_search_steps=10,
        n_global_pre_refine=refine, n_local_pre_refine=0,
        n_refinement_cycles=0, max_no_timesteps=0, output_dir="",
        linear_solver="cg", preconditioner=precond, cg_rtol=1e-8,
        mixed_precision_cg=True)
    return Simulation(p, verbose=False)


def test_detect_tensor_grid():
    f = Forest(meshio.rect_mesh([-10, -10], [10, 10]))
    f.refine_global(2)
    mesh = f.extract()
    lay = lat.detect_tensor_grid(mesh)
    assert lay is not None
    assert lay.grid == (41, 41) and lay.seam is None
    # slit meshes (duplicated lip vertices) come back seam-glued
    import os
    from cracks_tpu.driver import MESH_DIR
    slit = meshio.read_ucd(os.path.join(MESH_DIR, "unit_slit.inp"), dim=2)
    fs = Forest(slit)
    fs.refine_global(2)
    lay_s = lat.detect_tensor_grid(fs.extract())
    assert lay_s is not None and lay_s.seam == lat.Seam(s=4, slit_lo=5)


def test_lattice_matvec_equals_assembled():
    f = Forest(meshio.rect_mesh([0, 0], [1, 1]))
    f.refine_global(2)
    mesh = f.extract()
    lay = lat.detect_tensor_grid(mesh)
    p = Parameters(test_case="sneddon", pressure_expr="1.0e-3",
                   G_c=1.0, poisson_ratio_nu=0.2, E_modulus=1.0)
    lam, mu = problems.cell_lame_fields(p, mesh, None)
    sc = physics.make_scalars(1e-3, 1e-8, 0.1, 1.0, 0.0, 1.0, 1.0, 0.0,
                              dtype=jnp.float32)
    caL = lat.permuted_cell_arrays(mesh, lam, mu, lay)
    ca = physics.build_cell_arrays(mesh, lam, mu, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    n_v = mesh.n_vertices
    u = jnp.asarray(rng.normal(size=n_v * 2), jnp.float32)
    phi = jnp.asarray(rng.uniform(0.2, 1.0, n_v), jnp.float32)
    kw = dict(dim=2, with_split=False, monolithic=False)
    jacL = physics.element_matrices(u, phi, phi, phi, caL, sc,
                                    cell_last=True, **kw)
    jacL = jacL.reshape((12, 12) + tuple(g - 1 for g in lay.grid))
    jac = physics.element_matrices(u, phi, phi, phi, ca, sc,
                                   cell_last=True, **kw)

    from cracks_tpu.solvers import assembled
    x = jnp.asarray(rng.normal(size=n_v * 2), jnp.float32)
    y_ref = assembled.matvec_uu(jac, ca, x, dim=2)
    X = lat._to_lat(x, jnp.asarray(lay.vert_pos), lay.grid, 2)
    Y = lat.matvec(jacL, X, 0, 8, 2)
    y = lat._to_glob(Y, jnp.asarray(lay.vert_pos), 2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)

    xp = jnp.asarray(rng.normal(size=n_v), jnp.float32)
    yp_ref = assembled.matvec_pp(jac, ca, xp, dim=2)
    Xp = lat._to_lat(xp, jnp.asarray(lay.vert_pos), lay.grid, 1)
    Yp = lat.matvec(jacL, Xp, 8, 12, 1)
    yp = lat._to_glob(Yp, jnp.asarray(lay.vert_pos), 1)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yp_ref),
                               rtol=2e-5, atol=2e-5)


def test_lattice_matvec_equals_assembled_3d():
    """3d octree-lattice matvec against the generic gather/scatter
    stored-matrix operator (reference treats 3d as first-class,
    cracks.cc:4648-4658)."""
    f = Forest(meshio.rect_mesh([0, 0, 0], [1, 1, 1], [1, 1, 1]))
    f.refine_global(2)
    mesh = f.extract()
    lay = lat.detect_tensor_grid(mesh)
    assert lay is not None and lay.grid == (5, 5, 5)
    p = Parameters(test_case="sneddon", pressure_expr="1.0e-3",
                   G_c=1.0, poisson_ratio_nu=0.2, E_modulus=1.0,
                   dimension=3)
    lam, mu = problems.cell_lame_fields(p, mesh, None)
    sc = physics.make_scalars(1e-3, 1e-8, 0.5, 1.0, 0.0, 1.0, 1.0, 0.0,
                              dtype=jnp.float32)
    caL = lat.permuted_cell_arrays(mesh, lam, mu, lay)
    ca = physics.build_cell_arrays(mesh, lam, mu, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    n_v = mesh.n_vertices
    u = jnp.asarray(rng.normal(size=n_v * 3), jnp.float32)
    phi = jnp.asarray(rng.uniform(0.2, 1.0, n_v), jnp.float32)
    kw = dict(dim=3, with_split=False, monolithic=False)
    jacL = physics.element_matrices(u, phi, phi, phi, caL, sc,
                                    cell_last=True, **kw)
    jacL = jacL.reshape((32, 32) + tuple(g - 1 for g in lay.grid))
    jac = physics.element_matrices(u, phi, phi, phi, ca, sc,
                                   cell_last=True, **kw)

    from cracks_tpu.solvers import assembled
    vp = jnp.asarray(lay.vert_pos)
    x = jnp.asarray(rng.normal(size=n_v * 3), jnp.float32)
    y_ref = assembled.matvec_uu(jac, ca, x, dim=3)
    Y = lat.matvec(jacL, lat._to_lat(x, vp, lay.grid, 3), 0, 24, 3)
    np.testing.assert_allclose(
        np.asarray(lat._to_glob(Y, vp, 3)), np.asarray(y_ref),
        rtol=2e-5, atol=2e-5)
    xp = jnp.asarray(rng.normal(size=n_v), jnp.float32)
    yp_ref = assembled.matvec_pp(jac, ca, xp, dim=3)
    Yp = lat.matvec(jacL, lat._to_lat(xp, vp, lay.grid, 1), 24, 32, 1)
    np.testing.assert_allclose(
        np.asarray(lat._to_glob(Yp, vp, 1)), np.asarray(yp_ref),
        rtol=2e-5, atol=2e-5)


def test_prolong_restrict_transpose():
    rng = np.random.default_rng(1)
    for grid_c, grid_f in (((9, 9), (17, 17)), ((5, 5, 5), (9, 9, 9))):
        for k in (1, 2):
            Xc = jnp.asarray(rng.normal(size=(k,) + grid_c))
            Yf = jnp.asarray(rng.normal(size=(k,) + grid_f))
            lhs = jnp.vdot(lat.prolong(Xc, grid_f, k), Yf)
            rhs = jnp.vdot(Xc, lat.restrict(Yf, k))
            assert float(abs(lhs - rhs)) < 1e-10 * float(abs(lhs) + 1)


def test_prolong_is_q1_embedding():
    """Prolongation must reproduce the exact multilinear interpolation
    of coarse nodal values (2d and 3d)."""
    rng = np.random.default_rng(2)
    for grid_c in ((5, 7), (3, 4, 5)):
        grid_f = tuple(2 * g - 1 for g in grid_c)
        dim = len(grid_c)
        Xc = rng.normal(size=(1,) + grid_c)
        Xf = np.asarray(lat.prolong(jnp.asarray(Xc), grid_f, 1))
        # even-index injection
        inj = Xf[(0,) + tuple(slice(None, None, 2) for _ in grid_c)]
        np.testing.assert_allclose(inj, Xc[0], atol=1e-14)
        # centers = mean of the 2^dim surrounding coarse nodes
        import itertools
        center = Xf[(0,) + tuple(slice(1, None, 2) for _ in grid_c)]
        acc = np.zeros_like(center)
        for o in itertools.product((0, 1), repeat=dim):
            sl = tuple(slice(o[j], grid_c[j] - 1 + o[j])
                       for j in range(dim))
            acc += Xc[(0,) + sl]
        np.testing.assert_allclose(center, acc / 2 ** dim, atol=1e-13)


def test_split_solve_matches_fused(monkeypatch):
    """The split-dispatch variant (bounded device executions for large
    problems) must reproduce the fused solve's statistics."""
    sim_f = _sneddon_sim()
    sim_f.run()
    assert sim_f.sys.lattice_hierarchy is not None
    monkeypatch.setattr(lat, "FUSED_SOLVE_MAX_DOFS", 0)
    sim_s = _sneddon_sim()
    sim_s.run()
    for colname in ("Bulk Energy", "Crack Energy"):
        a = sim_f.statistics.data[colname][-1]
        b = sim_s.statistics.data[colname][-1]
        assert b == pytest.approx(a, rel=1e-9), colname


def test_lattice_solve_matches_galerkin():
    """The fused lattice solve and the generic Galerkin fused solve are
    different implementations of the same algorithm; on one Sneddon
    load step they must produce the same statistics."""
    sim_l = _sneddon_sim()
    sim_l.run()
    assert sim_l.sys.lattice_hierarchy is not None
    bulk_l = sim_l.statistics.data["Bulk Energy"][-1]
    crack_l = sim_l.statistics.data["Crack Energy"][-1]

    sim_g = _sneddon_sim()
    # force the generic path by removing the lattice bundle
    import cracks_tpu.driver as drv
    orig = drv.Simulation.setup_system

    def patched(self):
        orig(self)
        self.sys.lattice_hierarchy = None
        self.sys.lattice_ca32 = None
        if self.sys.galerkin_hierarchy is None:
            from cracks_tpu.solvers import galerkin

            def dirichlet_fn(m):
                mu_, _, mp_, _ = problems.dirichlet_conditions(
                    self.p, m, 0.0, initial_step=False)
                return mu_, mp_
            self.sys.galerkin_hierarchy = galerkin.\
                build_galerkin_hierarchy(self.forest, self.mesh,
                                         dirichlet_fn)
    drv.Simulation.setup_system = patched
    try:
        sim_g = _sneddon_sim()
        sim_g.run()
        assert sim_g.sys.galerkin_hierarchy is not None
    finally:
        drv.Simulation.setup_system = orig
    bulk_g = sim_g.statistics.data["Bulk Energy"][-1]
    crack_g = sim_g.statistics.data["Crack Energy"][-1]
    assert bulk_l == pytest.approx(bulk_g, rel=1e-9)
    assert crack_l == pytest.approx(crack_g, rel=1e-9)


def test_iter_dist():
    """Staleness metric of the split-solve operator cache
    (lattice.py _iter_dist): zero for identical context, relative in u,
    absolute in the O(1)-scaled phase fields, relative in scalars."""
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.normal(size=16))
    phi = jnp.asarray(rng.uniform(0.2, 1.0, 8))
    sc = jnp.asarray([1.0, 2.0, 0.5])
    z = (u, phi, phi, phi, sc)
    assert float(lat._iter_dist(*z, *z)) == 0.0
    # relative displacement move
    d = float(lat._iter_dist(u * (1 + 1e-7), phi, phi, phi, sc, *z))
    assert d == pytest.approx(1e-7, rel=1e-2)
    # absolute phase-field move (phi has natural O(1) scale)
    d = float(lat._iter_dist(u, phi + 1e-4, phi, phi, sc, *z))
    assert d == pytest.approx(1e-4, rel=1e-6)
    # relative scalar move (e.g. the pressure ramp between time steps)
    sc2 = sc.at[0].set(1.0 + 1e-3)
    d = float(lat._iter_dist(u, phi, phi, phi, sc2, *z))
    assert d == pytest.approx(1e-3, rel=1e-6)


def test_split_solve_operator_reuse(monkeypatch):
    """Split-solve operators are reused while the Newton iterate stays
    within 1e-6 relative (the PDAS-tail regime) and rebuilt once it
    moves — and a reused-operator solve returns the identical update
    (lattice.py _solve_split cache; the reference's Jacobian-reuse idea,
    cracks.cc:3007)."""
    sim = _sneddon_sim(refine=3)
    state = sim.run()
    sys_ = sim.sys
    assert sys_.lattice_hierarchy is not None
    hier = sys_.lattice_hierarchy

    n_calls = {"prepare64": 0}
    orig_prepare64 = lat._prepare64

    def counting_prepare64(*a, **kw):
        n_calls["prepare64"] += 1
        return orig_prepare64(*a, **kw)

    monkeypatch.setattr(lat, "_prepare64", counting_prepare64)
    sys_._split_jac_cache = None  # start cold

    u, phi = state.u, state.phi
    phi_old, phi_oold = state.phi_old, state.phi_oold
    con = sys_.constraints(1.0)
    active = jnp.asarray(np.asarray(state.active_mask, dtype=bool))
    rng = np.random.default_rng(0)
    n_v = sim.mesh.n_vertices
    rhs_u = jnp.asarray(rng.normal(size=n_v * 2))
    rhs_p = jnp.asarray(rng.normal(size=n_v))

    du1, dp1, _ = lat._solve_split(sys_, hier, u, phi, phi_old,
                                   phi_oold, con, active, rhs_u, rhs_p,
                                   sys_.with_split)
    assert n_calls["prepare64"] == 1
    assert sys_._split_jac_cache is not None

    # same iterate -> cache hit, identical update
    du2, dp2, _ = lat._solve_split(sys_, hier, u, phi, phi_old,
                                   phi_oold, con, active, rhs_u, rhs_p,
                                   sys_.with_split)
    assert n_calls["prepare64"] == 1
    np.testing.assert_array_equal(np.asarray(du1), np.asarray(du2))
    np.testing.assert_array_equal(np.asarray(dp1), np.asarray(dp2))

    # tail-sized move (1e-8 << 1e-6) -> still a cache hit
    lat._solve_split(sys_, hier, u, phi + 1e-8, phi_old, phi_oold, con,
                     active, rhs_u, rhs_p, sys_.with_split)
    assert n_calls["prepare64"] == 1

    # real move (1e-3 > 1e-6) -> rebuild
    lat._solve_split(sys_, hier, u, phi + 1e-3, phi_old, phi_oold, con,
                     active, rhs_u, rhs_p, sys_.with_split)
    assert n_calls["prepare64"] == 2
