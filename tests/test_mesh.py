import numpy as np
import pytest

from cracks_tpu.fem import cell_geometry, element_tables, lumped_mass_diag
from cracks_tpu.mesh import Forest
from cracks_tpu.meshio import read_msh, read_ucd, rect_mesh
import os
from tests import regression

UNIT_SLIT = os.path.join(regression.MESH_DIR, "unit_slit.inp")
UNIT_SQUARE_4 = os.path.join(regression.MESH_DIR, "unit_square_4.inp")
UNIT_CUBE_10 = os.path.join(regression.MESH_DIR, "unit_cube_10.inp")
THREEPOINT = os.path.join(regression.MESH_DIR, "threepoint.msh")


# ---------------------------------------------------------------------------
# coarse mesh readers
# ---------------------------------------------------------------------------

def test_rect_mesh_2d():
    m = rect_mesh([-10, -10], [10, 10])
    assert m.n_cells == 100
    assert m.n_vertices == 121
    # colorized boundary: 4 sides with 10 edges each
    ids = list(m.boundary_ids.values())
    assert sorted(set(ids)) == [0, 1, 2, 3]
    assert len(ids) == 40


def test_rect_mesh_3d():
    m = rect_mesh([-10, -10, -10], [10, 10, 10])
    assert m.n_cells == 1000
    assert m.n_vertices == 11 ** 3
    assert sorted(set(m.boundary_ids.values())) == [0, 1, 2, 3, 4, 5]


def test_read_unit_slit():
    m = read_ucd(UNIT_SLIT, dim=2)
    assert m.n_cells == 4
    assert m.n_vertices == 10
    # two coincident but distinct vertices form the slit at (1, 0.5)
    coords = [tuple(v) for v in np.round(m.vertices, 12)]
    assert coords.count((1.0, 0.5)) == 2
    # boundary ids: top edges are 3, slit lips are 7 (upper) and 4 (lower)
    assert 3 in m.boundary_ids.values()
    assert 4 in m.boundary_ids.values()
    assert 7 in m.boundary_ids.values()


def test_read_unit_cube():
    m = read_ucd(UNIT_CUBE_10, dim=3)
    assert m.n_cells == 1
    assert m.n_vertices == 8
    assert len(m.boundary_ids) == 6


def test_read_threepoint_msh():
    m = read_msh(THREEPOINT, dim=2)
    # reference threepoint_1 run reports Cells: 280, DoFs: 975
    assert m.n_cells == 280
    assert m.n_vertices == 325


# ---------------------------------------------------------------------------
# forest
# ---------------------------------------------------------------------------

def test_uniform_refinement_counts():
    forest = Forest(rect_mesh([0, 0], [1, 1], [1, 1]))
    forest.refine_global(3)
    md = forest.extract()
    assert md.n_cells == 64
    assert md.n_vertices == 81
    assert len(md.hang_child) == 0
    assert md.min_cell_diameter == pytest.approx(np.sqrt(2) / 8)


def test_sneddon_mesh_matches_reference_dof_count():
    # reference sneddon 2d: rect -10..10, 10x10 cells, no global prerefine:
    # DoFs: 242 solid + 121 phase = 363 (tests/sneddon_2d_1.output:5)
    forest = Forest(rect_mesh([-10, -10], [10, 10]))
    md = forest.extract()
    assert md.n_vertices == 121
    assert md.n_dofs == 363
    assert md.min_cell_diameter == pytest.approx(2 * np.sqrt(2))


def test_slit_stays_open_under_refinement():
    forest = Forest(read_ucd(UNIT_SLIT, dim=2))
    forest.refine_global(2)
    md = forest.extract()
    assert md.n_cells == 64
    # a 9x9 grid would have 81 vertices; the slit duplicates the 4
    # vertices along x in (0.5, 1.0] at y=0.5 => 81 + 4
    assert md.n_vertices == 85
    # miehe_shear_2: 3 global refinements -> 891 dofs = 297 vertices * 3
    forest2 = Forest(read_ucd(UNIT_SLIT, dim=2))
    forest2.refine_global(3)
    md2 = forest2.extract()
    assert md2.n_dofs == 891


def test_hanging_nodes_single_refined_cell():
    forest = Forest(rect_mesh([0, 0], [2, 1], [2, 1]))
    flags = np.array([True, False])
    flags = forest.balance_flags(flags)
    assert flags.tolist() == [True, False]  # 1-level difference is fine
    forest.execute_refinement(flags)
    md = forest.extract()
    assert md.n_cells == 5
    # vertices: 6 original + 5 new (edge midpoints + center) = 11
    assert md.n_vertices == 11
    # exactly one hanging node: midpoint of the shared edge
    assert len(md.hang_child) == 1
    child = md.hang_child[0]
    assert np.allclose(md.vert_coords[child], [1.0, 0.5])
    masters = md.hang_masters[0]
    mc = md.vert_coords[masters]
    got = (md.hang_weights[0][:, None] * mc).sum(0)
    assert np.allclose(got, [1.0, 0.5])


def test_balance_two_levels():
    forest = Forest(rect_mesh([0, 0], [2, 1], [2, 1]))
    forest.execute_refinement(np.array([True, False]))
    md = forest.extract()
    # refine the refined cell adjacent to the coarse one twice more;
    # balance must ripple into the coarse cell
    flags = np.zeros(forest.n_cells, dtype=bool)
    # pick the child touching x=1 at the top right of the left cell
    for i in range(forest.n_cells):
        if forest.level[i] == 1:
            flags[i] = True
    flags = forest.balance_flags(flags)
    forest.execute_refinement(flags)
    # now left cell is at level 2 everywhere, right cell still level 0:
    # violates 2:1 -> next refinement of any level-2 cell adjacent to the
    # right cell must force the right cell to refine
    md = forest.extract()
    lvl_right = forest.level[forest.root == 1]
    assert (lvl_right >= 1).all(), "balance must have refined the right root"


def test_balance_corner_adjacency():
    # refine one cell of a 2x2 grid twice; the diagonally-adjacent cell
    # must end at level >= 1 (corner balance)
    forest = Forest(rect_mesh([0, 0], [2, 2], [2, 2]))
    flags = np.zeros(4, dtype=bool)
    flags[0] = True
    forest.execute_refinement(forest.balance_flags(flags))
    flags = np.array([forest.level[i] == 1 and
                      tuple(forest.anchor[i]) == (0, 0)
                      for i in range(forest.n_cells)])
    # cell at the very corner (0,0) level 1 -> refine to level 2
    flags = forest.balance_flags(flags)
    forest.execute_refinement(flags)
    # full balance: any two touching cells differ by <= 1 level
    md = forest.extract()
    # check via hanging structure: every hanging master must not be hanging
    hmask = md.hanging_mask()
    assert not hmask[md.hang_masters].any()


def test_solution_transfer_linear_exactness():
    forest = Forest(rect_mesh([0, 0], [1, 1], [2, 2]))
    md = forest.extract()
    f = 2.0 * md.vert_coords[:, 0] - 3.0 * md.vert_coords[:, 1] + 0.5
    flags = np.zeros(forest.n_cells, dtype=bool)
    flags[0] = True
    new_md, (f2,), nref = forest.refine_and_transfer(flags, md, [f])
    assert nref == 1
    expect = 2.0 * new_md.vert_coords[:, 0] - 3.0 * new_md.vert_coords[:, 1] + 0.5
    assert np.allclose(f2, expect)


def test_transfer_vector_field():
    forest = Forest(rect_mesh([0, 0], [1, 1], [2, 2]))
    md = forest.extract()
    u = np.stack([md.vert_coords[:, 0], md.vert_coords[:, 1] * 2], axis=1)
    flags = np.ones(forest.n_cells, dtype=bool)
    new_md, (u2,), _ = forest.refine_and_transfer(flags, md, [u])
    expect = np.stack([new_md.vert_coords[:, 0], new_md.vert_coords[:, 1] * 2], axis=1)
    assert np.allclose(u2, expect)


def test_3d_forest_and_hanging():
    forest = Forest(read_ucd(UNIT_CUBE_10, dim=3))
    forest.refine_global(1)
    flags = np.zeros(8, dtype=bool)
    flags[0] = True
    forest.execute_refinement(forest.balance_flags(flags))
    md = forest.extract()
    assert md.n_cells == 15
    # hanging: 3 interior faces of the refined octant -> each contributes
    # 1 face center + 4 edge midpoints, shared edges dedupe:
    hmask = md.hanging_mask()
    assert hmask.sum() == len(md.hang_child)
    assert not hmask[md.hang_masters].any()
    # constraint consistency: coordinates interpolate
    mc = md.vert_coords[md.hang_masters]
    got = (md.hang_weights[:, :, None] * mc).sum(1)
    assert np.allclose(got, md.vert_coords[md.hang_child])


def test_boundary_faces_rect():
    forest = Forest(rect_mesh([0, 0], [1, 1], [2, 2]))
    forest.refine_global(1)
    md = forest.extract()
    assert len(md.bface_cell) == 4 * 4  # 4 faces per side
    assert sorted(md.boundary_vertices.keys()) == [0, 1, 2, 3]
    top = md.boundary_vertices[3]
    assert np.allclose(md.vert_coords[top][:, 1], 1.0)


def test_sneddon_3d_dof_count():
    # sneddon 3d test: 1000 cells, 1331 vertices, 5324 dofs
    forest = Forest(rect_mesh([-10, -10, -10], [10, 10, 10]))
    md = forest.extract()
    assert md.n_dofs == 5324
    assert md.min_cell_diameter == pytest.approx(2 * np.sqrt(3))


# ---------------------------------------------------------------------------
# fem tabulation
# ---------------------------------------------------------------------------

def test_quadrature_exactness():
    t = element_tables(2)
    # integrate x^4 * y^2 over [0,1]^2 with 3-pt Gauss (exact to degree 5)
    vals = t.q_points[:, 0] ** 4 * t.q_points[:, 1] ** 2
    assert np.dot(vals, t.q_weights) == pytest.approx(1.0 / 5 / 3, rel=1e-14)


def test_shape_function_partition_of_unity():
    for dim in (2, 3):
        t = element_tables(dim)
        assert np.allclose(t.shape_v.sum(axis=1), 1.0)
        assert np.allclose(t.shape_g.sum(axis=1), 0.0)


def test_cell_geometry_area():
    forest = Forest(rect_mesh([0, 0], [2, 1], [4, 2]))
    md = forest.extract()
    t = element_tables(2)
    JxW, grads = cell_geometry(md.cell_coords, t)
    assert JxW.sum() == pytest.approx(2.0)
    # gradient of a linear function is exact
    f = md.cell_coords[:, :, 0] * 3.0 + md.cell_coords[:, :, 1]
    g = np.einsum("ca,cqad->cqd", f, grads)
    assert np.allclose(g[..., 0], 3.0)
    assert np.allclose(g[..., 1], 1.0)


def test_lumped_mass_total():
    forest = Forest(rect_mesh([0, 0], [2, 1], [4, 2]))
    md = forest.extract()
    t = element_tables(2)
    diag = lumped_mass_diag(md.cell_coords, md.cell2vert, md.n_vertices, t)
    assert diag.sum() == pytest.approx(2.0)
    assert (diag > 0).all()


def test_threepoint_mesh_dofs():
    # threepoint_1 test: 975 dofs = 325 vertices * 3 at no prerefinement
    forest = Forest(read_msh(THREEPOINT, dim=2))
    md = forest.extract()
    assert md.n_dofs == 975
