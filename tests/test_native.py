"""Native (C++) forest core vs the numpy reference implementation.

The canonical-key computation establishes vertex identity across roots
(and across topological slits), so the native path must be BIT-IDENTICAL
to the numpy path — any difference silently corrupts mesh topology.
These tests sweep all key kinds (interior / corner / edge / 3d-face,
incl. the 8-symmetry face canonicalization) on the actual production
coarse meshes.
"""

import os

import numpy as np
import pytest

from cracks_tpu import native
from cracks_tpu.mesh import MAX_COARSE_VERTS, Forest
from cracks_tpu.meshio import read_ucd, rect_mesh

MESH_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "meshes")

needs_native = pytest.mark.skipif(native.get_lib() is None,
                                  reason="no C++ toolchain")


def _numpy_keys(forest, root, coords):
    """Force the numpy fallback path."""
    os.environ["CRACKS_TPU_NATIVE"] = "0"
    try:
        native_lib, native._lib = native._lib, None
        out = forest.canonical_keys(root, coords)
        return out
    finally:
        native._lib = native_lib
        del os.environ["CRACKS_TPU_NATIVE"]


def _closure_points(forest):
    """All half-grid closure points of the active cells: hits every key
    kind (cell corners, edge/face midpoints, interiors)."""
    dim = forest.dim
    W = (forest.S >> forest.level).astype(np.int64)
    offs = np.array(np.meshgrid(*([np.array([0, 1, 2])] * dim),
                                indexing="ij")).reshape(dim, -1).T
    pts = (forest.anchor[:, None, :]
           + offs[None, :, :] * (W[:, None, None] // 2)).reshape(-1, dim)
    roots = np.repeat(forest.root, len(offs))
    return roots, pts


def _check(forest):
    roots, pts = _closure_points(forest)
    k_np = _numpy_keys(forest, roots, pts)
    k_cc = native.canonical_keys(
        forest.dim, forest.S, forest.max_level, MAX_COARSE_VERTS, roots,
        pts, forest.coarse.cells,
        forest.face_uid if forest.dim == 3 else None,
        forest.root_face_vids if forest.dim == 3 else None)
    assert k_cc is not None
    assert (k_cc == k_np).all()
    # and identity semantics survive: same number of distinct vertices
    assert len(np.unique(k_cc)) == len(np.unique(k_np))


@needs_native
def test_keys_match_2d_multiroot_adaptive():
    forest = Forest(rect_mesh([-10, -10], [10, 10], [3, 3]))
    forest.refine_global(2)
    # adaptive: refine a diagonal band, keep 2:1 balance
    flags = np.zeros(forest.n_cells, bool)
    flags[::3] = True
    forest.execute_refinement(forest.balance_flags(flags))
    _check(forest)


@needs_native
def test_keys_match_2d_slit_mesh():
    """unit_slit.inp has two distinct coarse vertices at (1, 0.5): keys
    must keep the slit sides distinct (identity via coarse connectivity,
    never coordinates)."""
    forest = Forest(read_ucd(os.path.join(MESH_DIR, "unit_slit.inp"),
                             dim=2))
    forest.refine_global(2)
    _check(forest)
    mesh = forest.extract()
    coords = np.round(mesh.vert_coords, 12)
    _, counts = np.unique(coords, axis=0, return_counts=True)
    assert counts.max() == 2  # slit line vertices are duplicated


@needs_native
def test_keys_match_3d_multiroot_adaptive():
    """Multi-root 3d exercises the face-interior kind incl. the
    8-symmetry canonicalization across differently-oriented shared
    faces."""
    forest = Forest(read_ucd(os.path.join(MESH_DIR, "unit_cube_10.inp"),
                             dim=3))
    forest.refine_global(1)
    flags = np.zeros(forest.n_cells, bool)
    flags[::5] = True
    forest.execute_refinement(forest.balance_flags(flags))
    _check(forest)


@needs_native
def test_extract_identical_through_native_2d():
    """Full MeshData equality: the native-keyed extract must reproduce
    the numpy-keyed extract array-for-array."""
    forest = Forest(rect_mesh([0, 0], [1, 1], [2, 2]))
    forest.refine_global(2)
    flags = np.zeros(forest.n_cells, bool)
    flags[7::4] = True
    forest.execute_refinement(forest.balance_flags(flags))
    m1 = forest.extract()

    os.environ["CRACKS_TPU_NATIVE"] = "0"
    try:
        lib, native._lib = native._lib, None
        m2 = forest.extract()
    finally:
        native._lib = lib
        del os.environ["CRACKS_TPU_NATIVE"]

    assert (m1.cell2vert == m2.cell2vert).all()
    assert (m1.vertex_keys == m2.vertex_keys).all()
    assert (m1.vert_coords == m2.vert_coords).all()
    assert (m1.hang_child == m2.hang_child).all()
    assert (m1.hang_masters == m2.hang_masters).all()
    assert (m1.bface_cell == m2.bface_cell).all()
    assert (m1.bface_id == m2.bface_id).all()
