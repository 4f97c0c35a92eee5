"""QoI/functional unit tests (reference N15, cracks.cc:3264-3816)."""

import numpy as np
import pytest

from cracks_tpu import qoi
from cracks_tpu.mesh import Forest
from cracks_tpu.meshio import rect_mesh


def _mesh(n=4):
    forest = Forest(rect_mesh([0, 0], [1, 1], [n, n]))
    return forest.extract()


def test_energy_of_linear_displacement():
    mesh = _mesh()
    # u = (a x, b y): E = diag(a, b); psi = lam/2 (a+b)^2 + mu (a^2+b^2)
    a, b = 0.3, -0.1
    u = np.stack([a * mesh.vert_coords[:, 0], b * mesh.vert_coords[:, 1]], 1)
    phi = np.ones(mesh.n_vertices)
    lam = np.full(mesh.n_cells, 2.0)
    mu = np.full(mesh.n_cells, 0.7)
    k, eps, Gc = 0.0, 0.25, 1.3
    bulk, crack = qoi.compute_energy(mesh, u, phi, lam, mu, k, eps, Gc)
    psi = 0.5 * 2.0 * (a + b) ** 2 + 0.7 * (a * a + b * b)
    assert bulk == pytest.approx(psi, rel=1e-12)
    assert crack == pytest.approx(0.0, abs=1e-14)  # phi == 1


def test_crack_energy_of_linear_phi():
    mesh = _mesh()
    phi = 1.0 - 0.5 * mesh.vert_coords[:, 0]  # grad = (-0.5, 0)
    u = np.zeros((mesh.n_vertices, 2))
    lam = mu = np.ones(mesh.n_cells)
    k, eps, Gc = 0.0, 0.2, 2.0
    _, crack = qoi.compute_energy(mesh, u, phi, lam, mu, k, eps, Gc)
    # Gc/2 * ( int (phi-1)^2/eps + eps*0.25 ) ; int (0.5x)^2 = 0.25/3
    expect = Gc / 2 * (0.25 / 3 / eps + eps * 0.25)
    assert crack == pytest.approx(expect, rel=1e-12)


def test_tcv_divergence_free_check():
    mesh = _mesh()
    # u = (x, 0), phi = x: TCV = int u . grad(phi) = int x = 1/2
    u = np.stack([mesh.vert_coords[:, 0], 0 * mesh.vert_coords[:, 1]], 1)
    phi = mesh.vert_coords[:, 0]
    assert qoi.compute_tcv(mesh, u, phi) == pytest.approx(0.5, rel=1e-12)


def test_load_uniaxial_stretch():
    mesh = _mesh()
    # u = (0, b y): sigma = [[lam b, 0], [0, (lam+2mu) b]];
    # load on top (id 3): integral sigma n = (0, (lam+2mu) b)
    b = 0.01
    u = np.stack([0 * mesh.vert_coords[:, 0], b * mesh.vert_coords[:, 1]], 1)
    lam = np.full(mesh.n_cells, 3.0)
    mu = np.full(mesh.n_cells, 0.5)
    load = qoi.compute_load(mesh, u, lam, mu, boundary_id=3)
    assert load[1] == pytest.approx((3.0 + 2 * 0.5) * b, rel=1e-12)


def test_cod_line_integral():
    mesh = _mesh()
    # faces at x = 0.5; u = (1, 0), phi = y -> u.grad(phi) = 0;
    # phi = x -> u.grad(phi) = 1, line length 1 -> cod = 1/2 (the 0.5
    # factor) since double counting halves once more
    u = np.stack([np.ones(mesh.n_vertices), np.zeros(mesh.n_vertices)], 1)
    phi = mesh.vert_coords[:, 0]
    cod = qoi.compute_cod(mesh, u, phi, 0.5)
    assert cod == pytest.approx(0.5, rel=1e-12)
    assert qoi.compute_cod(mesh, u, phi, 7.7) == -1e300


def test_point_value_and_stress():
    mesh = _mesh()
    u = np.stack([mesh.vert_coords[:, 0] * 2.0,
                  mesh.vert_coords[:, 1] * -3.0], 1)
    v = qoi.compute_point_value(mesh, u, (0.3, 0.6))
    assert np.allclose(v, [0.6, -1.8])
    # -du_y/dy = 3
    ps = qoi.compute_point_stress(mesh, u, point=(0.3, 0.6))
    assert ps == pytest.approx(3.0, rel=1e-10)


def test_cod_array_profile():
    forest = Forest(rect_mesh([-2, -2], [2, 2], [8, 8]))
    mesh = forest.extract()
    u = np.stack([np.ones(mesh.n_vertices), np.zeros(mesh.n_vertices)], 1)
    phi = mesh.vert_coords[:, 0]
    xs, vals, exact = qoi.compute_cod_array(mesh, u, phi)
    assert len(xs) == 75
    assert np.isfinite(vals).all()
    # the bucket grid does not hit x=0 exactly
    assert exact.max() == pytest.approx(1.92e-3, rel=1e-3)


def test_cod_sweep_matches_per_line():
    """The batched sweep (qoi.compute_cod_sweep) must agree with the
    per-line COD at every line, including the -1e300 sentinel."""
    forest = Forest(rect_mesh([-2, -2], [2, 2], [8, 8]))
    forest.refine_global(1)
    mesh = forest.extract()
    rng = np.random.default_rng(3)
    u = rng.standard_normal((mesh.n_vertices, 2)) * 1e-3
    phi = rng.random(mesh.n_vertices)
    xs = -1.5 + np.arange(0, 769, 48) * (1.0 / 256)
    vals = qoi.compute_cod_sweep(mesh, u, phi, xs)
    hits = 0
    for x, v in zip(xs, vals):
        ref = qoi.compute_cod(mesh, u, phi, float(x))
        if ref > -1e100:
            hits += 1
            assert abs(v - ref) < 1e-12 * max(1.0, abs(ref)), (x, v, ref)
        else:
            assert v == -1e300
    assert hits > 2


def test_device_energy_tcv_matches_host():
    """The driver's per-step device QoI reduction (qoi.energy_tcv_device)
    must reproduce the host-numpy reference implementation, on both the
    unchunked and the scan-chunked cell sweep."""
    import jax.numpy as jnp

    from cracks_tpu.ops import physics

    mesh = _mesh(6)
    rng = np.random.default_rng(7)
    u = 0.01 * rng.standard_normal((mesh.n_vertices, 2))
    phi = rng.uniform(0.2, 1.0, mesh.n_vertices)
    lam = rng.uniform(1.0, 3.0, mesh.n_cells)
    mu = rng.uniform(0.5, 1.5, mesh.n_cells)
    k, eps, Gc = 1e-8, 0.25, 1.3
    bulk_h, crack_h = qoi.compute_energy(mesh, u, phi, lam, mu, k, eps, Gc)
    tcv_h = qoi.compute_tcv(mesh, u, phi)

    ca = physics.build_cell_arrays(mesh, lam, mu)
    args = (jnp.asarray(u.reshape(-1)), jnp.asarray(phi), ca,
            jnp.asarray(lam), jnp.asarray(mu), k, eps, Gc)
    b, c, t = qoi.energy_tcv_device(*args, dim=2)
    assert float(b) == pytest.approx(bulk_h, rel=1e-12)
    assert float(c) == pytest.approx(crack_h, rel=1e-12)
    assert float(t) == pytest.approx(tcv_h, rel=1e-12, abs=1e-15)

    # force the chunked-scan path by shrinking the chunk threshold
    spec = physics.chunk_spec(mesh.n_cells + physics.CELL_CHUNK)
    n_chunks, ch = 4, -(-mesh.n_cells // 4)
    ch = -(-ch // 128) * 128 if ch > 128 else ch
    host = physics.build_cell_arrays_host(mesh, lam, mu)
    g_u, g_p, JxW, grads, shape_v, lam_, mu_, invd2 = host
    chunked = physics.ChunkedCells(
        gather_u=_chunk_major(g_u, 0, n_chunks, ch, jnp.int32),
        gather_p=_chunk_major(g_p, 0, n_chunks, ch, jnp.int32),
        JxW=_chunk_major(JxW, 0.0, n_chunks, ch, jnp.float64),
        grads=_chunk_major(grads, 0.0, n_chunks, ch, jnp.float64),
        lam=_chunk_major(lam_, 1.0, n_chunks, ch, jnp.float64),
        mu=_chunk_major(mu_, 1.0, n_chunks, ch, jnp.float64),
        inv_diam2=_chunk_major(invd2, 1.0, n_chunks, ch, jnp.float64))
    ca_chunked = ca._replace(chunked=chunked)
    b2, c2, t2 = qoi.energy_tcv_device(
        args[0], args[1], ca_chunked, args[3], args[4], k, eps, Gc, dim=2)
    assert float(b2) == pytest.approx(bulk_h, rel=1e-12)
    assert float(c2) == pytest.approx(crack_h, rel=1e-12)
    assert float(t2) == pytest.approx(tcv_h, rel=1e-12, abs=1e-15)


def _chunk_major(a, fill, n_chunks, ch, dt):
    import jax.numpy as jnp

    a = np.asarray(a)
    n_c = a.shape[-1]
    pad = n_chunks * ch - n_c
    assert pad >= 0
    if pad:
        a = np.concatenate(
            [a, np.full(a.shape[:-1] + (pad,), fill, a.dtype)], axis=-1)
    a = a.reshape(a.shape[:-1] + (n_chunks, ch))
    return jnp.asarray(np.moveaxis(a, -2, 0), dtype=dt)


def test_linf_diff_device():
    rng = np.random.default_rng(3)
    u = rng.standard_normal(50)
    u2 = u + 1e-3 * rng.standard_normal(50)
    p = rng.standard_normal(20)
    p2 = p.copy()
    p2[7] += 0.5
    got = float(qoi.linf_diff_device(u, u2, p, p2))
    expect = max(np.abs(u - u2).max(), np.abs(p - p2).max())
    assert got == pytest.approx(expect, rel=0, abs=0)
