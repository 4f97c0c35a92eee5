"""Eigensolver unit tests mirroring the reference's six embedded Catch
TEST_CASEs (cracks.cc:1740-1919), plus split/derivative checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cracks_tpu.ops.spectral import eigen_2x2_sym, full_stress, stress_split_2d


def _eig(m):
    E = jnp.asarray(m, dtype=jnp.float64)
    l1, l2, P = eigen_2x2_sym(E)
    v1 = np.asarray(P)[:, 0]
    v2 = np.asarray(P)[:, 1]
    return float(l1), float(l2), v1, v2


def test_eigen_diagonal():
    l1, l2, v1, v2 = _eig([[2.0, 0.0], [0.0, 3.0]])
    assert l1 == pytest.approx(2.0)
    assert v1 == pytest.approx([1.0, 0.0])
    assert l2 == pytest.approx(3.0)
    assert v2 == pytest.approx([0.0, 1.0])


def test_eigen_11_zero():
    l1, l2, v1, v2 = _eig([[-2.0, 0.0], [0.0, 0.0]])
    assert l1 == pytest.approx(-2.0)
    assert v1 == pytest.approx([1.0, 0.0])
    assert l2 == pytest.approx(0.0)
    assert v2 == pytest.approx([0.0, 1.0])


def test_eigen_11_zero_2():
    l1, l2, v1, v2 = _eig([[5.0, 0.0], [0.0, 0.0]])
    assert l1 == pytest.approx(5.0)
    assert v1 == pytest.approx([1.0, 0.0])
    assert l2 == pytest.approx(0.0)
    assert v2 == pytest.approx([0.0, 1.0])


def test_eigen_offdiagonal_only():
    l1, l2, v1, v2 = _eig([[0.0, -2.0], [-2.0, 0.0]])
    sq = np.sqrt(2.0)
    assert l1 == pytest.approx(2.0)
    assert v1 == pytest.approx([1 / sq, -1 / sq])
    assert l2 == pytest.approx(-2.0)
    assert v2 == pytest.approx([1 / sq, 1 / sq])


def test_eigen_full_matrix():
    l1, l2, v1, v2 = _eig([[3.0, 2.0], [2.0, 4.0]])
    a, b = 7.0 / 2.0, np.sqrt(17.0) / 2.0
    assert l1 == pytest.approx(a + b)
    w1 = (-0.5 + b) / 2.0
    len1 = np.sqrt(w1 * w1 + 1.0)
    assert v1 == pytest.approx([w1 / len1, 1.0 / len1])
    assert l2 == pytest.approx(a - b)
    w2 = (-0.5 - b) / 2.0
    len2 = np.sqrt(w2 * w2 + 1.0)
    # the reference asserts the negated vector; eigenvectors are defined
    # up to sign, and our formula yields the opposite orientation there
    assert np.allclose(np.abs(v2), np.abs([w2 / len2, 1.0 / len2]))


def test_eigen_00_zero():
    l1, l2, v1, v2 = _eig([[0.0, -2.0], [-2.0, 4.0]])
    assert l1 == pytest.approx(2.0 + 2.0 * np.sqrt(2.0))
    w1 = 1.0 - np.sqrt(2.0)
    len1 = np.sqrt(w1 * w1 + 1.0)
    assert np.allclose(np.abs(v1), np.abs([w1 / len1, 1.0 / len1]))
    assert l2 == pytest.approx(2.0 - 2.0 * np.sqrt(2.0))


def test_eigen_orthogonality_random():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(100, 2, 2))
    E = 0.5 * (A + np.swapaxes(A, -1, -2))
    l1, l2, P = eigen_2x2_sym(jnp.asarray(E))
    v1 = np.asarray(P)[..., :, 0]
    v2 = np.asarray(P)[..., :, 1]
    assert np.abs((v1 * v2).sum(-1)).max() < 1e-10
    # reconstruction: P diag(l) P^T == E
    rec = (np.asarray(l1)[:, None, None] * v1[:, :, None] * v1[:, None, :]
           + np.asarray(l2)[:, None, None] * v2[:, :, None] * v2[:, None, :])
    assert np.allclose(rec, E, atol=1e-12)


def test_split_sums_to_full_stress():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(50, 2, 2))
    E = jnp.asarray(0.5 * (A + np.swapaxes(A, -1, -2)))
    lam, mu = 121.15e3, 80.77e3
    sp, sm = stress_split_2d(E, lam, mu)
    assert np.allclose(sp + sm, full_stress(E, lam, mu), rtol=1e-12)


def test_split_pure_tension_compression():
    lam, mu = 1.0, 1.0
    E = jnp.asarray([[2.0, 0.0], [0.0, 3.0]])
    sp, sm = stress_split_2d(E, lam, mu)
    assert np.allclose(sm, 0.0, atol=1e-14)
    E = jnp.asarray([[-2.0, 0.0], [0.0, -3.0]])
    sp, sm = stress_split_2d(E, lam, mu)
    assert np.allclose(sp, 0.0, atol=1e-14)


def _reference_split_derivative(E, dE, lam, mu):
    """The hand-coded linearization of the stress split, transcribed from
    the formulas at reference cracks.cc:1971-2110 (derivative branch of
    decompose_stress), for test purposes."""
    disk = np.sqrt(E[0, 1] * E[1, 0] + (E[0, 0] - E[1, 1]) ** 2 / 4.0)
    tr = E[0, 0] + E[1, 1]
    dtr = dE[0, 0] + dE[1, 1]
    inner = (dE[0, 1] * E[1, 0] + E[0, 1] * dE[1, 0]
             + (E[0, 0] - E[1, 1]) * (dE[0, 0] - dE[1, 1]) / 2.0)
    l1 = 0.5 * (tr + 2.0 * disk)
    l2 = 0.5 * (tr - 2.0 * disk)
    dl1 = 0.5 * dtr + inner / (2.0 * disk)
    dl2 = 0.5 * dtr - inner / (2.0 * disk)

    def vec(lmbda, dlmbda):
        r = (lmbda - E[0, 0]) / E[0, 1]
        n = 1.0 / np.sqrt(1.0 + r * r)
        dr = ((dlmbda - dE[0, 0]) * E[0, 1]
              - (lmbda - E[0, 0]) * dE[0, 1]) / E[0, 1] ** 2
        dn = -(1.0 / (1.0 + r * r)) * (1.0 / (2.0 * np.sqrt(1.0 + r * r))) \
            * (2.0 * r) * dr * np.sqrt(1.0 + r * r)
        # (the reference's normalization_LinU written compactly:
        #  d(1/sqrt(1+r^2)) = -r dr / (1+r^2)^(3/2))
        dn = -r * dr / (1.0 + r * r) ** 1.5
        v = np.array([n, n * r])
        dv = np.array([dn, n * dr + dn * r])
        return v, dv

    v1, dv1 = vec(l1, dl1)
    v2, dv2 = vec(l2, dl2)
    P = np.stack([v1, v2], axis=1)
    dP = np.stack([dv1, dv2], axis=1)
    l1p = max(0.0, l1)
    l2p = max(0.0, l2)
    dl1p = 0.0 if l1 < 0.0 else dl1
    dl2p = 0.0 if l2 < 0.0 else dl2
    L = np.diag([l1p, l2p])
    dL = np.diag([dl1p, dl2p])
    dEp = dP @ L @ P.T + P @ dL @ P.T + P @ L @ dP.T
    dtrp = 0.0 if tr < 0.0 else dtr
    eye = np.eye(2)
    dsp = lam * dtrp * eye + 2.0 * mu * dEp
    dsm = lam * (dtr - dtrp) * eye + 2.0 * mu * (dE - dEp)
    return dsp, dsm


def test_split_jvp_matches_reference_hand_derivative():
    """jax.jvp of the primal split must equal the reference's hand-coded
    linearization (cracks.cc:1971-2110) wherever the latter is defined
    (generic E, away from the diagonal branch)."""
    rng = np.random.default_rng(2)
    lam, mu = 1.5, 0.7
    f = lambda E: jnp.stack(stress_split_2d(E, lam, mu))
    jvp_f = jax.jit(lambda E, D: jax.jvp(f, (E,), (D,))[1])
    for _ in range(20):
        A = rng.normal(size=(2, 2))
        E0 = 0.5 * (A + A.T)
        D = rng.normal(size=(2, 2))
        D = 0.5 * (D + D.T)
        tangent = jvp_f(jnp.asarray(E0), jnp.asarray(D))
        dsp, dsm = _reference_split_derivative(E0, D, lam, mu)
        assert np.allclose(np.asarray(tangent[0]), dsp, rtol=1e-7, atol=1e-8)
        assert np.allclose(np.asarray(tangent[1]), dsm, rtol=1e-7, atol=1e-8)


def test_split_jvp_no_nan_at_zero_strain():
    # E = 0 hits the near-diagonal guard; the tangent must stay finite
    # (the reference's derivative path would divide by zero here).
    f = lambda E: jnp.stack(stress_split_2d(E, 1.0, 1.0))
    E0 = jnp.zeros((2, 2))
    D = jnp.asarray([[1.0, 0.5], [0.5, -2.0]])
    _, tangent = jax.jvp(f, (E0,), (D,))
    assert np.isfinite(np.asarray(tangent)).all()
