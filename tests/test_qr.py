"""Sparse QR tests: factorization identity, least squares, min-norm, fixtures."""

import numpy as np
import pytest

import suitesparse_tpu as sst
from suitesparse_tpu.config import Ordering
from suitesparse_tpu.io import fixtures
from suitesparse_tpu.numeric import qr
from suitesparse_tpu.sparse import residual_norm


def random_rect(m, n, density=0.3, seed=0, full_rank=True):
    rng = np.random.default_rng(seed)
    D = rng.standard_normal((m, n)) * (rng.random((m, n)) < density)
    if full_rank:
        k = min(m, n)
        D[np.arange(k), np.arange(k)] += 3.0 + np.arange(k) * 0.01
    return sst.from_dense(D), D


@pytest.mark.parametrize("m,n,seed", [(10, 10, 0), (20, 12, 1), (40, 25, 2),
                                      (30, 30, 3)])
def test_qr_reconstruction(m, n, seed):
    A, D = random_rect(m, n, seed=seed)
    S = qr.symbolic_qr(A)
    F = qr.qr_host(A, S)
    # Q R should equal A(:, q); apply_q maps R columns (Householder-index
    # space) back to original rows
    R = F.R.to_dense()
    QR = np.zeros((m, n))
    for j in range(n):
        QR[:, j] = qr.apply_q(F, R[:, j])
    assert np.allclose(QR, D[:, S.q], atol=1e-10)


@pytest.mark.parametrize("m,n,seed", [(20, 12, 4), (50, 30, 5), (35, 35, 6)])
def test_least_squares_matches_lstsq(m, n, seed):
    A, D = random_rect(m, n, seed=seed)
    rng = np.random.default_rng(seed)
    b = rng.standard_normal(m)
    x = sst.qrsol(A, b)
    x_ref, *_ = np.linalg.lstsq(D, b, rcond=None)
    assert np.allclose(x, x_ref, atol=1e-8)


@pytest.mark.parametrize("m,n,seed", [(12, 20, 7), (25, 60, 8)])
def test_min_norm_underdetermined(m, n, seed):
    A, D = random_rect(m, n, seed=seed)
    rng = np.random.default_rng(seed)
    b = rng.standard_normal(m)
    x = sst.qrsol(A, b)
    # solves the system...
    assert np.allclose(D @ x, b, atol=1e-8)
    # ...with minimum norm
    x_ref, *_ = np.linalg.lstsq(D, b, rcond=None)
    assert np.linalg.norm(x) <= np.linalg.norm(x_ref) * (1 + 1e-8)
    assert np.allclose(x, x_ref, atol=1e-6)


def test_rank_detection():
    rng = np.random.default_rng(9)
    D = rng.standard_normal((20, 5))
    D = np.hstack([D, D[:, :2] @ np.array([[1.0, 2.0], [3.0, 4.0]])])  # rank 5
    A = sst.from_dense(D)
    S = qr.symbolic_qr(A, sst.DEFAULT.replace(ordering=Ordering.NATURAL))
    F = qr.qr_host(A, S)
    assert F.rank_est == 5


def test_qr_natural_vs_colamd_same_solution():
    A, D = random_rect(40, 22, seed=10)
    b = np.random.default_rng(11).standard_normal(40)
    x1 = sst.qrsol(A, b, sst.DEFAULT.replace(ordering=Ordering.NATURAL))
    x2 = sst.qrsol(A, b)  # AMD->colamd default path
    assert np.allclose(x1, x2, atol=1e-8)


needs_ref = pytest.mark.skipif(not fixtures.have_reference(),
                               reason="reference mount not present")


@needs_ref
@pytest.mark.parametrize("name", ["ash219", "west0067", "ibm32a"])
def test_reference_qr_fixtures(name):
    # cs_demo3-style: least-squares / min-norm solves on demo matrices
    A = fixtures.load_demo(name)
    m, n = A.shape
    b = 1.0 + np.arange(m) / m
    x = sst.qrsol(A, b)
    D = A.to_dense()
    x_ref, *_ = np.linalg.lstsq(D, b, rcond=None)
    # same normal-equations residual quality
    r_got = np.linalg.norm(D.T @ (D @ x - b))
    r_ref = np.linalg.norm(D.T @ (D @ x_ref - b))
    assert r_got <= r_ref + 1e-6 * np.linalg.norm(b)


def test_rank_deficient_basic_solution():
    """Rank-deficient least squares returns the finite BASIC solution (dead
    pivots zeroed — SuiteSparseQR's rank-detection contract)."""
    import numpy as np
    import suitesparse_tpu as sst
    from suitesparse_tpu.sparse import from_dense

    D = np.zeros((8, 4))
    D[:, 0] = 1.0
    D[:, 1] = 1.0            # duplicate column -> rank deficiency
    D[:4, 2] = np.arange(1, 5)
    D[4:, 3] = 2.0
    A = from_dense(D)
    b = np.arange(1.0, 9.0)
    x = sst.qrsol(A, b)
    assert np.isfinite(x).all()
    # least-squares optimality: A'(Ax - b) ~ 0 on the range space
    r = D @ x - b
    g = D.T @ r
    # the gradient may be nonzero only along the null space direction fixed
    # to zero; check the residual norm matches the lstsq optimum
    ropt = D @ np.linalg.lstsq(D, b, rcond=None)[0] - b
    assert np.linalg.norm(r) <= np.linalg.norm(ropt) * (1 + 1e-8) + 1e-8
