"""Tcov-style torture tests: error paths, degenerate inputs, garbage.

The reference's real test suite is statement-coverage "torture" testing
(``CHOLMOD/Tcov``: NULL/garbage args via null.c/null2.c, absurd dimensions via
huge.c, singular and NaN fixtures, jumbled matrices). These tests replicate
that philosophy for this framework's surface: every API must either work or
fail with a clear Python exception — never crash, hang, or silently corrupt.
"""

import numpy as np
import pytest

import suitesparse_tpu as sst
from suitesparse_tpu.io import fixtures
from suitesparse_tpu.numeric import lu, qr, simplicial, spsolve
from suitesparse_tpu.ordering import amd_order, btf
from suitesparse_tpu.sparse import from_triplets, residual_norm


# ---------------- degenerate shapes ----------------

def test_empty_matrix_everything():
    E = from_triplets(0, 0, [], [], [], sym=1)
    S = sst.analyze(E)
    F = sst.factorize(E, S)
    assert sst.solve(F, np.zeros(0)).size == 0
    G = from_triplets(0, 0, [], [], [])
    assert sst.lusol(G, np.zeros(0)).size == 0
    assert amd_order(E).size == 0


def test_1x1():
    A = from_triplets(1, 1, [0], [0], [4.0], sym=1)
    x = sst.cholsol(A, np.array([8.0]))
    assert np.isclose(x[0], 2.0)
    G = from_triplets(1, 1, [0], [0], [-2.0])
    assert np.isclose(sst.lusol(G, np.array([6.0]))[0], -3.0)


def test_zero_matrix_fails_cleanly():
    Z = from_triplets(3, 3, [], [], [], sym=1)
    S = sst.analyze(Z)
    F = simplicial.chol_up(Z, S)
    assert not F.ok and F.minor == 0
    with pytest.raises(AssertionError):
        sst.lusol(from_triplets(3, 3, [], [], []), np.ones(3))


def test_out_of_range_indices_rejected():
    with pytest.raises(AssertionError):
        from_triplets(3, 3, [0, 5], [0, 1], [1.0, 2.0])
    with pytest.raises(AssertionError):
        from_triplets(3, 3, [0, 1], [0, -1 + 4], [1.0, 2.0])  # col 3 of 3


def test_jumbled_triplets_are_compressed():
    # duplicates + unsorted input (the reference's "jumbled matrix" fixtures)
    A = from_triplets(3, 3, [2, 0, 2, 0, 1], [2, 0, 2, 0, 1],
                      [1.0, 1.0, 1.0, 1.0, 5.0], sym=1)
    A.check()
    assert A.nnz == 3
    assert np.allclose(np.diag(A.to_dense()), [2.0, 5.0, 2.0])


# ---------------- NaN / Inf poisoning ----------------

def test_nan_input_detected_cholesky():
    A = fixtures.laplacian_2d(5)
    A2 = sst.CSC(A.nrow, A.ncol, A.indptr, A.indices, A.data.copy(), 1)
    A2.data[3] = np.nan
    S = sst.analyze(A2)
    F = simplicial.chol_up(A2, S)
    assert not F.ok  # NaN pivot chain -> minor set, no exception


def test_inf_input_lu():
    rng = np.random.default_rng(0)
    D = rng.standard_normal((6, 6))
    np.fill_diagonal(D, 10.0)
    D[2, 3] = np.inf
    A = sst.from_dense(D)
    S = lu.analyze_lu(A)
    N = lu.factor_lu(A, S)
    if N.ok:  # Inf may propagate rather than hit a zero pivot
        x = lu.solve_lu(N, np.ones(6))
        assert not np.all(np.isfinite(x))


# ---------------- mismatched arguments ----------------

def test_wrong_rhs_length():
    A = fixtures.laplacian_2d(4)
    S = sst.analyze(A)
    F = sst.factorize(A, S)
    with pytest.raises((IndexError, ValueError)):
        sst.solve(F, np.ones(7))


def test_perm_validation():
    from suitesparse_tpu.check import check_perm
    with pytest.raises(AssertionError):
        check_perm(np.array([0, 0, 2]), 3)
    with pytest.raises(AssertionError):
        check_perm(np.array([0, 1]), 3)


def test_factor_checker_catches_corruption():
    from suitesparse_tpu.check import check_factor
    A = fixtures.laplacian_2d(4)
    S = sst.analyze(A)
    F = simplicial.chol_up(A, S)
    check_factor(F)  # sane
    F.L.indices[F.L.indptr[0]] = 5  # corrupt: diagonal no longer first
    with pytest.raises(AssertionError):
        check_factor(F)


# ---------------- structurally hostile matrices ----------------

def test_fully_dense_row_amd():
    # one row touching everything (amd dense-row postponement path)
    n = 60
    r = np.concatenate([np.zeros(n - 1, dtype=np.int64), np.arange(n)])
    c = np.concatenate([np.arange(1, n, dtype=np.int64), np.arange(n)])
    x = np.concatenate([np.full(n - 1, -0.01), np.full(n, float(n))])
    A = from_triplets(n, n, r, c, x, sym=1)
    p = amd_order(A)
    assert np.array_equal(np.sort(p), np.arange(n))
    b = np.ones(n)
    assert residual_norm(A, sst.cholsol(A, b), b) < 1e-10


def test_permutation_matrix_btf():
    # a pure permutation matrix: BTF must find n 1x1 blocks
    rng = np.random.default_rng(1)
    n = 12
    p = rng.permutation(n)
    A = from_triplets(n, n, p, np.arange(n), np.ones(n))
    B = btf.btf_order(A)
    assert B.nblocks == n
    x = sst.lusol(A, np.ones(n))
    assert residual_norm(A, x, np.ones(n)) < 1e-14


def test_rank_deficient_qr_does_not_crash():
    D = np.zeros((8, 5))
    D[:, 0] = 1.0
    D[:, 2] = np.arange(8)
    A = sst.from_dense(D)  # rank 2, cols 1/3/4 empty
    S = qr.symbolic_qr(A)
    F = qr.qr_host(A, S)
    assert F.rank_est == 2


# ---------------- sparse-RHS solves ----------------

def test_spsolve_matches_dense():
    A = fixtures.laplacian_2d(8)
    S = sst.analyze(A)
    F = simplicial.chol_up(A, S)
    # sparse b with 2 nonzeros
    bi = np.array([5, 40])
    bx = np.array([1.0, -2.0])
    want, xv = spsolve.solve_subset(F, bi, bx)
    b = np.zeros(64)
    b[bi] = bx
    x_ref = simplicial.chol_solve(F, b)
    x_got = np.zeros(64)
    x_got[want] = xv
    assert np.allclose(x_got, x_ref, atol=1e-12)
    # restricted subset
    want2, xv2 = spsolve.solve_subset(F, bi, bx, want=np.array([0, 5, 63]))
    assert np.allclose(xv2, x_ref[[0, 5, 63]], atol=1e-12)


def test_spsolve_lower_reach_cost():
    # x = L \ e_{n-1} touches only the last column's closure, not all of L
    A = fixtures.banded_spd(100, 2, seed=0)
    S = sst.analyze(A, sst.DEFAULT.replace(ordering=sst.Ordering.NATURAL))
    F = simplicial.chol_up(A, S)
    xi, xx = spsolve.spsolve_lower(F.L, np.array([99]), np.array([1.0]))
    assert xi.size <= 3  # banded: reach is tiny
    assert np.isclose(xx[0] if xi[0] == 99 else xx[-1],
                      1.0 / F.L.data[F.L.indptr[99]])
