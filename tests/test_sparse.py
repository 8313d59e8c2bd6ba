"""Container + structural-op tests (cholmod Core / MatrixOps analog coverage)."""

import numpy as np
import pytest

from suitesparse_tpu import CSC, from_dense, from_triplets, eye
from suitesparse_tpu.sparse import invert_permutation, residual_norm


def random_csc(nrow, ncol, density=0.3, seed=0, sym=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((nrow, ncol)) * (rng.random((nrow, ncol)) < density)
    if sym == 1:
        A = np.triu(A + A.T)
    return from_dense(A, sym=sym), (A if sym == 0 else None)


def test_from_triplets_duplicates():
    A = from_triplets(3, 3, [0, 0, 1, 2], [0, 0, 1, 2], [1.0, 2.0, 3.0, 4.0])
    assert A.nnz == 3
    assert np.allclose(A.to_dense(), np.diag([3.0, 3.0, 4.0]))
    A.check()


def test_roundtrip_dense():
    rng = np.random.default_rng(1)
    D = rng.standard_normal((7, 5)) * (rng.random((7, 5)) < 0.4)
    A = from_dense(D)
    A.check()
    assert np.allclose(A.to_dense(), D)


def test_transpose():
    A, D = random_csc(8, 6, seed=2)
    At = A.transpose()
    At.check()
    assert np.allclose(At.to_dense(), D.T)


def test_permuted():
    A, D = random_csc(6, 6, seed=3)
    rng = np.random.default_rng(4)
    p = rng.permutation(6)
    q = rng.permutation(6)
    C = A.permuted(p, q)
    C.check()
    assert np.allclose(C.to_dense(), D[np.ix_(p, q)])


def test_symperm():
    n = 9
    rng = np.random.default_rng(5)
    D = rng.standard_normal((n, n))
    D = D + D.T + 10 * np.eye(n)
    D *= rng.random((n, n)) < 0.5  # sparsify (asymmetric mask on full matrix)
    D = np.triu(D) + np.triu(D, 1).T  # resymmetrize
    A = from_dense(np.triu(D), sym=1)
    p = rng.permutation(n)
    C = A.symperm(p)
    C.check()
    assert C.sym == 1
    assert np.allclose(C.to_dense(), D[np.ix_(p, p)])


def test_matvec_sym_and_general():
    A, D = random_csc(8, 8, seed=6)
    x = np.arange(8.0)
    assert np.allclose(A.matvec(x), D @ x)
    S, _ = random_csc(8, 8, seed=7, sym=1)
    Dfull = S.to_dense()
    assert np.allclose(S.matvec(x), Dfull @ x)
    # multi-RHS
    X = np.arange(16.0).reshape(8, 2)
    assert np.allclose(A.matvec(X), D @ X)


def test_add_and_norms():
    A, DA = random_csc(5, 5, seed=8)
    B, DB = random_csc(5, 5, seed=9)
    C = A.add(B, 2.0, -1.0)
    assert np.allclose(C.to_dense(), 2 * DA - DB)
    assert np.isclose(A.norm1(), np.abs(DA).sum(axis=0).max())
    assert np.isclose(A.norm_inf(), np.abs(DA).sum(axis=1).max())


def test_matmat():
    A, DA = random_csc(6, 4, seed=10)
    B, DB = random_csc(4, 5, seed=11)
    C = A.matmat(B)
    assert np.allclose(C.to_dense(), DA @ DB)


def test_aat_pattern():
    A, D = random_csc(6, 6, seed=12)
    S = A.aat_pattern()
    expect = ((D != 0) | (D.T != 0))
    np.fill_diagonal(expect, False)
    got = S.to_dense() != 0
    assert np.array_equal(got, expect)


def test_tril_triu_full_storage():
    A, D = random_csc(6, 6, seed=13)
    assert np.allclose(A.tril().to_dense(), np.tril(D))
    assert np.allclose(A.triu().to_dense(), np.triu(D))
    S, _ = random_csc(6, 6, seed=14, sym=1)
    F = S.to_full_storage()
    assert np.allclose(F.to_dense(), S.to_dense())


def test_invert_permutation_and_residual():
    p = np.array([2, 0, 1])
    assert np.array_equal(invert_permutation(p), np.array([1, 2, 0]))
    A = eye(3)
    assert residual_norm(A, np.ones(3), np.ones(3)) == 0.0
