"""Complex (Hermitian / general) host-path tests — the CXSparse parity axis."""

import numpy as np
import pytest

import suitesparse_tpu as sst
from suitesparse_tpu.numeric import simplicial, lu
from suitesparse_tpu.ordering.amd import amd_order


def hermitian_pd(n, seed=0, density=0.25):
    rng = np.random.default_rng(seed)
    M = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)))
    M *= rng.random((n, n)) < density
    D = np.triu(M, 1)
    D = D + D.conj().T
    np.fill_diagonal(D, np.abs(D).sum(axis=1).real + 1.0)
    return sst.from_dense(np.triu(D), sym=1), D


@pytest.mark.parametrize("n,seed", [(12, 0), (40, 1)])
def test_hermitian_cholesky(n, seed):
    A, D = hermitian_pd(n, seed)
    assert np.allclose(A.to_dense(), D)  # Hermitian reflection
    S = simplicial.symbolic_cholesky(A, amd_order(A))
    F = simplicial.chol_up(A, S)
    assert F.ok
    L = F.L.to_dense()
    P = D[np.ix_(S.perm, S.perm)]
    assert np.allclose(L @ L.conj().T, P, atol=1e-10)
    # end-to-end solve
    rng = np.random.default_rng(seed + 5)
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    x = simplicial.chol_solve(F, b)
    r = D @ x - b
    assert np.abs(r).max() < 1e-10


def test_hermitian_symperm_roundtrip():
    A, D = hermitian_pd(15, 3)
    p = np.random.default_rng(4).permutation(15)
    C = A.symperm(p)
    assert np.allclose(C.to_dense(), D[np.ix_(p, p)])


@pytest.mark.parametrize("n,seed", [(10, 2), (30, 3)])
def test_complex_lu(n, seed):
    rng = np.random.default_rng(seed)
    D = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)))
    D *= rng.random((n, n)) < 0.3
    np.fill_diagonal(D, np.abs(D).sum(axis=1) + 1.0)
    A = sst.from_dense(D)
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    x = sst.lusol(A, b)
    assert np.allclose(D @ x, b, atol=1e-10)
