"""Diagnostics, serialization, and Matrix Market I/O tests."""

import io

import numpy as np
import pytest

import suitesparse_tpu as sst
from suitesparse_tpu import diagnostics, serialize
from suitesparse_tpu.io import fixtures, matrix_market
from suitesparse_tpu.numeric import lu, simplicial, supernodal
from suitesparse_tpu.sparse import residual_norm


def test_rcond_and_condest():
    A = fixtures.banded_spd(80, 4, seed=0)
    S = simplicial.symbolic_cholesky(A, sst.ordering.amd_order(A))
    F = simplicial.chol_up(A, S)
    rc = diagnostics.rcond_from_factor(F)
    D = A.to_dense()
    true_cond1 = np.linalg.norm(D, 1) * np.linalg.norm(np.linalg.inv(D), 1)
    est = diagnostics.condest(A, lambda b: simplicial.chol_solve(F, b))
    assert 0 < rc <= 1.0
    # condest is a lower bound within a modest factor of the true 1-norm cond
    assert est <= true_cond1 * 1.001
    assert est >= true_cond1 / 50.0


def test_determinant_from_lu():
    A, D = None, None
    rng = np.random.default_rng(1)
    D = rng.standard_normal((12, 12)) * (rng.random((12, 12)) < 0.5)
    np.fill_diagonal(D, np.abs(D).sum(axis=1) + 1.0)
    A = sst.from_dense(D)
    S = lu.analyze_lu(A)
    N = lu.factor_lu(A, S)
    mant, expo = diagnostics.determinant_from_lu(N)
    det = mant * 10.0 ** expo
    assert np.isclose(det, np.linalg.det(D), rtol=1e-8)


def test_rgrowth_reasonable():
    A = fixtures.random_sparse(50, 50, density=0.1, seed=2)
    S = lu.analyze_lu(A)
    N = lu.factor_lu(A, S)
    g = diagnostics.rgrowth(A, N)
    assert 0 < g <= 1.0 + 1e-12


def test_serialize_simplicial(tmp_path):
    A = fixtures.laplacian_2d(10)
    S = simplicial.symbolic_cholesky(A, sst.ordering.amd_order(A))
    F = simplicial.chol_up(A, S)
    p = tmp_path / "factor.npz"
    serialize.save_factor(p, F)
    F2 = serialize.load_factor(p)
    b = np.ones(100)
    x1 = simplicial.chol_solve(F, b)
    x2 = simplicial.chol_solve(F2, b)
    assert np.allclose(x1, x2)
    # symbolic roundtrip
    ps = tmp_path / "sym.npz"
    serialize.save_symbolic(ps, S)
    S2 = serialize.load_symbolic(ps)
    F3 = simplicial.chol_up(A, S2)
    assert np.allclose(F3.L.data, F.L.data)


def test_serialize_supernodal(tmp_path):
    from suitesparse_tpu.symbolic.supernodes import analyze_supernodal
    A = fixtures.laplacian_2d(14)
    S = analyze_supernodal(A, sst.ordering.amd_order(A))
    F = supernodal.factorize_host(A, S)
    p = tmp_path / "super.npz"
    serialize.save_factor(p, supernodal.SupernodalFactorAdapter(F))
    F2 = serialize.load_factor(p)
    b = np.ones(A.ncol)
    x1 = simplicial.chol_solve(supernodal.SupernodalFactorAdapter(F), b)
    x2 = simplicial.chol_solve(F2, b)
    assert np.allclose(x1, x2)


def test_matrix_market_roundtrip(tmp_path):
    A = fixtures.random_sparse(20, 15, density=0.2, seed=3,
                               ensure_full_diag=False)
    p = tmp_path / "a.mtx"
    matrix_market.write_matrix_market(p, A)
    B = matrix_market.read_matrix_market(p)
    assert np.allclose(A.to_dense(), B.to_dense())
    # symmetric storage
    S = fixtures.laplacian_2d(6)
    p2 = tmp_path / "s.mtx"
    matrix_market.write_matrix_market(p2, S)
    S2 = matrix_market.read_matrix_market(p2)
    assert S2.sym == 1
    assert np.allclose(S.to_dense(), S2.to_dense())


def test_matrix_market_pattern_and_general():
    text = """%%MatrixMarket matrix coordinate pattern general
3 4 3
1 1
2 2
3 4
"""
    A = matrix_market.read_matrix_market(io.StringIO(text))
    assert A.shape == (3, 4) and A.nnz == 3
    assert A.to_dense()[2, 3] == 1.0
