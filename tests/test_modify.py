"""Update/downdate + partial refactorization tests."""

import numpy as np
import pytest

import suitesparse_tpu as sst
from suitesparse_tpu.io import fixtures
from suitesparse_tpu.numeric import modify, simplicial
from suitesparse_tpu.sparse import from_triplets, residual_norm


def make_factor(n=60, seed=0):
    A = fixtures.random_spd(n, density=0.08, seed=seed)
    S = simplicial.symbolic_cholesky(A, sst.ordering.amd_order(A))
    F = simplicial.chol_up(A, S)
    assert F.ok
    return A, S, F


def w_in_pattern(F, jmin, seed):
    """Dense w whose pattern is a subset of L(:, jmin)'s pattern."""
    rng = np.random.default_rng(seed)
    L = F.L
    rows = L.indices[L.indptr[jmin]:L.indptr[jmin + 1]]
    w = np.zeros(L.ncol)
    w[rows] = rng.standard_normal(rows.size)
    return w


@pytest.mark.parametrize("jmin,seed", [(0, 1), (5, 2), (20, 3)])
def test_rank1_update_matches_refactor(jmin, seed):
    A, S, F = make_factor(seed=seed)
    w = w_in_pattern(F, jmin, seed)
    ok = modify.updown(F, +1.0, w)
    assert ok
    L = F.L.to_dense()
    # compare against dense cholesky of A(p,p) + w w'
    C = A.symperm(S.perm).to_dense() + np.outer(w, w)
    Lref = np.linalg.cholesky(C)
    assert np.allclose(L, Lref, atol=1e-10)


@pytest.mark.parametrize("jmin,seed", [(0, 4), (10, 5)])
def test_rank1_downdate_roundtrip(jmin, seed):
    A, S, F = make_factor(seed=seed)
    L0 = F.L.to_dense().copy()
    w = w_in_pattern(F, jmin, seed)
    assert modify.updown(F, +1.0, w)
    assert modify.updown(F, -1.0, w)
    assert np.allclose(F.L.to_dense(), L0, atol=1e-8)


def test_downdate_to_indefinite_fails_cleanly():
    A, S, F = make_factor(seed=6)
    # w = 2*sqrt(C[j,j]) e_j guarantees C - w w' has a negative diagonal
    Cjj = F.L.data[F.L.indptr[0]] ** 2  # C[0,0] = L[0,0]^2 + 0
    w = np.zeros(F.L.ncol)
    w[0] = 2.0 * np.sqrt(Cjj)
    ok = modify.updown(F, -1.0, w)
    assert not ok


def test_affected_columns():
    parent = np.array([2, 2, 4, 4, -1])
    aff = modify.affected_columns(parent, [0])
    assert np.array_equal(aff, [0, 2, 4])
    aff = modify.affected_columns(parent, [1, 3])
    assert np.array_equal(aff, [1, 2, 3, 4])


def test_partial_refactor_matches_full():
    A, S, F = make_factor(n=80, seed=8)
    rng = np.random.default_rng(9)
    # change values in a few columns (and symmetric rows), same pattern
    changed = [3, 17]
    data = A.data.copy()
    cols = np.repeat(np.arange(A.ncol), np.diff(A.indptr))
    for c in changed:
        sel = (cols == c) | (A.indices == c)
        data[sel] *= 1.0 + 0.3 * rng.random(int(sel.sum()))
    # keep diagonal dominance
    A2 = sst.CSC(A.nrow, A.ncol, A.indptr, A.indices, data, 1)
    # changed columns in PERMUTED space
    pinv = np.empty(A.ncol, dtype=np.int64)
    pinv[S.perm] = np.arange(A.ncol)
    changed_perm = pinv[np.array(changed)]
    # rows that changed symmetrically also touch their columns
    touched = set()
    for c in changed:
        sel = (cols == c) | (A.indices == c)
        touched.update(pinv[cols[sel]].tolist())
        touched.update(pinv[A.indices[sel]].tolist())
    F2 = modify.refactor_partial(A2, S, simplicial.chol_up(A, S),
                                 sorted(touched))
    assert F2.ok
    Fref = simplicial.chol_up(A2, S)
    assert np.allclose(F2.L.data, Fref.L.data, atol=1e-10)
    b = rng.standard_normal(A.ncol)
    x = simplicial.chol_solve(F2, b)
    assert residual_norm(A2, x, b) < 1e-12


def test_full_refactor():
    A, S, F = make_factor(n=50, seed=10)
    A2 = sst.CSC(A.nrow, A.ncol, A.indptr, A.indices, A.data * 1.7, 1)
    F2 = modify.refactor_full(A2, S, F)
    assert F2.ok
    b = np.ones(50)
    x = simplicial.chol_solve(F2, b)
    assert residual_norm(A2, x, b) < 1e-12


def test_rowdel_matches_refactor():
    A, S, F = make_factor(n=50, seed=20)
    k = 17
    ok = modify.rowdel(F, k)
    assert ok
    # reference: factor the matrix with row/col k -> e_k (in PERMUTED space)
    C = A.symperm(S.perm).to_dense()
    C[k, :] = 0.0
    C[:, k] = 0.0
    C[k, k] = 1.0
    Lref = np.linalg.cholesky(C)
    assert np.allclose(F.L.to_dense(), Lref, atol=1e-8)


def test_rowadd_roundtrip():
    A, S, F = make_factor(n=40, seed=21)
    k = 11
    C = A.symperm(S.perm).to_dense()
    colk = C[:, k].copy()
    # delete then re-add the same row/col: factor must return (same pattern)
    L0 = F.L.to_dense().copy()
    assert modify.rowdel(F, k)
    assert modify.rowadd(F, k, colk)
    assert np.allclose(F.L.to_dense(), L0, atol=1e-7)

@pytest.mark.parametrize("k,seed", [(2, 7), (4, 8), (8, 9)])
def test_rank_k_update_matches_refactor(k, seed):
    A, S, F = make_factor(seed=seed)
    rng = np.random.default_rng(seed)
    n = F.L.ncol
    W = np.zeros((n, k))
    for v in range(k):
        W[:, v] = w_in_pattern(F, int(rng.integers(0, 30)), seed * 10 + v)
    ok = modify.updown_k(F, +1.0, W)
    assert ok
    C = A.symperm(S.perm).to_dense() + W @ W.T
    Lref = np.linalg.cholesky(C)
    assert np.allclose(F.L.to_dense(), Lref, atol=1e-9)


def test_rank_k_downdate_roundtrip():
    A, S, F = make_factor(seed=10)
    L0 = F.L.to_dense().copy()
    rng = np.random.default_rng(11)
    n = F.L.ncol
    W = np.column_stack([0.2 * w_in_pattern(F, j, 12 + j) for j in (0, 3, 9)])
    assert modify.updown_k(F, +1.0, W)
    assert modify.updown_k(F, -1.0, W)
    assert np.allclose(F.L.to_dense(), L0, atol=1e-7)


@pytest.mark.parametrize("k,seed", [(1, 13), (3, 14)])
def test_updown_solve_co_update(k, seed):
    """cholmod_updown_solve analog: L_new y_new = b maintained in one pass."""
    A, S, F = make_factor(seed=seed)
    n = F.L.ncol
    rng = np.random.default_rng(seed)
    b = rng.standard_normal(n)
    L0 = F.L.to_dense()
    y = np.linalg.solve(L0, b)
    W = np.column_stack(
        [w_in_pattern(F, int(rng.integers(0, 20)), seed * 7 + v)
         for v in range(k)])
    ok = modify.updown_solve(F, +1.0, W, y)
    assert ok
    Lnew = F.L.to_dense()
    assert np.allclose(Lnew @ y, b, atol=1e-8)


def test_resymbol_prunes_and_preserves():
    """cholmod_resymbol analog: tighter pattern after dropping A entries,
    values preserved at surviving positions."""
    A, S, F = make_factor(seed=30)
    # factor is correct for A; resymbol against the SAME A must preserve the
    # factorization exactly (pattern can only shrink to the tight reach)
    F2 = modify.resymbol(A, F)
    np.testing.assert_allclose(F2.L.to_dense(), F.L.to_dense(), atol=0)
    assert F2.L.nnz <= F.L.nnz
