"""Symbolic analysis tests vs brute-force elimination oracles."""

import numpy as np
import pytest

from suitesparse_tpu import from_dense
from suitesparse_tpu.symbolic import (col_counts, ereach, etree, postorder,
                                      tree_levels)


def random_sym_pattern(n, density=0.25, seed=0):
    """Random symmetric SPD-patterned dense matrix + upper-stored CSC."""
    rng = np.random.default_rng(seed)
    M = rng.random((n, n)) < density
    M = np.triu(M, 1)
    D = M + M.T
    np.fill_diagonal(D, True)
    vals = rng.standard_normal((n, n)) * D
    vals = np.triu(vals) + np.triu(vals, 1).T
    np.fill_diagonal(vals, n * 2.0)  # diagonally dominant → SPD
    A = from_dense(np.triu(vals), sym=1)
    return A, vals


def chol_fill_pattern(D):
    """Brute-force L pattern by elimination closure (O(n^3) oracle)."""
    n = D.shape[0]
    P = (D != 0)
    L = np.tril(P)
    for k in range(n):
        rows = np.nonzero(L[k + 1:, k])[0] + k + 1
        for a in rows:
            L[a, rows[rows <= a]] = True
    return L


def etree_oracle(Lpat):
    """parent[j] = min{i > j : L[i,j] != 0}."""
    n = Lpat.shape[0]
    parent = np.full(n, -1, dtype=np.int64)
    for j in range(n):
        below = np.nonzero(Lpat[j + 1:, j])[0]
        if below.size:
            parent[j] = below[0] + j + 1
    return parent


@pytest.mark.parametrize("n,seed", [(10, 0), (25, 1), (40, 2), (60, 3)])
def test_etree_vs_oracle(n, seed):
    A, D = random_sym_pattern(n, seed=seed)
    Lpat = chol_fill_pattern(D)
    assert np.array_equal(etree(A), etree_oracle(Lpat))


@pytest.mark.parametrize("n,seed", [(10, 0), (30, 4), (50, 5)])
def test_col_counts_vs_oracle(n, seed):
    A, D = random_sym_pattern(n, seed=seed)
    Lpat = chol_fill_pattern(D)
    parent = etree(A)
    post = postorder(parent)
    cc = col_counts(A, parent, post)
    assert np.array_equal(cc, Lpat.sum(axis=0))


def test_postorder_is_valid():
    A, _ = random_sym_pattern(30, seed=6)
    parent = etree(A)
    post = postorder(parent)
    assert np.array_equal(np.sort(post), np.arange(30))
    # children appear before parents
    pos = np.empty(30, dtype=np.int64)
    pos[post] = np.arange(30)
    for j in range(30):
        if parent[j] != -1:
            assert pos[j] < pos[parent[j]]


@pytest.mark.parametrize("n,seed", [(20, 7), (35, 8)])
def test_ereach_matches_row_pattern(n, seed):
    A, D = random_sym_pattern(n, seed=seed)
    Lpat = chol_fill_pattern(D)
    parent = etree(A)
    mark = np.full(n, -1, dtype=np.int64)
    buf = np.zeros(n, dtype=np.int64)
    for k in range(n):
        top = ereach(A, k, parent, mark, buf)
        got = set(buf[top:n].tolist())
        expect = set(np.nonzero(Lpat[k, :k])[0].tolist())
        assert got == expect, f"row {k}"
        # topological: each node appears after its descendants in the list
        seq = buf[top:n].tolist()
        pos = {v: i for i, v in enumerate(seq)}
        for v in seq:
            p = parent[v]
            if p in pos:
                assert pos[p] > pos[v]


def test_colcounts_ata_vs_oracle():
    rng = np.random.default_rng(9)
    m, n = 18, 12
    D = rng.standard_normal((m, n)) * (rng.random((m, n)) < 0.3)
    # ensure no empty columns/rows for a clean oracle
    for j in range(n):
        if not D[:, j].any():
            D[rng.integers(m), j] = 1.0
    A = from_dense(D)
    AtA = D.T @ D + 1e-9 * np.eye(n)
    # oracle on explicit A'A pattern (values positive-definite-ish)
    pat = (D.T != 0) @ (D != 0)  # boolean product = A'A pattern
    vals = np.where(pat, 1.0, 0.0)
    np.fill_diagonal(vals, n * 2.0)
    Lpat = chol_fill_pattern(vals)
    parent = etree(A, ata=True)
    post = postorder(parent)
    cc = col_counts(A, parent, post, ata=True)
    assert np.array_equal(cc, Lpat.sum(axis=0))


def test_tree_levels():
    A, _ = random_sym_pattern(40, seed=10)
    parent = etree(A)
    level, levels = tree_levels(parent)
    seen = np.concatenate(levels)
    assert np.array_equal(np.sort(seen), np.arange(40))
    for j in range(40):
        if parent[j] != -1:
            assert level[parent[j]] > level[j]
