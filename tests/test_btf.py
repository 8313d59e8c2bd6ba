"""BTF tests: maximum transversal + SCC + block form, native vs Python."""

import numpy as np
import pytest

from suitesparse_tpu import from_dense, native
from suitesparse_tpu.ordering import btf


def brute_force_max_matching(D):
    """Exponential-free simple augmenting-path matching on dense bool D."""
    m, n = D.shape
    rowmatch = np.full(m, -1)

    def try_col(j, seen):
        for i in range(m):
            if D[i, j] and not seen[i]:
                seen[i] = True
                if rowmatch[i] == -1 or try_col(rowmatch[i], seen):
                    rowmatch[i] = j
                    return True
        return False

    cnt = 0
    for j in range(n):
        if try_col(j, np.zeros(m, dtype=bool)):
            cnt += 1
    return cnt


@pytest.mark.parametrize("seed", range(8))
def test_maxtrans_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    m, n = rng.integers(3, 15, size=2)
    D = rng.random((m, n)) < 0.25
    A = from_dense(np.where(D, 1.0, 0.0))
    nmatch, match = btf.maxtrans(A)
    # validity
    used = set()
    for j in range(n):
        if match[j] >= 0:
            assert D[match[j], j], "matched on a zero entry"
            assert match[j] not in used
            used.add(match[j])
    assert nmatch == len(used)
    assert nmatch == brute_force_max_matching(D), "not maximum"


@pytest.mark.parametrize("seed", range(8))
def test_maxtrans_python_equals_native(seed):
    if not native.available():
        pytest.skip("no native lib")
    rng = np.random.default_rng(100 + seed)
    m, n = rng.integers(3, 20, size=2)
    D = rng.random((m, n)) < 0.3
    A = from_dense(np.where(D, 1.0, 0.0))
    n_nat, _ = native.maxtrans(A.nrow, A.ncol, A.indptr, A.indices)
    n_py, _ = btf._maxtrans_python(A.nrow, A.ncol, A.indptr, A.indices)
    assert n_nat == n_py


def scc_oracle(D):
    """SCC membership via boolean transitive closure."""
    n = D.shape[0]
    R = D.copy() | np.eye(n, dtype=bool)
    for _ in range(n):
        R2 = R @ R
        if (R2 == R).all():
            break
        R = R2
    both = R & R.T
    comp = {}
    for v in range(n):
        key = tuple(np.nonzero(both[v])[0])
        comp.setdefault(key, []).append(v)
    return set(frozenset(v) for v in comp.values())


@pytest.mark.parametrize("seed", range(8))
def test_strongcomp_vs_oracle(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(3, 18))
    D = rng.random((n, n)) < 0.2
    np.fill_diagonal(D, True)
    A = from_dense(np.where(D, 1.0, 0.0))
    nb, p, r = btf.strongcomp(A)
    got = set(frozenset(p[r[k]:r[k + 1]].tolist()) for k in range(nb))
    # oracle: edge j->i iff A[i,j] != 0 (column points at rows)
    expect = scc_oracle(D.T)
    assert got == expect
    # block upper triangular: no entries below the diagonal blocks
    Dp = D[np.ix_(p, p)]
    for k in range(nb):
        assert not Dp[r[k + 1]:, r[k]:r[k + 1]].any(), "entries below block diag"


@pytest.mark.parametrize("seed", range(6))
def test_btf_order_properties(seed):
    rng = np.random.default_rng(200 + seed)
    n = int(rng.integers(5, 30))
    D = rng.random((n, n)) < 0.15
    np.fill_diagonal(D, True)  # structurally nonsingular
    A = from_dense(np.where(D, rng.standard_normal((n, n)), 0.0))
    # ensure the diagonal values are nonzero
    d = A.to_dense()
    np.fill_diagonal(d, 1.0 + np.abs(np.diag(d)))
    A = from_dense(d)
    B = btf.btf_order(A)
    assert B.structural_rank == n
    Dp = (A.to_dense() != 0)[np.ix_(B.rowperm, B.colperm)]
    assert Dp.diagonal().all(), "zero-free diagonal expected"
    for k in range(B.nblocks):
        assert not Dp[B.r[k + 1]:, B.r[k]:B.r[k + 1]].any()
