"""LU path tests: Gilbert–Peierls blocks, BTF driver, refactor, fixtures."""

import numpy as np
import pytest

import suitesparse_tpu as sst
from suitesparse_tpu import native
from suitesparse_tpu.io import fixtures
from suitesparse_tpu.numeric import lu
from suitesparse_tpu.sparse import residual_norm


def random_square(n, density=0.2, seed=0):
    rng = np.random.default_rng(seed)
    D = rng.standard_normal((n, n)) * (rng.random((n, n)) < density)
    np.fill_diagonal(D, rng.standard_normal(n) + np.sign(np.diag(D) + 0.5) * (
        np.abs(D).sum(axis=1) + 1.0))
    return sst.from_dense(D), D


@pytest.mark.parametrize("n,seed", [(10, 0), (40, 1), (100, 2)])
def test_lusol_vs_dense(n, seed):
    A, D = random_square(n, seed=seed)
    rng = np.random.default_rng(seed + 10)
    b = rng.standard_normal(n)
    x = sst.lusol(A, b)
    assert residual_norm(A, x, b) < 1e-12
    assert np.allclose(x, np.linalg.solve(D, b), atol=1e-8)


@pytest.mark.parametrize("use_native", [True, False])
def test_block_lu_factors(use_native, monkeypatch):
    if use_native and not native.available():
        pytest.skip("no native lib")
    if not use_native:
        monkeypatch.setattr(native, "available", lambda: False)
    rng = np.random.default_rng(3)
    n = 30
    D = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.3)
    np.fill_diagonal(D, 10.0)
    C = sst.from_dense(D)
    blu, status = lu._factor_block(C, tol=1.0)
    assert status == 0
    L = sst.CSC(n, n, blu.Lp, blu.Li, blu.Lx, 0).to_dense()
    U = sst.CSC(n, n, blu.Up, blu.Ui, blu.Ux, 0).to_dense()
    # PA = LU with P[k] = original row of pivot k
    PA = D[blu.P, :]
    assert np.allclose(L @ U, PA, atol=1e-10), "LU != PA"
    assert np.allclose(np.diag(L), 1.0)


def test_lu_partial_pivoting_stability():
    # small pivots on the diagonal force off-diagonal pivoting
    D = np.array([[1e-16, 1.0, 0.0],
                  [1.0, 0.0, 2.0],
                  [0.0, 3.0, 1.0]])
    A = sst.from_dense(D)
    b = np.array([1.0, 2.0, 3.0])
    cfg = sst.DEFAULT.replace(lu_pivot_tol=1.0, lu_btf=False, lu_scale=0)
    x = sst.lusol(A, b, cfg)
    assert np.allclose(x, np.linalg.solve(D, b), atol=1e-10)


def test_lusol_multi_rhs_and_btf_blocks():
    # block upper triangular structure with several SCCs
    rng = np.random.default_rng(4)
    n = 60
    D = np.zeros((n, n))
    # three strongly-connected diagonal blocks + upper coupling
    for lo, hi in [(0, 20), (20, 45), (45, 60)]:
        k = hi - lo
        B = rng.standard_normal((k, k)) * (rng.random((k, k)) < 0.4)
        np.fill_diagonal(B, np.abs(B).sum(axis=1) + 1.0)
        # a cycle to make it strongly connected
        for i in range(k):
            B[i, (i + 1) % k] = B[i, (i + 1) % k] if B[i, (i + 1) % k] else 0.5
        D[lo:hi, lo:hi] = B
    D[5, 30] = 1.0
    D[25, 50] = 2.0
    # scramble
    p = rng.permutation(n)
    q = rng.permutation(n)
    Ds = D[np.ix_(p, q)]
    A = sst.from_dense(Ds)
    S = lu.analyze_lu(A)
    assert S.btf.nblocks >= 3
    N = lu.factor_lu(A, S)
    assert N.ok
    B = rng.standard_normal((n, 3))
    X = lu.solve_lu(N, B)
    for k in range(3):
        assert residual_norm(A, X[:, k], B[:, k]) < 1e-12


def test_refactor_same_pattern():
    rng = np.random.default_rng(5)
    A, D = random_square(50, density=0.25, seed=6)
    S = lu.analyze_lu(A)
    N = lu.factor_lu(A, S)
    assert N.ok
    # new values, same pattern
    A2 = sst.CSC(A.nrow, A.ncol, A.indptr, A.indices,
                 A.data * rng.uniform(0.5, 2.0, size=A.nnz), 0)
    N2 = lu.refactor_lu(A2, N)
    assert N2.ok
    b = rng.standard_normal(50)
    x = lu.solve_lu(N2, b)
    assert residual_norm(A2, x, b) < 1e-10


def test_singular_detection():
    D = np.array([[1.0, 2.0], [2.0, 4.0]])  # rank 1
    A = sst.from_dense(D)
    S = lu.analyze_lu(A)
    N = lu.factor_lu(A, S)
    assert not N.ok
    with pytest.raises(AssertionError):
        lu.solve_lu(N, np.ones(2))


needs_ref = pytest.mark.skipif(not fixtures.have_reference(),
                               reason="reference mount not present")


@needs_ref
@pytest.mark.parametrize("name", ["t1", "fs_183_1", "west0067"])
def test_reference_unsym_fixtures(name):
    A = fixtures.load_demo(name)
    n = A.ncol
    b = 1.0 + np.arange(n) / n
    x = sst.lusol(A, b)
    resid = residual_norm(A, x, b)
    assert resid < 1e-10, f"{name}: residual {resid}"


def test_extract_lu_identity():
    """klu_extract analog: diag(1/Rs[P]) A[P,Q] == L@U + F_off."""
    import numpy as np
    from suitesparse_tpu.io import fixtures
    from suitesparse_tpu.numeric import lu

    A = fixtures.load_demo("west0067")
    S = lu.analyze_lu(A)
    N = lu.factor_lu(A, S)
    assert N.ok
    lu.sort_lu(N)
    L, U, Off, P, Q, Rs = lu.extract_lu(N)
    Ad = A.to_dense()
    lhs = (Ad[np.ix_(P, Q)].T / Rs[P]).T
    rhs = L.to_dense() @ U.to_dense() + Off.to_dense()
    np.testing.assert_allclose(lhs, rhs, atol=1e-10)
    # sorted factors: strictly ascending row indices per column
    for M in (L, U):
        for j in range(M.ncol):
            rr = M.indices[M.indptr[j]:M.indptr[j + 1]]
            assert np.all(np.diff(rr) > 0)


def test_umfpack_demo_set():
    """Config #4 gate: the reference UMFPACK Demo HB set (umf4.c workflow —
    read Harwell-Boeing, factorize, solve b = A*ones, report residual)."""
    import os
    import numpy as np
    import suitesparse_tpu as sst
    from suitesparse_tpu.io.rutherford_boeing import read_rb
    from suitesparse_tpu.numeric.multifrontal_lu import mflusol

    hb = "/root/reference/UMFPACK/Demo/HB"
    if not os.path.isdir(hb):
        import pytest
        pytest.skip("reference mount unavailable")
    for fname in ("west0067.rua", "arc130.rua", "fs_183_6.rua"):
        A = read_rb(os.path.join(hb, fname))
        x_true = np.ones(A.ncol)
        b = A.matvec(x_true)
        # KLU-style path (partial pivoting)
        x = sst.lusol(A, b)
        r1 = sst.residual_norm(A, x, b)
        assert r1 < 1e-10, (fname, r1)
        # UMFPACK-style multifrontal path (strategy auto + IR)
        x2 = mflusol(A, b)
        r2 = sst.residual_norm(A, x2, b)
        assert r2 < 1e-8, (fname, r2)


def test_eisenstat_liu_pruning_same_factor():
    """Pruned symbolic DFS must produce the same L/U values as an oracle
    dense LU (pruning changes traversal, not the factorization)."""
    import numpy as np
    from suitesparse_tpu import sparse
    from suitesparse_tpu.numeric.lu import factor_lu, lusol
    from suitesparse_tpu.config import DEFAULT

    rng = np.random.default_rng(11)
    # arrow + band pattern: heavy symmetric structure, the pruning case
    n = 80
    M = np.diag(rng.standard_normal(n) + 4.0)
    M[0, :] = rng.standard_normal(n)
    M[:, 0] = rng.standard_normal(n)
    for k in (1, 2, 3):
        M += np.diag(rng.standard_normal(n - k), k)
        M += np.diag(rng.standard_normal(n - k), -k)
    A = sparse.from_dense(M)
    b = rng.standard_normal(n)
    x = lusol(A, b, DEFAULT)
    assert np.abs(M @ x - b).max() < 1e-9


def test_btf_work_limit_budget():
    """work_limit > 0 must be honored (suboptimal matching allowed) and the
    default unlimited path must find the full transversal."""
    import numpy as np
    from suitesparse_tpu import sparse
    from suitesparse_tpu.ordering.btf import maxtrans

    rng = np.random.default_rng(3)
    n = 60
    M = np.where(rng.random((n, n)) < 0.15, 1.0, 0.0)
    M[np.arange(1, n), np.arange(n - 1)] = 1.0  # subdiagonal keeps it matched
    A = sparse.from_dense(M)
    full, _ = maxtrans(A)
    tiny, _ = maxtrans(A, work_limit=1e-9)
    assert tiny <= full
    again, _ = maxtrans(A, work_limit=-1.0)
    assert again == full


def test_lu_prep_native_matches_numpy(monkeypatch):
    """The fused native permutation/block/off maps (sstpu_lu_prep) must
    reproduce the numpy _prep_perm pipeline exactly: same permuted pattern,
    per-block local CSCs, singleton diag positions, and off maps — so the
    factor built on either path is identical."""
    from suitesparse_tpu import native
    from suitesparse_tpu.numeric import lu as klu

    if not (native.available() and native.has("sstpu_lu_prep")):
        pytest.skip("native lu_prep unavailable")
    A = fixtures.load_demo("west0067") if fixtures.have_reference() else \
        fixtures.random_sparse(120, 120, 0.06, seed=5)
    S = klu.analyze_lu(A)
    N_native = klu.factor_lu(A, S)
    x1 = klu.solve_lu(N_native, np.ones(A.ncol))

    real_has = native.has
    monkeypatch.setattr(native, "has",
                        lambda nm: False if nm == "sstpu_lu_prep"
                        else real_has(nm))
    S2 = klu.analyze_lu(A)
    N_np = klu.factor_lu(A, S2)
    x2 = klu.solve_lu(N_np, np.ones(A.ncol))
    assert np.array_equal(x1, x2)
    assert np.array_equal(N_native.rowperm, N_np.rowperm)
    assert np.array_equal(N_native.Off.indptr, N_np.Off.indptr)
    assert np.array_equal(N_native.Off.indices, N_np.Off.indices)
    assert np.array_equal(N_native.Off.data, N_np.Off.data)
    for bk1, bk2 in zip(N_native.blocks, N_np.blocks):
        assert (bk1 is None) == (bk2 is None)
