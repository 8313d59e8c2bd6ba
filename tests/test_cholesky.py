"""Simplicial Cholesky numeric tests: vs dense LA, reference fixtures, residuals."""

import numpy as np
import pytest

import suitesparse_tpu as sst
from suitesparse_tpu.config import FactorKind, Ordering
from suitesparse_tpu.io import fixtures
from suitesparse_tpu.numeric import simplicial
from suitesparse_tpu.sparse import residual_norm

CFG_SIMPL_LL = sst.DEFAULT.replace(factor_kind=FactorKind.SIMPLICIAL_LL)
CFG_SIMPL_LDL = sst.DEFAULT.replace(factor_kind=FactorKind.SIMPLICIAL_LDL)
CFG_NATURAL = CFG_SIMPL_LL.replace(ordering=Ordering.NATURAL)


def spd_random(n, seed=0, density=0.2):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((n, n)) * (rng.random((n, n)) < density)
    D = np.triu(M, 1)
    D = D + D.T
    np.fill_diagonal(D, np.abs(D).sum(axis=1) + 1.0)
    return sst.from_dense(np.triu(D), sym=1), D


@pytest.mark.parametrize("n,seed", [(10, 0), (30, 1), (80, 2)])
def test_chol_up_vs_dense(n, seed):
    A, D = spd_random(n, seed)
    S = simplicial.symbolic_cholesky(A)  # natural order
    F = simplicial.chol_up(A, S)
    assert F.ok
    L = F.L.to_dense()
    assert np.allclose(L @ L.T, D, atol=1e-10)


@pytest.mark.parametrize("n,seed", [(10, 3), (40, 4)])
def test_ldl_up_vs_dense(n, seed):
    A, D = spd_random(n, seed)
    S = simplicial.symbolic_cholesky(A)
    F = simplicial.ldl_up(A, S)
    assert F.ok
    L = F.L.to_dense()
    assert np.allclose(L @ np.diag(F.d) @ L.T, D, atol=1e-10)


def test_lnz_matches_symbolic():
    A, D = spd_random(50, 5)
    S = simplicial.symbolic_cholesky(A)
    F = simplicial.chol_up(A, S)
    # stored nnz equals the symbolic prediction exactly
    assert F.L.nnz == S.lnz
    Ld = F.L.to_dense()
    assert np.count_nonzero(np.linalg.cholesky(D)) <= S.lnz  # symbolic is exact fill


@pytest.mark.parametrize("perm_cfg", [CFG_NATURAL, CFG_SIMPL_LL, CFG_SIMPL_LDL])
def test_cholsol_residual(perm_cfg):
    A, D = spd_random(60, 6)
    rng = np.random.default_rng(7)
    b = rng.standard_normal(60)
    x = sst.cholsol(A, b, perm_cfg)
    assert residual_norm(A, x, b) < 1e-12


def test_solve_multi_rhs():
    A, D = spd_random(30, 8)
    B = np.random.default_rng(9).standard_normal((30, 4))
    S = sst.analyze(A, CFG_SIMPL_LL)
    F = sst.factorize(A, S, CFG_SIMPL_LL)
    X = sst.solve(F, B)
    for k in range(4):
        assert residual_norm(A, X[:, k], B[:, k]) < 1e-12


def test_not_positive_definite():
    D = np.array([[1.0, 2.0], [2.0, 1.0]])  # indefinite
    A = sst.from_dense(np.triu(D), sym=1)
    S = simplicial.symbolic_cholesky(A)
    F = simplicial.chol_up(A, S)
    assert not F.ok and F.minor == 1  # fails at column 1 (cholmod L->minor semantics)
    # LDL' succeeds on indefinite
    F2 = simplicial.ldl_up(A, S)
    assert F2.ok
    L = F2.L.to_dense()
    assert np.allclose(L @ np.diag(F2.d) @ L.T, D)


# ---------------- reference fixture parity (cs_demo2-equivalent gate) ----------------

needs_ref = pytest.mark.skipif(not fixtures.have_reference(),
                               reason="reference mount not present")


@needs_ref
@pytest.mark.parametrize("name", ["bcsstk01", "bcsstk16"])
def test_reference_spd_fixture(name):
    A = fixtures.load_demo(name)
    n = A.ncol
    # b as in cs_demo: b[i] = 1 + i/n (cs_demo.c rhs convention)
    b = 1.0 + np.arange(n) / n
    x = sst.cholsol(A, b, CFG_SIMPL_LL)
    resid = residual_norm(A, x, b)
    assert resid < 1e-10, f"{name}: residual {resid}"
    # LDL' path too
    x2 = sst.cholsol(A, b, CFG_SIMPL_LDL)
    assert residual_norm(A, x2, b) < 1e-10


@needs_ref
def test_reference_amd_fill_bcsstk16():
    # bcsstk16 is banded FEM where natural is already good; the Python
    # min-degree fallback may lose slightly — guard against pathological
    # regressions only. The native AMD path is held to a tighter bound in
    # test_native.py.
    A = fixtures.load_demo("bcsstk16")
    S_nat = sst.analyze(A, CFG_NATURAL)
    S_amd = sst.analyze(A, CFG_SIMPL_LL)  # AMD default
    assert S_amd.lnz < 1.5 * S_nat.lnz


def test_laplacian_and_arrow():
    A = fixtures.laplacian_2d(12)
    n = A.ncol
    b = np.ones(n)
    x = sst.cholsol(A, b.copy(), CFG_SIMPL_LL)
    assert residual_norm(A, x, b) < 1e-12
    # arrow: AMD must beat natural massively
    Ar = fixtures.arrow_spd(200)
    S_nat = sst.analyze(Ar, CFG_NATURAL)
    S_amd = sst.analyze(Ar, CFG_SIMPL_LL)
    assert S_amd.lnz < S_nat.lnz / 10


def test_solve_system_nine_systems():
    """cholmod_solve's nine systems (cholmod_cholesky.h:179-187) vs dense."""
    import suitesparse_tpu as sst
    from suitesparse_tpu.io import fixtures
    from suitesparse_tpu.numeric import simplicial

    A = fixtures.random_spd(30, density=0.15, seed=21)
    S = sst.analyze(A)
    for kind in ("ll", "ldl"):
        F = (simplicial.chol_up(A, S) if kind == "ll"
             else simplicial.ldl_up(A, S))
        n = A.ncol
        rng = np.random.default_rng(5)
        b = rng.standard_normal(n)
        L = F.L.to_dense()
        D = np.diag(F.d) if F.d is not None else np.eye(n)
        P = np.eye(n)[F.perm]          # Pb = b[perm]
        Ad = A.to_dense()  # to_dense reflects the stored triangle
        cases = {
            "A": np.linalg.solve(Ad, b),
            "LDLt": np.linalg.solve(L @ D @ L.T, b),
            "LD": np.linalg.solve(L @ D, b),
            "DLt": np.linalg.solve(D @ L.T, b),
            "L": np.linalg.solve(L, b),
            "Lt": np.linalg.solve(L.T, b),
            "D": np.linalg.solve(D, b),
            "P": P @ b,
            "Pt": P.T @ b,
        }
        for sysname, want in cases.items():
            got = simplicial.solve_system(F, b, sysname)
            np.testing.assert_allclose(got, want, atol=1e-8,
                                       err_msg=f"{kind}:{sysname}")
