"""Native C++ kernel tests: parity with Python oracles + AMD quality bounds."""

import importlib

import numpy as np
import pytest

from suitesparse_tpu import from_dense, native
from suitesparse_tpu.io import fixtures
from suitesparse_tpu.numeric import simplicial

pyet = importlib.import_module("suitesparse_tpu.symbolic.etree")

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")


def rand_sym(n, density, seed):
    rng = np.random.default_rng(seed)
    M = rng.random((n, n)) < density
    M = np.triu(M, 1)
    D = M + M.T
    np.fill_diagonal(D, True)
    vals = np.where(D, 1.0, 0.0)
    np.fill_diagonal(vals, 2.0 * n)
    return from_dense(np.triu(vals), sym=1)


@pytest.mark.parametrize("n,density,seed", [(30, 0.2, 0), (80, 0.1, 1),
                                            (150, 0.05, 2)])
def test_native_symbolic_parity(n, density, seed, monkeypatch):
    A = rand_sym(n, density, seed)
    par_nat = pyet.etree(A)
    post_nat = pyet.postorder(par_nat)
    cc_nat = pyet.col_counts(A, par_nat, post_nat)
    monkeypatch.setattr(native, "available", lambda: False)
    par_py = pyet.etree(A)
    post_py = pyet.postorder(par_py)
    cc_py = pyet.col_counts(A, par_py, post_py)
    assert np.array_equal(par_nat, par_py)
    assert np.array_equal(post_nat, post_py)
    assert np.array_equal(cc_nat, cc_py)


def test_native_ata_parity(monkeypatch):
    rng = np.random.default_rng(7)
    D = rng.standard_normal((25, 18)) * (rng.random((25, 18)) < 0.25)
    for j in range(18):
        if not D[:, j].any():
            D[rng.integers(25), j] = 1.0
    A = from_dense(D)
    par_nat = pyet.etree(A, ata=True)
    post_nat = pyet.postorder(par_nat)
    cc_nat = pyet.col_counts(A, par_nat, post_nat, ata=True)
    monkeypatch.setattr(native, "available", lambda: False)
    assert np.array_equal(par_nat, pyet.etree(A, ata=True))
    cc_py = pyet.col_counts(A, par_nat, post_nat, ata=True)
    assert np.array_equal(cc_nat, cc_py)


# Reference-AMD lnz on these inputs, measured by running the reference's own
# compiled amd_l_order (see SURVEY §2.2) on this machine. The native AMD must
# stay within 15% — a quality regression guard, not an exactness requirement
# (tie-breaking differs).
AMD_QUALITY = [
    ("lap2d_30", lambda: fixtures.laplacian_2d(30), 10231),
    ("lap3d_12", lambda: fixtures.laplacian_3d(12), 76038),
]


@pytest.mark.parametrize("name,gen,ref_lnz", AMD_QUALITY,
                         ids=[t[0] for t in AMD_QUALITY])
def test_amd_quality(name, gen, ref_lnz):
    A = gen()
    n = A.ncol
    S_pat = A.aat_pattern()
    p = native.amd(S_pat.indptr, S_pat.indices, n)
    assert np.array_equal(np.sort(p), np.arange(n))
    S = simplicial.symbolic_cholesky(A, p)
    assert S.lnz <= 1.15 * ref_lnz, f"{name}: lnz {S.lnz} vs reference {ref_lnz}"


needs_ref = pytest.mark.skipif(not fixtures.have_reference(),
                               reason="reference mount not present")


@needs_ref
def test_amd_quality_bcsstk16():
    A = fixtures.load_demo("bcsstk16")
    S_pat = A.aat_pattern()
    p = native.amd(S_pat.indptr, S_pat.indices, A.ncol)
    S = simplicial.symbolic_cholesky(A, p)
    # reference amd_l_order measures 812183 on this fixture
    assert S.lnz <= 1.15 * 812183


def test_amd_handles_dense_rows():
    A = fixtures.arrow_spd(500, heads=3)
    S_pat = A.aat_pattern()
    p = native.amd(S_pat.indptr, S_pat.indices, A.ncol)
    assert np.array_equal(np.sort(p), np.arange(A.ncol))
    S = simplicial.symbolic_cholesky(A, p)
    assert S.lnz < 20 * A.ncol  # near-linear fill; natural would be ~n^2/2


def test_amd_empty_and_diagonal():
    # diagonal matrix: no off-diagonal structure at all
    A = from_dense(np.eye(5), sym=1)
    S_pat = A.aat_pattern()
    p = native.amd(S_pat.indptr, S_pat.indices, 5)
    assert np.array_equal(np.sort(p), np.arange(5))


def test_nested_dissection_valid_and_quality():
    if not native.has("sstpu_nested_dissection"):
        pytest.skip("nd not built")
    A = fixtures.laplacian_2d(32)
    n = A.ncol
    S_pat = A.aat_pattern()
    p = native.nested_dissection(S_pat.indptr, S_pat.indices, n)
    assert np.array_equal(np.sort(p), np.arange(n))
    S_nd = simplicial.symbolic_cholesky(A, p)
    S_nat = simplicial.symbolic_cholesky(A)
    # ND must clearly beat natural on a mesh
    assert S_nd.lnz < 0.6 * S_nat.lnz


def test_nested_dissection_ordering_api():
    from suitesparse_tpu.ordering import nested_dissection_order
    from suitesparse_tpu.config import Ordering
    import suitesparse_tpu as sst
    A = fixtures.laplacian_3d(8)
    p = nested_dissection_order(A)
    assert np.array_equal(np.sort(p), np.arange(A.ncol))
    # through the analyze API
    S = sst.analyze(A, sst.DEFAULT.replace(ordering=Ordering.METIS))
    assert S.lnz > 0


def test_camd_constraint_contiguity():
    if not native.has("sstpu_camd"):
        pytest.skip("camd not built")
    from suitesparse_tpu.ordering import camd_order
    A = fixtures.laplacian_2d(20)
    n = A.ncol
    rng = np.random.default_rng(0)
    cset = rng.integers(0, 4, size=n)
    p = camd_order(A, cset)
    assert np.array_equal(np.sort(p), np.arange(n))
    seq = cset[p]
    assert np.all(np.diff(seq) >= 0), "constraint sets must be contiguous"
    # ordering remains fill-reducing within the constraint
    S_c = simplicial.symbolic_cholesky(A, p)
    S_nat = simplicial.symbolic_cholesky(A)
    assert S_c.lnz < S_nat.lnz * 3


def test_native_symperm_transpose_match_oracle():
    """Native O(nnz) symperm/transpose (position-map protocol) vs dense
    oracles, real and complex, random permutations."""
    if not native.has("sstpu_symperm"):
        pytest.skip("symperm not built")
    from suitesparse_tpu.sparse import CSC, from_triplets
    rng = np.random.default_rng(7)
    for trial in range(8):
        n = int(rng.integers(2, 40))
        m = int(n * n * 0.3) + 1
        r = rng.integers(0, n, m)
        c = rng.integers(0, n, m)
        v = rng.standard_normal(m)
        if trial % 2:
            v = v + 1j * rng.standard_normal(m)
        A = from_triplets(n, n, np.minimum(r, c), np.maximum(r, c), v, sym=1)
        p = rng.permutation(n).astype(np.int64)
        C = A.symperm(p)
        C.check()
        assert np.allclose(C.to_dense(), A.to_dense()[np.ix_(p, p)])
        B = CSC(A.nrow, A.ncol, A.indptr, A.indices, A.data, 0)
        T = B.transpose()
        T.check()
        assert np.allclose(T.to_dense(), B.to_dense().T)


def test_native_host_trisolves_match_python():
    """hsolve.cc sweeps (lsolve/usolve/ltsolve/utsolve + offupdate) must be
    bit-compatible with the Python CSC kernels they replace on the
    real-1-RHS fast path."""
    import suitesparse_tpu.native as native
    from suitesparse_tpu.numeric import simplicial
    from suitesparse_tpu.io import fixtures
    from suitesparse_tpu.sparse import CSC

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    A = fixtures.banded_spd(300, 7, seed=2)
    import suitesparse_tpu as sst
    F = sst.factorize(A, sst.analyze(A))
    b = rng.standard_normal(300)
    orig = native.available
    try:
        native.available = lambda: False
        # drive through the public solve and compare whole-path results
        x_py = sst.solve(F, b)
    finally:
        native.available = orig
    x_nat = sst.solve(F, b)
    assert np.allclose(x_py, x_nat, rtol=0, atol=1e-12)

    # offupdate parity on a random off block
    n = 50
    r = rng.integers(0, 30, 60)
    c = rng.integers(30, n, 60)
    v = rng.standard_normal(60)
    from suitesparse_tpu.sparse import from_triplets
    Off = from_triplets(n, n, r, c, v)
    y1 = rng.standard_normal(n)
    y2 = y1.copy()
    native.offupdate(30, n, Off.indptr, Off.indices,
                     np.ascontiguousarray(Off.data, dtype=np.float64), y1)
    for j in range(30, n):
        lo, hi = Off.indptr[j], Off.indptr[j + 1]
        y2[Off.indices[lo:hi]] -= Off.data[lo:hi] * y2[j]
    assert np.allclose(y1, y2, atol=1e-14)
