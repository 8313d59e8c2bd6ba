"""Complex device paths via the 2x2 real embedding (VERDICT r1 item 6).

All three device pipelines accept complex input: Hermitian supernodal
Cholesky, unsymmetric multifrontal LU, multifrontal QR least squares.
"""

import numpy as np
import pytest

from suitesparse_tpu import sparse
from suitesparse_tpu.numeric.complex_embed import (
    embed_matrix, embed_vec, unembed_vec, expand_perm,
    cholsol_complex_device, lusol_complex_device, qrsol_complex_device)
import suitesparse_tpu as sst


def _hpd(n, seed=0):
    rng = np.random.default_rng(seed)
    H = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    return H @ H.conj().T + 2 * n * np.eye(n)


def test_embedding_isomorphism():
    rng = np.random.default_rng(1)
    n = 12
    Hd = _hpd(n, 1)
    A = sparse.from_dense(Hd, sym=1)
    M = embed_matrix(A).to_dense()
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    lhs = M @ embed_vec(x)
    rhs = embed_vec(Hd @ x)
    assert np.abs(lhs - rhs).max() < 1e-10


def test_hermitian_cholesky_device():
    n = 90
    Hd = _hpd(n, 2)
    A = sparse.from_dense(Hd, sym=1)
    b = np.ones(n) + 1j * np.arange(n)
    x = cholsol_complex_device(A, b)
    assert np.abs(Hd @ x - b).max() / np.abs(b).max() < 1e-4


def test_unsym_lu_device_complex():
    rng = np.random.default_rng(3)
    n = 80
    G = np.where(rng.random((n, n)) < 0.12,
                 rng.standard_normal((n, n))
                 + 1j * rng.standard_normal((n, n)), 0) + (4 + 2j) * np.eye(n)
    A = sparse.from_dense(G)
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    x = lusol_complex_device(A, b)
    assert np.abs(G @ x - b).max() / np.abs(b).max() < 1e-8


def test_qr_least_squares_complex():
    rng = np.random.default_rng(4)
    m, n = 300, 140
    C = rng.standard_normal((m, n)) + 1j * rng.standard_normal((m, n))
    A = sparse.from_dense(C)
    b = rng.standard_normal(m) + 1j * rng.standard_normal(m)
    x = qrsol_complex_device(A, b)
    xref, *_ = np.linalg.lstsq(C, b, rcond=None)
    assert np.abs(x - xref).max() / np.abs(xref).max() < 1e-4


def test_cholsol_routes_large_complex_to_device(monkeypatch):
    """Package cholsol must use the embedded device path for big complex
    HPD problems."""
    import suitesparse_tpu.numeric.complex_embed as ce

    called = {"n": 0}
    orig = ce.cholsol_complex_device

    def spy(A, b, config=sst.DEFAULT, **kw):
        called["n"] += 1
        return orig(A, b, config, **kw)

    monkeypatch.setattr(ce, "cholsol_complex_device", spy)
    n = 260
    Hd = _hpd(n, 5)
    A = sparse.from_dense(Hd, sym=1)
    b = np.ones(n, dtype=np.complex128)
    x = sst.cholsol(A, b)
    assert np.abs(Hd @ x - b).max() / np.abs(b).max() < 1e-4
    assert called["n"] == 1


def test_qc324_class_complex_fixture():
    """Reference complex fixture through the public drivers (qc324-class
    gate from VERDICT item 6)."""
    import os
    from suitesparse_tpu.io.rutherford_boeing import read_rb
    path = "/root/reference/UMFPACK/Demo/HB/qc324.cua"
    if not os.path.exists(path):
        pytest.skip("qc324 fixture unavailable")
    A = read_rb(path)
    n = A.ncol
    b = np.ones(n, dtype=np.complex128)
    from suitesparse_tpu.numeric.mflu_unsym import mflusol_unsym
    x = mflusol_unsym(A.to_full_storage() if A.sym else A, b)
    assert sst.residual_norm(A, x, b) < 1e-8


def test_factor_many_value_changes_flow_through():
    """In-place A.data changes must flow into repeat complex solves (the
    structural embedding keeps the cached symbolic pattern-only — review
    finding r2)."""
    n = 220
    Hd = _hpd(n, 7)
    A = sparse.from_dense(Hd, sym=1)
    b = np.ones(n, dtype=np.complex128)
    x1 = cholsol_complex_device(A, b)
    assert np.abs(Hd @ x1 - b).max() / np.abs(b).max() < 1e-4
    A.data *= 2.0           # in place: same pattern, new values
    x2 = cholsol_complex_device(A, b)
    assert np.abs((2 * Hd) @ x2 - b).max() / np.abs(b).max() < 1e-4


def test_min_norm_complex_underdetermined():
    """qrsol m<n with complex input must not drop the imaginary part
    (review finding r3)."""
    from suitesparse_tpu.numeric.qr import qrsol

    rng = np.random.default_rng(8)
    m, n = 30, 50
    C = rng.standard_normal((m, n)) + 1j * rng.standard_normal((m, n))
    A = sparse.from_dense(C)
    b = rng.standard_normal(m) + 1j * rng.standard_normal(m)
    x = qrsol(A, b)
    assert np.abs(C @ x - b).max() / np.abs(b).max() < 1e-6
    # min-norm optimality: x in row space => ||x|| <= ||pinv solution||
    xp = np.linalg.pinv(C) @ b
    assert np.linalg.norm(x) <= np.linalg.norm(xp) * (1 + 1e-5)


def test_qr_segmented_cache_not_reused_across_nrhs():
    """Segment-program cache must rebuild when the plan changes (nrhs
    rebuild) — review finding r1 (was silent wrong answers)."""
    import os
    from suitesparse_tpu.numeric.mfqr_device import (factorize_qr_device,
                                                     qr_solve_device)
    from suitesparse_tpu.numeric.multifrontal_qr import analyze_mfqr

    rng = np.random.default_rng(9)
    m, n = 260, 140
    C = np.where(rng.random((m, n)) < 0.08, rng.standard_normal((m, n)), 0)
    C[np.arange(n), np.arange(n)] += 5
    A = sparse.from_dense(C)
    os.environ["SSTPU_SEGMENT"] = "1"
    os.environ["SSTPU_SEG_CELLS"] = "50000"
    try:
        SQ = analyze_mfqr(A, sst.DEFAULT)
        b1 = rng.standard_normal(m)
        F1 = factorize_qr_device(A, SQ, b1)
        x1 = qr_solve_device(F1)[:, 0]
        B4 = rng.standard_normal((m, 4))
        F4 = factorize_qr_device(A, SQ, B4)
        X4 = qr_solve_device(F4)
        ref1, *_ = np.linalg.lstsq(C, b1, rcond=None)
        ref4, *_ = np.linalg.lstsq(C, B4, rcond=None)
        assert np.abs(x1 - ref1).max() / max(np.abs(ref1).max(), 1) < 1e-4
        assert np.abs(X4 - ref4).max() / max(np.abs(ref4).max(), 1) < 1e-4
    finally:
        os.environ.pop("SSTPU_SEGMENT", None)
        os.environ.pop("SSTPU_SEG_CELLS", None)


def test_midsize_complex_never_casts_to_real():
    """Complex HPD sizes below the embed threshold but above the
    supernodal switch used to silently cast to real in the host supernodal
    kernels (stress-test find) — must now solve correctly via the
    complex-capable simplicial path."""
    import warnings

    rng = np.random.default_rng(5)
    for n in (80, 130):
        H = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
        Hd = H @ H.conj().T + 3 * n * np.eye(n)
        A = sparse.from_dense(Hd, sym=1)
        b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        with warnings.catch_warnings():
            warnings.simplefilter("error", np.exceptions.ComplexWarning)
            x = sst.cholsol(A, b)
        assert np.abs(Hd @ x - b).max() / np.abs(b).max() < 5e-4
