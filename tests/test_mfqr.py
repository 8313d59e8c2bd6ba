"""Multifrontal QR tests (SPQR-class): host oracle + device path."""

import numpy as np
import pytest

import suitesparse_tpu as sst
from suitesparse_tpu.io import fixtures
from suitesparse_tpu.numeric import mfqr_device
from suitesparse_tpu.numeric import multifrontal_qr as mfqr

CFG64 = sst.DEFAULT.replace(compute_dtype="float64")


def make_case(m, n, dens, seed):
    rng = np.random.default_rng(seed)
    A = fixtures.random_sparse(m, n, density=dens, seed=seed,
                               ensure_full_diag=False)
    D = A.to_dense()
    for j in range(n):
        if np.abs(D[:, j]).sum() < 1e-12:
            D[rng.integers(m), j] = 1.0
    D[np.arange(n), np.arange(n)] += 2.0
    return sst.from_dense(D), D


@pytest.mark.parametrize("m,n,dens,seed", [(40, 25, 0.3, 1), (200, 120, 0.05, 2)])
def test_host_mfqr_least_squares(m, n, dens, seed):
    A, D = make_case(m, n, dens, seed)
    b = np.random.default_rng(seed).standard_normal(m)
    x = mfqr.mfqrsol(A, b, CFG64)
    x_ref, *_ = np.linalg.lstsq(D, b, rcond=None)
    assert np.allclose(x, x_ref, atol=1e-9)


@pytest.mark.parametrize("m,n,dens,seed", [(40, 25, 0.3, 3), (200, 120, 0.05, 4),
                                           (600, 400, 0.02, 5)])
def test_device_mfqr_least_squares(m, n, dens, seed):
    A, D = make_case(m, n, dens, seed)
    b = np.random.default_rng(seed).standard_normal(m)
    x = mfqr_device.mfqrsol_device(A, b, CFG64)
    x_ref, *_ = np.linalg.lstsq(D, b, rcond=None)
    assert np.allclose(x, x_ref, atol=1e-8)


needs_ref = pytest.mark.skipif(not fixtures.have_reference(),
                               reason="reference mount not present")


@needs_ref
def test_mfqr_reference_fixture():
    A = fixtures.load_demo("ash219")
    m = A.nrow
    b = 1.0 + np.arange(m) / m
    xh = mfqr.mfqrsol(A, b, CFG64)
    xd = mfqr_device.mfqrsol_device(A, b, CFG64)
    x_ref, *_ = np.linalg.lstsq(A.to_dense(), b, rcond=None)
    assert np.allclose(xh, x_ref, atol=1e-9)
    assert np.allclose(xd, x_ref, atol=1e-9)


def test_mfqr_multi_rhs():
    A, D = make_case(60, 35, 0.2, 6)
    B = np.random.default_rng(7).standard_normal((60, 3))
    X = mfqr_device.mfqrsol_device(A, B, CFG64)
    for k in range(3):
        x_ref, *_ = np.linalg.lstsq(D, B[:, k], rcond=None)
        assert np.allclose(X[:, k], x_ref, atol=1e-8)


def test_mfqr_square_solve():
    A, D = make_case(50, 50, 0.1, 8)
    b = np.ones(50)
    x = mfqr.mfqrsol(A, b, CFG64)
    assert np.allclose(D @ x, b, atol=1e-9)


def test_qrsol_pattern_cache_reuses_symbolic():
    """One-shot qrsol caches the QR symbolic per pattern: same-pattern
    repeat calls must reuse it (the re-analysis + re-compile per call cost
    ~30 s at m=6k), and VALUE changes must still flow through."""
    import suitesparse_tpu as sst
    from suitesparse_tpu.numeric import mfqr_device
    from suitesparse_tpu.sparse import from_triplets

    rng = np.random.default_rng(2)
    m, n = 800, 200   # m*n above the device-path threshold (1<<16)
    ri = rng.integers(0, m, n * 4)
    ci = np.repeat(np.arange(n), 4)
    vi = rng.standard_normal(n * 4)
    ri = np.concatenate([ri, np.arange(n)])
    ci = np.concatenate([ci, np.arange(n)])
    vi = np.concatenate([vi, np.full(n, 5.0)])
    A = from_triplets(m, n, ri, ci, vi)
    b = rng.standard_normal(m)
    mfqr_device._SQ_CACHE.clear()
    x1 = sst.qrsol(A, b)
    assert len(mfqr_device._SQ_CACHE) == 1
    sq_first = next(iter(mfqr_device._SQ_CACHE.values()))
    x2 = sst.qrsol(A, b)
    assert next(iter(mfqr_device._SQ_CACHE.values())) is sq_first
    assert np.allclose(x1, x2)
    # new values, same pattern: symbolic reused, answer changes correctly
    A2 = from_triplets(m, n, ri, ci, vi * 2.0)
    x3 = sst.qrsol(A2, b)
    assert next(iter(mfqr_device._SQ_CACHE.values())) is sq_first
    Ad = A2.to_dense()
    assert np.abs(Ad.T @ (b - Ad @ x3)).max() < 1e-3
