"""Parity tests for the lane-batched matvec solve kernel (interpret mode
on CPU; the TPU A/B rides tpu_ab.py / bench.py)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from suitesparse_tpu.kernels.bmatvec import bmatvec_t, bmv_fits, bmv_pad


@pytest.mark.parametrize("I,J,B,NR", [
    (16, 16, 200, 1),      # leaf shape: C=16 panels, large batch
    (176, 48, 351, 1),     # RU x C subdiagonal panel
    (64, 64, 179, 2),
    (920, 136, 53, 1),     # big-RU: multiple I blocks
    (8, 24, 130, 4),
])
@pytest.mark.parametrize("transpose", [False, True])
def test_bmatvec_parity(I, J, B, NR, transpose):
    rng = np.random.default_rng(I * 1000 + J + B + NR)
    M = rng.standard_normal((B, I, J)).astype(np.float32)
    xr = J if not transpose else I
    X = rng.standard_normal((B, xr, NR)).astype(np.float32)
    want = np.einsum("bij,bjr->bir", M, X) if not transpose else \
        np.einsum("bij,bir->bjr", M, X)

    Ipad, Bpad = bmv_pad(I, J, B)
    assert bmv_fits(I, J, B, NR)
    Mt = np.zeros((Ipad, J, Bpad), np.float32)
    Mt[:I, :, :B] = M.transpose(1, 2, 0)
    rows = J if not transpose else Ipad
    Xt = np.zeros((rows, NR, Bpad), np.float32)
    Xt[:xr, :, :B] = X.transpose(1, 2, 0)

    Zt = bmatvec_t(jnp.asarray(Mt), jnp.asarray(Xt), transpose=transpose,
                   interpret=True)
    zr = Ipad if not transpose else J
    assert Zt.shape == (zr, NR, Bpad)
    got = np.asarray(Zt)[:I if not transpose else J, :, :B].transpose(2, 0, 1)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4)
    # padded lanes / rows stay exact zero (zero fill in = zero out)
    assert not np.any(np.asarray(Zt)[:, :, B:])
    if not transpose:
        assert not np.any(np.asarray(Zt)[I:])


def test_bmv_solve_matches_classic(monkeypatch):
    """End-to-end: the lane-batched kernel solve (inv + bmv, interpret
    mode off-TPU) matches the plain inverse-panel route and refines to
    fp64-class residuals."""
    from suitesparse_tpu.io import fixtures
    from suitesparse_tpu.ordering import amd_order
    from suitesparse_tpu.symbolic.supernodes import analyze_supernodal
    from suitesparse_tpu.numeric import supernodal_device, supernodal_solve

    A = fixtures.laplacian_3d(7)
    S = analyze_supernodal(A, amd_order(A))
    F = supernodal_device.factorize_device(A, S)
    b = 1.0 + np.arange(A.ncol) / A.ncol
    monkeypatch.setenv("SSTPU_SOLVE_INV", "1")
    monkeypatch.setenv("SSTPU_SOLVE_BMV", "0")
    S._solve_cache = None
    x_inv = supernodal_solve.solve_device(F, b)
    monkeypatch.setenv("SSTPU_SOLVE_BMV", "1")
    monkeypatch.setenv("SSTPU_BMV_BMIN", "1")
    S._solve_cache = None
    F._winv = None
    x_bmv = supernodal_solve.solve_device(F, b)
    r = A.matvec(x_bmv) - b
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-5
    assert np.abs(x_bmv - x_inv).max() / np.abs(x_inv).max() < 1e-4
    # multi-RHS through the same machinery
    Bm = np.stack([b, -2.0 * b], axis=1)
    X = supernodal_solve.solve_device(F, Bm)
    for k in range(2):
        rk = A.matvec(X[:, k]) - Bm[:, k]
        assert np.linalg.norm(rk) / np.linalg.norm(Bm[:, k]) < 1e-5
    xr = supernodal_solve.solve_refined(F, A, b)
    r = A.matvec(xr) - b
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-14
