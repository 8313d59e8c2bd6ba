"""Pallas batched potrf+trsm kernel vs dense oracles (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from suitesparse_tpu.kernels.potrf import batched_potrf, batched_potrf_trsm


@pytest.mark.parametrize("B,C,RU", [(3, 8, 0), (7, 12, 20), (40, 16, 8),
                                    (2, 48, 96)])
def test_kernel_matches_dense(B, C, RU):
    rng = np.random.default_rng(B * 100 + C)
    M = rng.standard_normal((B, C, C))
    F11 = (M @ np.swapaxes(M, 1, 2) + C * np.eye(C)).astype(np.float32)
    Lref = np.linalg.cholesky(F11)
    if RU:
        F21 = rng.standard_normal((B, RU, C)).astype(np.float32)
        L11, L21 = batched_potrf_trsm(jnp.asarray(F11), jnp.asarray(F21),
                                      interpret=True)
        L21ref = np.stack([np.linalg.solve(Lref[b], F21[b].T).T
                           for b in range(B)])
        assert np.abs(np.asarray(L21) - L21ref).max() < 1e-3
    else:
        L11 = batched_potrf(jnp.asarray(F11), interpret=True)
    assert np.abs(np.asarray(L11) - Lref).max() < 1e-3
    # strictly lower-triangular output above diagonal
    assert np.abs(np.triu(np.asarray(L11), 1)).max() == 0.0


def test_device_path_with_kernel_forced(monkeypatch):
    """End-to-end factorization with the kernel forced on (interpret mode)."""
    monkeypatch.setenv("SSTPU_PALLAS", "1")
    import suitesparse_tpu as sst
    from suitesparse_tpu.io import fixtures
    from suitesparse_tpu.ordering import amd_order
    from suitesparse_tpu.symbolic.supernodes import analyze_supernodal
    from suitesparse_tpu.numeric import supernodal_device, supernodal

    A = fixtures.laplacian_3d(8)
    S = analyze_supernodal(A, amd_order(A))
    F = supernodal_device.factorize_device(A, S)
    assert F.ok
    Fh = supernodal.factorize_host(A, S)
    scale = max(np.abs(Fh.Lx).max(), 1.0)
    assert np.abs(F.lx_host() - Fh.Lx).max() / scale < 1e-4
