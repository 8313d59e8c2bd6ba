"""Fused solve-step kernels vs dense oracles + end-to-end forced path."""

import numpy as np
import pytest

import jax.numpy as jnp

from suitesparse_tpu.kernels.solve_step import solve_step_fwd, solve_step_bwd


@pytest.mark.parametrize("B,C,RU,NR", [(3, 8, 4, 1), (7, 12, 20, 2),
                                       (40, 16, 8, 1)])
def test_steps_match_dense(B, C, RU, NR):
    rng = np.random.default_rng(B + C + RU)
    L11 = np.tril(rng.standard_normal((B, C, C))).astype(np.float32)
    for b in range(B):
        np.fill_diagonal(L11[b], 2.0 + rng.random(C))
    L21 = rng.standard_normal((B, RU, C)).astype(np.float32)
    Y = rng.standard_normal((B, C, NR)).astype(np.float32)
    WB = rng.standard_normal((B, RU, NR)).astype(np.float32)
    xc, v = solve_step_fwd(jnp.asarray(L11), jnp.asarray(L21),
                           jnp.asarray(Y), jnp.asarray(WB), interpret=True)
    xcr = np.stack([np.linalg.solve(L11[b], Y[b]) for b in range(B)])
    vr = WB + np.einsum("brc,bcn->brn", L21, xcr)
    assert np.abs(np.asarray(xc) - xcr).max() < 1e-4
    assert np.abs(np.asarray(v) - vr).max() < 1e-4
    XB = rng.standard_normal((B, RU, NR)).astype(np.float32)
    xb2 = solve_step_bwd(jnp.asarray(L11), jnp.asarray(L21),
                         jnp.asarray(Y), jnp.asarray(XB), interpret=True)
    ref = np.stack([np.linalg.solve(L11[b].T, Y[b] - L21[b].T @ XB[b])
                    for b in range(B)])
    assert np.abs(np.asarray(xb2) - ref).max() < 1e-4


def test_solve_with_step_kernel_forced(monkeypatch):
    monkeypatch.setenv("SSTPU_PALLAS", "1")
    import suitesparse_tpu as sst
    from suitesparse_tpu.io import fixtures
    from suitesparse_tpu.ordering import amd_order
    from suitesparse_tpu.symbolic.supernodes import analyze_supernodal
    from suitesparse_tpu.numeric import supernodal_device, supernodal_solve

    A = fixtures.laplacian_3d(9)
    S = analyze_supernodal(A, amd_order(A))
    F = supernodal_device.factorize_device(A, S)
    assert F.ok
    b = 1.0 + np.arange(A.ncol) / A.ncol
    x = supernodal_solve.solve_device(F, b)
    assert sst.residual_norm(A, x, b) < 1e-3
