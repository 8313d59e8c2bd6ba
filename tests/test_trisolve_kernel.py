"""Pallas batched triangular solve kernel vs dense oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from suitesparse_tpu.kernels.trisolve import batched_trisolve


@pytest.mark.parametrize("B,C,NR", [(3, 8, 1), (7, 24, 2), (40, 16, 1)])
@pytest.mark.parametrize("transpose", [False, True])
def test_trisolve_matches_dense(B, C, NR, transpose):
    rng = np.random.default_rng(B + C)
    L = np.tril(rng.standard_normal((B, C, C))).astype(np.float32)
    for b in range(B):
        np.fill_diagonal(L[b], 2.0 + rng.random(C))
    Y = rng.standard_normal((B, C, NR)).astype(np.float32)
    X = batched_trisolve(jnp.asarray(L), jnp.asarray(Y), transpose=transpose,
                         interpret=True)
    M = np.swapaxes(L, 1, 2) if transpose else L
    Xref = np.stack([np.linalg.solve(M[b], Y[b]) for b in range(B)])
    assert np.abs(np.asarray(X) - Xref).max() < 1e-4


def test_over_budget_tile_falls_back_to_xla():
    """C>=56 with many RHS exceeds the VMEM tile budget: the kernel must
    degrade to XLA's triangular_solve, not raise (advisor finding r1)."""
    from suitesparse_tpu.kernels.trisolve import trisolve_fits

    B, C, NR = 32, 64, 64
    assert not trisolve_fits(C, NR, np.float32)
    rng = np.random.default_rng(0)
    L = np.tril(rng.standard_normal((B, C, C))).astype(np.float32)
    for b in range(B):
        np.fill_diagonal(L[b], 2.0 + rng.random(C))
    Y = rng.standard_normal((B, C, NR)).astype(np.float32)
    X = batched_trisolve(jnp.asarray(L), jnp.asarray(Y), interpret=True)
    Xref = np.stack([np.linalg.solve(L[b], Y[b]) for b in range(B)])
    assert np.abs(np.asarray(X) - Xref).max() < 1e-3


def test_multi_rhs_solve_with_wide_group(laplace2d=None):
    """End-to-end multi-RHS device-path solve containing a wide supernode
    (the dispatch must consult the NR-aware predicate)."""
    import os
    from suitesparse_tpu import sparse
    from suitesparse_tpu.symbolic.supernodes import analyze_supernodal
    from suitesparse_tpu.numeric.supernodal_device import factorize_device
    from suitesparse_tpu.numeric.supernodal_solve import solve_device

    n = 120
    rng = np.random.default_rng(1)
    # dense-ish SPD so the root supernode is wide
    M = rng.standard_normal((n, n))
    Ad = M @ M.T + n * np.eye(n)
    A = sparse.from_dense(Ad, sym=1)
    os.environ["SSTPU_PALLAS"] = "1"
    try:
        S = analyze_supernodal(A)
        F = factorize_device(A, S)
        b = rng.standard_normal((n, 64))
        x = solve_device(F, b)
    finally:
        os.environ.pop("SSTPU_PALLAS", None)
    assert np.abs(Ad @ x - b).max() / np.abs(b).max() < 1e-3
