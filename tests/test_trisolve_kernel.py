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
