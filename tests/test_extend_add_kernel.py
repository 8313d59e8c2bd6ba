"""Fused extend-add placement kernel vs brute-force oracle (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from suitesparse_tpu.kernels.extend_add import extend_add, pad_pairs


@pytest.mark.parametrize("B,R,RU,npr,seed", [(5, 24, 8, 7, 0),
                                             (3, 16, 16, 9, 1),
                                             (8, 40, 8, 2, 2)])
def test_extend_add_matches_oracle(B, R, RU, npr, seed):
    rng = np.random.default_rng(seed)
    child = rng.standard_normal((npr, RU, RU)).astype(np.float32)
    idx = np.stack([np.sort(rng.choice(R, RU, replace=False))
                    for _ in range(npr)]).astype(np.int32)
    idx[0, -2:] = -1                       # padded rows
    dst0 = np.sort(rng.integers(0, B, npr)).astype(np.int32)
    dstf, idxf, order = pad_pairs(B, dst0, idx)
    childf = np.zeros((dstf.size, RU, RU), np.float32)
    childf[order >= 0] = child[order[order >= 0]]
    F0 = rng.standard_normal((B, R, R)).astype(np.float32)
    F1 = np.asarray(extend_add(jnp.asarray(F0), jnp.asarray(childf),
                               idxf, dstf, interpret=True))
    Fref = F0.copy()
    for p in range(npr):
        b = dst0[p]
        for i in range(RU):
            if idx[p, i] < 0:
                continue
            for j in range(RU):
                if idx[p, j] < 0:
                    continue
                Fref[b, idx[p, i], idx[p, j]] += child[p, i, j]
    assert np.abs(F1 - Fref).max() < 1e-5
