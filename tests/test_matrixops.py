"""MatrixOps coverage: scale, submatrix, symmetry, horzcat/vertcat, norms.

Reference analogs: CHOLMOD/MatrixOps (cholmod_scale.c, cholmod_submatrix.c,
cholmod_symmetry.c, cholmod_horzcat.c, cholmod_vertcat.c, cholmod_norm.c).
Oracles are dense numpy computations.
"""

import numpy as np

from suitesparse_tpu.sparse import CSC, from_dense, horzcat, vertcat


def _rand(m, n, seed=0, density=0.3):
    rng = np.random.default_rng(seed)
    D = rng.standard_normal((m, n))
    D[rng.random((m, n)) > density] = 0.0
    return D


def test_scale_both_sides():
    D = _rand(7, 5)
    A = from_dense(D)
    l = np.arange(1.0, 8.0)
    r = np.arange(2.0, 7.0)
    S = A.scale(left=l, right=r)
    np.testing.assert_allclose(S.to_dense(), np.diag(l) @ D @ np.diag(r))
    np.testing.assert_allclose(A.scale(left=l).to_dense(), np.diag(l) @ D)
    np.testing.assert_allclose(A.scale(right=r).to_dense(), D @ np.diag(r))


def test_submatrix_permute_and_duplicate():
    D = _rand(8, 6, seed=1)
    A = from_dense(D)
    ri = np.array([3, 0, 3, 7])
    ci = np.array([5, 1, 1])
    S = A.submatrix(ri, ci)
    np.testing.assert_allclose(S.to_dense(), D[np.ix_(ri, ci)])
    np.testing.assert_allclose(A.submatrix(None, ci).to_dense(), D[:, ci])
    np.testing.assert_allclose(A.submatrix(ri, None).to_dense(), D[ri, :])


def test_symmetry_report():
    D = _rand(6, 6, seed=2)
    sym = from_dense(D + D.T)
    rep = sym.symmetry()
    assert rep["structural"] == 1.0 and rep["numeric"] == 1.0
    unsym = from_dense(np.triu(D, 1) + np.eye(6))
    rep2 = unsym.symmetry()
    assert rep2["structural"] < 0.5
    assert rep2["nzdiag"] == 6
    # structurally symmetric but numerically not
    P = (D + D.T != 0).astype(float) * D
    P = P + np.eye(6)
    rep3 = from_dense(P + 0.5 * P.T).symmetry()
    assert rep3["structural"] == 1.0


def test_concat():
    Da, Db = _rand(4, 3, seed=3), _rand(4, 2, seed=4)
    H = horzcat(from_dense(Da), from_dense(Db))
    np.testing.assert_allclose(H.to_dense(), np.hstack([Da, Db]))
    Dc = _rand(5, 3, seed=5)
    V = vertcat(from_dense(Da), from_dense(Dc))
    np.testing.assert_allclose(V.to_dense(), np.vstack([Da, Dc]))


def test_norm_fro():
    D = _rand(5, 5, seed=6)
    assert np.isclose(from_dense(D).norm_fro(), np.linalg.norm(D, "fro"))


def test_band():
    D = _rand(7, 7, seed=9, density=0.6)
    A = from_dense(D)
    Bm = A.band(-1, 2).to_dense()
    ref = np.zeros_like(D)
    for i in range(7):
        for j in range(7):
            if -1 <= j - i <= 2:
                ref[i, j] = D[i, j]
    np.testing.assert_allclose(Bm, ref)
