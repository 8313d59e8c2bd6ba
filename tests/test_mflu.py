"""Multifrontal LU tests: host oracle, device path with within-front pivoting."""

import numpy as np
import pytest

import suitesparse_tpu as sst
from suitesparse_tpu.io import fixtures
from suitesparse_tpu.numeric import multifrontal_lu as mflu
from suitesparse_tpu.numeric import mflu_device
from suitesparse_tpu.sparse import residual_norm

CFG64 = sst.DEFAULT.replace(compute_dtype="float64")


def cases():
    cs = [("rand100", lambda: fixtures.random_sparse(100, 100, 0.05, seed=3)),
          ("rand400", lambda: fixtures.random_sparse(400, 400, 0.02, seed=9))]
    if fixtures.have_reference():
        cs += [("west0067", lambda: fixtures.load_demo("west0067")),
               ("fs_183_1", lambda: fixtures.load_demo("fs_183_1"))]
    return cs


@pytest.mark.parametrize("name,gen", cases(), ids=[c[0] for c in cases()])
def test_host_mflu(name, gen):
    A = gen()
    n = A.ncol
    b = 1.0 + np.arange(n) / n
    x = mflu.mflusol(A, b)
    assert residual_norm(A, x, b) < 1e-10


@pytest.mark.parametrize("name,gen", cases(), ids=[c[0] for c in cases()])
def test_device_mflu(name, gen):
    A = gen()
    n = A.ncol
    S = mflu.analyze_mflu(A)
    F = mflu_device.factorize_lu_device(A, S, CFG64)
    assert F.ok
    b = 1.0 + np.arange(n) / n
    x = mflu_device.solve_mflu_device(F, b)
    assert residual_norm(A, x, b) < 1e-8, name


def test_device_mflu_pivots_where_host_static_fails():
    # zero diagonal entry in a spot where static pivoting dies but
    # within-front partial pivoting survives
    D = np.array([[0.0, 2.0, 1.0],
                  [4.0, 1.0, 0.5],
                  [1.0, 0.0, 3.0]])
    A = sst.from_dense(D)
    S = mflu.analyze_mflu(A)  # maxtrans fixes the structural zero up front
    F = mflu_device.factorize_lu_device(A, S, CFG64)
    assert F.ok
    b = np.array([1.0, 2.0, 3.0])
    x = mflu_device.solve_mflu_device(F, b)
    assert np.allclose(D @ x, b, atol=1e-12)


def test_mflu_factor_many():
    A = fixtures.random_sparse(150, 150, 0.04, seed=5)
    S = mflu.analyze_mflu(A)
    F1 = mflu_device.factorize_lu_device(A, S, CFG64)
    A2 = sst.CSC(A.nrow, A.ncol, A.indptr, A.indices, A.data * 1.5, 0)
    F2 = mflu_device.factorize_lu_device(A2, S, CFG64)  # same plan, new values
    b = np.ones(150)
    x2 = mflu_device.solve_mflu_device(F2, b)
    assert residual_norm(A2, x2, b) < 1e-10


def test_find_singletons():
    """umf_singletons analog: triangular matrices peel completely; a dense
    block resists."""
    import numpy as np
    from suitesparse_tpu.sparse import from_dense
    from suitesparse_tpu.numeric.multifrontal_lu import find_singletons

    n = 6
    rng = np.random.default_rng(0)
    T = np.triu(rng.standard_normal((n, n))) + 3 * np.eye(n)
    piv, rl, cl = find_singletons(from_dense(T))
    assert len(piv) == n and rl.size == 0 and cl.size == 0
    # elimination order is valid: each pivot col had a single live entry
    # 2x2 dense core + singleton wings
    D = np.zeros((4, 4))
    D[0, 0] = 1.0          # col 0 singleton
    D[1:3, 1:3] = [[2.0, 1.0], [1.0, 2.0]]
    D[3, 3] = 1.0
    D[0, 2] = 5.0          # extra entry in row 0
    piv, rl, cl = find_singletons(from_dense(D))
    assert (0, 0) in piv and (3, 3) in piv
    assert set(rl) == {1, 2} and set(cl) == {1, 2}
