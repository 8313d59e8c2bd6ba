"""Exact rational LU tests (SLIP_LU analog)."""

from fractions import Fraction

import numpy as np
import pytest

import suitesparse_tpu as sst
from suitesparse_tpu.io import fixtures
from suitesparse_tpu.numeric.exact import exact_lusol


def test_exact_integer_system():
    # integer matrix with exactly representable rational solution
    D = np.array([[2.0, 1.0, 0.0],
                  [1.0, 3.0, 1.0],
                  [0.0, 1.0, 2.0]])
    A = sst.from_dense(D)
    b = np.array([1.0, 2.0, 3.0])
    x = exact_lusol(A, b)
    # exact: residual identically zero in rational arithmetic
    for i in range(3):
        r = sum(Fraction(float(D[i, j])) * x[j] for j in range(3)) \
            - Fraction(float(b[i]))
        assert r == 0
    # known solution: solve densely and compare
    xf = np.array([float(v) for v in x])
    assert np.allclose(xf, np.linalg.solve(D, b))


def test_exact_hilbert_beats_float():
    # 10x10 Hilbert: float LU loses ~7 digits; exact stays exact
    n = 10
    H = np.array([[1.0 / (i + j + 1) for j in range(n)] for i in range(n)])
    A = sst.from_dense(H)
    b = np.ones(n)
    x = exact_lusol(A, b)
    for i in range(n):
        r = sum(Fraction(1, i + j + 1) * x[j] for j in range(n)) - 1
        # H entries are floats (not exact 1/(i+j+1)); compare with the FLOAT
        # entries' exact rationals instead
    for i in range(n):
        r = sum(Fraction(float(H[i, j])) * x[j] for j in range(n)) \
            - Fraction(1)
        assert r == 0, f"row {i} exact residual {r}"


def test_exact_singular_detected():
    D = np.array([[1.0, 2.0], [2.0, 4.0]])
    A = sst.from_dense(D)
    with pytest.raises(AssertionError):
        exact_lusol(A, np.ones(2))


def test_exact_sparse_system():
    A = fixtures.random_sparse(25, 25, density=0.15, seed=4)
    b = np.arange(25, dtype=np.float64)
    x = exact_lusol(A, b)
    D = A.to_dense()
    xf = np.array([float(v) for v in x])
    assert np.allclose(D @ xf, b, atol=1e-10)
