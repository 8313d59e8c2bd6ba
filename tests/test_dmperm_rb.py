"""Dulmage-Mendelsohn decomposition + Rutherford-Boeing I/O tests."""

import io

import numpy as np
import pytest

import suitesparse_tpu as sst
from suitesparse_tpu.io import fixtures
from suitesparse_tpu.io.rutherford_boeing import read_rb, write_rb
from suitesparse_tpu.ordering.dmperm import dmperm


@pytest.mark.parametrize("seed", range(5))
def test_dmperm_structure(seed):
    rng = np.random.default_rng(seed)
    m, n = int(rng.integers(6, 20)), int(rng.integers(6, 20))
    D = (rng.random((m, n)) < 0.2).astype(float)
    A = sst.from_dense(D)
    dm = dmperm(A)
    assert np.array_equal(np.sort(dm.rowperm), np.arange(m))
    assert np.array_equal(np.sort(dm.colperm), np.arange(n))
    P = D[np.ix_(dm.rowperm, dm.colperm)]
    rr, cc = dm.rr, dm.cc
    # zero blocks: below the horizontal part, left of the square/vertical part
    assert not P[rr[1]:, :cc[1]].any(), "nonzero below horizontal part"
    assert not P[rr[2]:, :cc[2]].any(), "nonzero left of vertical part"
    # square part is square with zero-free diagonal
    k = rr[2] - rr[1]
    assert cc[2] - cc[1] == k
    if k:
        sq = P[rr[1]:rr[2], cc[1]:cc[2]]
        assert sq.diagonal().all(), "square part diagonal not zero-free"
        # fine blocks: block upper triangular
        for t in range(dm.nblocks):
            lo, hi = dm.r[t] - rr[1], dm.r[t + 1] - rr[1]
            assert not sq[hi:, lo:hi].any()


def test_dmperm_square_nonsingular():
    A = fixtures.random_sparse(30, 30, density=0.15, seed=7)
    dm = dmperm(A)
    assert dm.structural_rank == 30
    assert dm.rr[1] == 0 and dm.rr[2] == 30  # everything in the square part


def test_rb_roundtrip_general(tmp_path):
    A = fixtures.random_sparse(15, 11, density=0.3, seed=1,
                               ensure_full_diag=False)
    p = tmp_path / "a.rb"
    write_rb(p, A)
    B = read_rb(p)
    assert np.allclose(A.to_dense(), B.to_dense())


def test_rb_roundtrip_symmetric(tmp_path):
    A = fixtures.laplacian_2d(7)
    p = tmp_path / "s.rb"
    write_rb(p, A)
    B = read_rb(p)
    assert B.sym == 1
    assert np.allclose(A.to_dense(), B.to_dense())


def test_rb_pattern():
    text = (f"{'t':<72}{'k':<8}\n"
            f"{2:14d}{1:14d}{1:14d}{0:14d}\n"
            f"pua           {3:14d}{3:14d}{3:14d}{0:14d}\n"
            "(8I10) (8I10) (4E24.16)\n"
            "         1         2         3         4\n"
            "         1         2         3\n")
    A = read_rb(io.StringIO(text))
    assert A.shape == (3, 3) and A.nnz == 3
    assert np.allclose(A.to_dense(), np.eye(3))
