"""Constrained orderings (CAMD/CCOLAMD/CSYMAMD) + NESDIS + ND quality.

Reference analogs: camd.h camd_order, ccolamd.h ccolamd/csymamd,
CHOLMOD/Partition/cholmod_nesdis.c, metis NodeND quality expectations.
"""

import numpy as np
import pytest

from suitesparse_tpu.io import fixtures
from suitesparse_tpu.ordering import (amd_order, ccolamd_order, csymamd_order,
                                      nesdis_order, nested_dissection_order,
                                      symamd_order)
from suitesparse_tpu.symbolic.etree import col_counts, etree


def _lnz(A, p):
    C = A.symperm(p)
    cc = col_counts(C, etree(C), np.arange(A.ncol))
    return int(cc.sum())


def _is_perm(p, n):
    return sorted(p) == list(range(n))


def test_nesdis_valid_and_constrained():
    A = fixtures.laplacian_3d(10)
    perm, cmember = nesdis_order(A)
    assert _is_perm(perm, A.ncol)
    # constraint sets must appear contiguously, ascending, along the ordering
    sets_in_order = cmember[perm]
    assert np.all(np.diff(sets_in_order) >= 0)
    # CAMD within sets should not LOSE to raw ND by much (it reorders only
    # within regions) and usually wins
    lz = _lnz(A, perm)
    ln = _lnz(A, nested_dissection_order(A))
    assert lz <= 1.1 * ln


def test_nesdis_top_separator_is_small():
    # 3-D grid: the root separator should be close to a plane (q^2), not a blob
    q = 12
    A = fixtures.laplacian_3d(q)
    _, cmember = nesdis_order(A)
    sizes = np.bincount(cmember)
    assert sizes[-1] <= 2.0 * q * q


def test_ccolamd_sets_contiguous():
    A = fixtures.load_demo("west0067")
    cset = np.arange(A.ncol) % 4
    q = ccolamd_order(A, cset)
    assert _is_perm(q, A.ncol)
    assert np.all(np.diff(cset[q]) >= 0)


def test_csymamd_sets_contiguous():
    A = fixtures.laplacian_3d(6)
    cset = (np.arange(A.ncol) >= A.ncol // 2).astype(np.int64)
    p = csymamd_order(A, cset)
    assert _is_perm(p, A.ncol)
    assert np.all(np.diff(cset[p]) >= 0)


def test_symamd_matches_amd_quality():
    A = fixtures.load_demo("bcsstk01")
    p = symamd_order(A)
    assert _is_perm(p, A.ncol)
    assert _lnz(A, p) <= 1.2 * _lnz(A, amd_order(A))


def test_ccolamd_single_set_close_to_colamd():
    from suitesparse_tpu.ordering import colamd_order
    A = fixtures.load_demo("west0067")
    q0 = colamd_order(A)
    q1 = ccolamd_order(A, np.zeros(A.ncol, dtype=np.int64))
    assert _is_perm(q0, A.ncol) and _is_perm(q1, A.ncol)
    # same engine family on the same pattern: LU through both orders succeeds
    import suitesparse_tpu as sst
    b = np.ones(A.ncol)
    for q in (q0, q1):
        x = sst.lusol(A, b)
        assert sst.residual_norm(A, x, b) < 1e-10


def test_nd_fastheap_bit_identical():
    """The deduplicated FM heap (SSTPU_ND_FASTHEAP, default) must be perm-
    identical to the classic every-update lazy heap: processing only happens
    at entries whose key equals the current gain, so skipping pushes that a
    live >=-key entry already covers cannot change the move order.
    (A looser variant that also skipped pushes on gain INCREASES drifted
    from exact descending-gain order and swung lnz ±7-25%; this test pins
    the exact behavior.)"""
    import subprocess
    import sys

    from suitesparse_tpu import native

    if not (native.available() and native.has("sstpu_nested_dissection")):
        pytest.skip("native ND unavailable")
    A = fixtures.laplacian_3d(12)
    S = A.aat_pattern()
    p_fast = native.nested_dissection(S.indptr, S.indices, A.ncol, 50, 7)
    prog = (
        "import numpy as np\n"
        "from suitesparse_tpu import native\n"
        "import sys\n"
        "d = np.load(sys.argv[1])\n"
        "p = native.nested_dissection(d['indptr'], d['indices'],"
        " int(d['n']), 50, 7)\n"
        "np.save(sys.argv[2], p)\n"
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        inp = os.path.join(td, "g.npz")
        out = os.path.join(td, "p.npy")
        np.savez(inp, indptr=S.indptr, indices=S.indices, n=A.ncol)
        env = dict(os.environ, SSTPU_ND_FASTHEAP="0", JAX_PLATFORMS="cpu")
        subprocess.run([sys.executable, "-c", prog, inp, out], check=True,
                       env=env, timeout=300)
        p_classic = np.load(out)
    assert np.array_equal(p_fast, p_classic)
