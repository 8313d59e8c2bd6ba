"""Fault-injection torture tests — the Tcov ``memory.c:31`` analog.

The reference's Tcov harness fails the N-th malloc and sweeps N upward,
asserting clean failure then eventual success with no corrupted state. The
TPU-library analogs injected here: device program failure at the N-th group
step (simulated RESOURCE_EXHAUSTED), plan-build failure, and native-engine
unavailability — each must surface a clean Python exception and leave the
symbolic/caches reusable (the retry after the fault must succeed and match
the clean result).
"""

import numpy as np
import pytest

from suitesparse_tpu.io import fixtures
from suitesparse_tpu.ordering.amd import amd_order
from suitesparse_tpu.symbolic.supernodes import analyze_supernodal
import suitesparse_tpu.numeric.supernodal_device as sd
import suitesparse_tpu as sst


class _InjectedOOM(RuntimeError):
    pass


def _clean_factor(A):
    S = analyze_supernodal(A, amd_order(A))
    F = sd.factorize_device(A, S)
    return S, np.asarray(F.Lx)


def test_group_step_failure_sweep(monkeypatch):
    """Fail the N-th group compute for N = 0..#groups; after each injected
    fault the SAME symbolic must factor cleanly and match the clean run."""
    A = fixtures.laplacian_3d(5)
    S, L_ref = _clean_factor(A)
    ngroups = sum(len(gl) for gl in S._device_plan.groups)
    orig = sd._group_compute
    for fail_at in range(0, ngroups, max(1, ngroups // 6)):
        calls = {"n": 0}

        def inject(*a, **k):
            if calls["n"] == fail_at:
                calls["n"] += 1
                raise _InjectedOOM(f"injected at group {fail_at}")
            calls["n"] += 1
            return orig(*a, **k)

        monkeypatch.setattr(sd, "_group_compute", inject)
        S2 = analyze_supernodal(A, amd_order(A))
        with pytest.raises(Exception):
            sd.factorize_device(A, S2)
        # recovery: same symbolic object, clean retry
        monkeypatch.setattr(sd, "_group_compute", orig)
        S2._device_fn = None            # compiled fn may be poisoned
        F = sd.factorize_device(A, S2)
        assert F.ok
        assert np.allclose(np.asarray(F.Lx), L_ref, atol=1e-6)


def test_segmented_runner_failure_mid_schedule(monkeypatch):
    """Kill the runner inside a mid-schedule segment; the next factorize on
    the same symbolic must succeed (carried-update state is per-call)."""
    import os

    A = fixtures.laplacian_3d(6)
    S, L_ref = _clean_factor(A)
    monkeypatch.setenv("SSTPU_SEGMENT", "1")
    monkeypatch.setenv("SSTPU_SEG_CELLS", "2000")
    S2 = analyze_supernodal(A, amd_order(A))
    Fok = sd.factorize_device(A, S2)        # establish segment cache
    nseg = len(S2._seg_cache[1])
    assert nseg > 1
    orig_fns = S2._seg_cache[1]
    boom_idx = nseg // 2

    def boom(*a, **k):
        raise _InjectedOOM("injected segment failure")

    patched = list(orig_fns)
    patched[boom_idx] = (boom, orig_fns[boom_idx][1],
                         orig_fns[boom_idx][2])
    S2._seg_cache = (S2._seg_cache[0], patched, S2._seg_cache[2])
    with pytest.raises(_InjectedOOM):
        sd.factorize_device(A, S2)
    # recovery
    S2._seg_cache = (S2._seg_cache[0], orig_fns, S2._seg_cache[2])
    F = sd.factorize_device(A, S2)
    assert F.ok
    assert np.allclose(np.asarray(F.Lx), np.asarray(Fok.Lx), atol=1e-6)


def test_plan_build_failure_leaves_symbolic_reusable(monkeypatch):
    A = fixtures.laplacian_3d(5)
    S = analyze_supernodal(A, amd_order(A))
    orig = sd.build_plan

    def boom(*a, **k):
        raise _InjectedOOM("injected plan-build failure")

    monkeypatch.setattr(sd, "build_plan", boom)
    with pytest.raises(_InjectedOOM):
        sd.factorize_device(A, S)
    monkeypatch.setattr(sd, "build_plan", orig)
    F = sd.factorize_device(A, S)
    assert F.ok
    b = np.ones(A.ncol)
    from suitesparse_tpu.numeric.supernodal_solve import solve_device
    x = solve_device(F, b)
    assert sst.residual_norm(A, x, b) < 1e-5


def test_native_unavailable_falls_back_everywhere(monkeypatch):
    """With the native library gone, the full pipeline still works on the
    Python oracles (the reference's no-BLAS build analog)."""
    import suitesparse_tpu.native as native

    monkeypatch.setattr(native, "available", lambda: False)
    A = fixtures.load_demo("bcsstk01")
    b = 1.0 + np.arange(A.ncol) / A.ncol
    x = sst.cholsol(A, b)
    assert sst.residual_norm(A, x, b) < 1e-10
    Ag = fixtures.load_demo("west0067")
    bg = Ag.matvec(np.ones(Ag.ncol))
    xg = sst.lusol(Ag, bg)
    assert sst.residual_norm(Ag, xg, bg) < 1e-8


def test_qr_and_lu_segmented_match_single_program(monkeypatch):
    """The QR-plan segmented runner (numeric/segmented.py) must reproduce
    the single-program results bit-for-bit for both pipelines."""
    from suitesparse_tpu import sparse
    from suitesparse_tpu.numeric.mflu_unsym import mflusol_unsym
    from suitesparse_tpu.numeric.qr import qrsol

    rng = np.random.default_rng(2)
    n = 200
    G = np.where(rng.random((n, n)) < 0.04,
                 rng.standard_normal((n, n)), 0) + 6 * np.eye(n)
    A = sparse.from_dense(G)
    b = G @ np.ones(n)
    x0 = mflusol_unsym(A, b)
    monkeypatch.setenv("SSTPU_SEGMENT", "1")
    monkeypatch.setenv("SSTPU_SEG_CELLS", "50000")
    x1 = mflusol_unsym(A, b)
    assert np.abs(x0 - x1).max() < 1e-12
    m2, n2 = 400, 220
    C = np.where(rng.random((m2, n2)) < 0.06,
                 rng.standard_normal((m2, n2)), 0)
    C[np.arange(n2), np.arange(n2)] += 5
    Aq = sparse.from_dense(C)
    bq = rng.standard_normal(m2)
    xq = qrsol(Aq, bq)
    xref, *_ = np.linalg.lstsq(C, bq, rcond=None)
    assert np.abs(xq - xref).max() / max(np.abs(xref).max(), 1) < 1e-4
