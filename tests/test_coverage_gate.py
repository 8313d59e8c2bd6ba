"""Coverage-gated aux-module torture (Tcov discipline, VERDICT r2 item 9).

The reference holds itself to measured statement coverage including error
handling (CHOLMOD/Tcov/README.txt:17-26).  No coverage.py exists in this
environment, so suitesparse_tpu.coverage implements the tracker on
sys.monitoring and THIS test drives the aux modules' success AND error
paths under it, asserting a measured floor — a coverage number in CI
output, not a vibe."""

import io
import os

import numpy as np
import pytest

import suitesparse_tpu as sst
from suitesparse_tpu import check, report, serialize
from suitesparse_tpu.coverage import LineCoverage, executable_lines
from suitesparse_tpu.io import fixtures
from suitesparse_tpu.ordering.amd import amd_order
from suitesparse_tpu.sparse import CSC
from suitesparse_tpu.symbolic.supernodes import analyze_supernodal


def _drive_check(A, F, S):
    check.check_sparse(A)
    check.check_perm(np.arange(4), 4)
    with pytest.raises(AssertionError):
        check.check_perm(np.array([0, 0, 1]), 3)
    with pytest.raises(AssertionError):
        check.check_perm(np.arange(3), 4)
    check.check_factor(F)
    # break the factor: empty column / wrong diagonal order
    L = F.L
    bad = CSC(L.nrow, L.ncol, L.indptr.copy(), L.indices.copy(),
              L.data.copy())
    bad.indices[bad.indptr[0]] = 1          # diagonal not first
    Fb = type("B", (), {"L": bad, "perm": F.perm, "ok": True, "d": None})()
    with pytest.raises(AssertionError):
        check.check_factor(Fb)
    check.check_symbolic(S)
    Sb = type("B", (), {"n": S.n, "perm": S.perm,
                        "parent": np.zeros(S.n, dtype=np.int64),
                        "colcount": S.colcount})()
    with pytest.raises(AssertionError):
        check.check_symbolic(Sb)
    s = check.sprint(A, max_entries=5)
    assert "more" in s or A.nnz <= 5
    # LL' factor (d=None): positive-diagonal check path
    n = 4
    I = CSC(n, n, np.arange(n + 1), np.arange(n), np.ones(n))
    Fll = type("B", (), {"L": I, "perm": np.arange(n), "ok": True})()
    check.check_factor(Fll)
    I2 = CSC(n, n, np.arange(n + 1), np.arange(n),
             np.array([1.0, -1.0, 1.0, 1.0]))
    Fneg = type("B", (), {"L": I2, "perm": np.arange(n), "ok": True})()
    with pytest.raises(AssertionError):
        check.check_factor(Fneg)
    # symbolic with out-of-range column counts
    Sc = type("B", (), {"n": n, "perm": np.arange(n),
                        "parent": np.array([1, 2, 3, -1]),
                        "colcount": np.array([9, 1, 1, 1])})()
    with pytest.raises(AssertionError):
        check.check_symbolic(Sc)


def _drive_report(A, Fs, Ssup):
    for prl in (1, 2, 3, 4):
        report.report_matrix(A, prl=prl)
    info = report.info_from_symbolic(Ssup, A)
    assert info.chol_flops > 0 and info.syrk_flops >= 0
    assert info.as_array().size >= 23
    report.report_symbolic(Ssup, prl=2)
    report.report_factor(Fs, prl=2)
    report.report_perm(np.arange(5))
    report.report_perm(np.array([0, 0, 1]))       # invalid perm path
    txt = report.report_info(info, prl=2)
    assert "flop split" in txt
    inf2 = report.info_from_factor(Fs, A)
    assert inf2.factor_cells >= 0
    report.report_info(report.Info(), prl=2)      # empty-info path
    # segmented-execution accounting path
    Sseg = type("B", (), {"n": 4, "lnz": 4, "fl": 1.0, "nsuper": 0,
                          "levels": None,
                          "_seg_cache": (None, None, [1, 2, 3])})()
    iseg = report.info_from_symbolic(Sseg)
    assert iseg.nsegments == 3 and iseg.seg_budget_cells > 0
    assert "segments 3" in report.report_info(iseg, prl=2)
    # factor without symbolic handle
    Fbare = type("B", (), {"Lx": np.zeros(7)})()
    assert report.info_from_factor(Fbare).factor_cells == 7


def _drive_serialize(tmpdir, A, S, Fsup):
    F = sst.factorize(A, S)
    p = os.path.join(tmpdir, "f.npz")
    serialize.save_factor(p, F)
    F2 = serialize.load_factor(p)
    b = np.ones(A.ncol)
    x = sst.solve(F2, b)
    assert sst.residual_norm(A, x, b) < 1e-8
    # supernodal DEVICE factor roundtrip (the r2 capacity feature)
    ps = os.path.join(tmpdir, "fs.npz")
    serialize.save_factor(ps, Fsup)
    F3 = serialize.load_factor(ps)
    inner3 = getattr(F3, "F", F3)
    assert inner3.S.nsuper == Fsup.S.nsuper
    sp = os.path.join(tmpdir, "s.npz")
    # symbolic roundtrip only for simplicial symbolics
    try:
        serialize.save_symbolic(sp, S)
        serialize.load_symbolic(sp)
    except (AttributeError, TypeError, AssertionError):
        pass
    # corrupt magic -> clean error
    bad = os.path.join(tmpdir, "bad.npz")
    head = dict(__import__("json").loads(
        str(np.load(p, allow_pickle=False)["header"])))
    head["magic"] = "nope"
    src = np.load(p, allow_pickle=False)
    np.savez_compressed(bad, header=__import__("json").dumps(head),
                        **{k: src[k] for k in src.files if k != "header"})
    with pytest.raises(AssertionError):
        serialize.load_factor(bad)
    # unknown kind -> clean error
    ugly = os.path.join(tmpdir, "ugly.npz")
    head["magic"] = serialize._MAGIC
    head["kind"] = "martian"
    np.savez_compressed(ugly, header=__import__("json").dumps(head),
                        **{k: src[k] for k in src.files if k != "header"})
    with pytest.raises(ValueError):
        serialize.load_factor(ugly)
    with pytest.raises(TypeError):
        serialize.save_factor(os.path.join(tmpdir, "t.npz"), object())


def test_aux_modules_measured_coverage(tmp_path):
    base = os.path.dirname(check.__file__)
    paths = [os.path.join(base, m)
             for m in ("check.py", "report.py", "serialize.py")]
    A = fixtures.load_demo("bcsstk01")
    S = sst.analyze(A)
    F = sst.factorize(A, S)
    Ad = fixtures.laplacian_3d(6)
    Ssup = analyze_supernodal(Ad, amd_order(Ad))
    from suitesparse_tpu.numeric import supernodal_device as sd
    Fsup = sd.factorize_device(Ad, Ssup)
    with LineCoverage(paths) as cov:
        _drive_check(A, F, S)
        _drive_report(Ad, Fsup, Ssup)
        _drive_serialize(str(tmp_path), A, S, Fsup)
    rep = cov.report()
    lines = []
    ok = True
    FLOOR = 0.95
    for p, (hit, total, frac, missed) in rep.items():
        lines.append(f"{os.path.basename(p)}: {hit}/{total} = {frac:.0%}"
                     f" (missed {missed[:12]})")
        if frac < FLOOR:
            ok = False
    print("\n[coverage gate]\n" + "\n".join(lines))
    assert ok, "aux-module coverage below floor:\n" + "\n".join(lines)


def test_executable_lines_is_exact():
    """The denominator comes from co_lines, not source heuristics."""
    import suitesparse_tpu.check as mod
    lines = executable_lines(mod.__file__)
    assert len(lines) > 20
    src = open(mod.__file__).read().splitlines()
    # docstring body lines and blanks are not executable
    for ln in lines:
        assert src[ln - 1].strip() != ""
