"""Supernodal symbolic + multifrontal numeric tests (host oracle, device path)."""

import numpy as np
import pytest

import suitesparse_tpu as sst
from suitesparse_tpu.config import FactorKind
from suitesparse_tpu.io import fixtures
from suitesparse_tpu.numeric import simplicial, supernodal, supernodal_device
from suitesparse_tpu.ordering.amd import amd_order
from suitesparse_tpu.sparse import residual_norm
from suitesparse_tpu.symbolic.supernodes import analyze_supernodal

CFG64 = sst.DEFAULT.replace(compute_dtype="float64")


def spd_cases():
    cases = [("lap2d_16", lambda: fixtures.laplacian_2d(16)),
             ("banded", lambda: fixtures.banded_spd(200, 6, seed=3)),
             ("rand_spd", lambda: fixtures.random_spd(150, 0.05, seed=4))]
    if fixtures.have_reference():
        cases.append(("bcsstk01", lambda: fixtures.load_demo("bcsstk01")))
    return cases


@pytest.mark.parametrize("name,gen", spd_cases(), ids=[c[0] for c in spd_cases()])
def test_supernodal_symbolic_invariants(name, gen):
    A = gen()
    n = A.ncol
    S = analyze_supernodal(A, amd_order(A))
    # columns partitioned into contiguous supernodes
    assert S.super_first[0] == 0 and S.super_first[-1] == n
    assert np.all(np.diff(S.super_first) >= 1)
    for s in range(S.nsuper):
        f, l = S.super_first[s], S.super_first[s + 1]
        rows = S.rows[s]
        # first ncols rows are the supernode's own columns
        assert np.array_equal(rows[:l - f], np.arange(f, l))
        assert np.all(np.diff(rows) > 0)
        # pattern containment: child's below-rows within parent's rows
        p = S.sparent[s]
        if p != -1:
            below = rows[l - f:]
            assert np.all(np.isin(below[below < S.super_first[p + 1]],
                                  S.rows[p]))
    # supernode pattern must contain the exact column pattern (equality
    # without amalgamation; superset with)
    C = A.symperm(S.perm)
    F = simplicial.symbolic_cholesky(C)
    for s in range(S.nsuper):
        f = S.super_first[s]
        assert len(S.rows[s]) >= F.colcount[f]


@pytest.mark.parametrize("name,gen", spd_cases(), ids=[c[0] for c in spd_cases()])
def test_host_multifrontal_vs_dense(name, gen):
    A = gen()
    S = analyze_supernodal(A, amd_order(A))
    F = supernodal.factorize_host(A, S)
    assert F.ok
    L = supernodal.to_csc(F).to_dense()
    C = A.symperm(S.perm).to_dense()
    scale = max(np.abs(C).max(), 1.0)
    assert np.abs(L @ L.T - C).max() / scale < 1e-12


@pytest.mark.parametrize("name,gen", spd_cases(), ids=[c[0] for c in spd_cases()])
def test_device_matches_host(name, gen):
    A = gen()
    S = analyze_supernodal(A, amd_order(A))
    Fh = supernodal.factorize_host(A, S)
    Fd = supernodal_device.factorize_device(A, S, CFG64)
    assert Fd.ok
    scale = max(np.abs(Fh.Lx).max(), 1.0)
    assert np.abs(Fh.Lx - Fd.lx_host()).max() / scale < 1e-13


def test_supernodal_solve_end_to_end():
    A = fixtures.laplacian_2d(24)
    n = A.ncol
    cfg = CFG64.replace(factor_kind=FactorKind.SUPERNODAL_LL)
    S = sst.analyze(A, cfg)
    F = sst.factorize(A, S, cfg)
    assert F.ok
    b = 1.0 + np.arange(n) / n
    x = sst.solve(F, b)
    assert residual_norm(A, x, b) < 1e-12


def trapezoid_lnz(S):
    """Stored entries excluding the (structurally zero) upper triangles of the
    diagonal blocks — comparable to simplicial colcount sums."""
    tot = 0
    for s in range(S.nsuper):
        nc = S.ncols(s)
        tot += S.nrows(s) * nc - nc * (nc - 1) // 2
    return tot


def test_amalgamation_bounded_fill():
    A = fixtures.laplacian_2d(30)
    p = amd_order(A)
    S = analyze_supernodal(A, p)
    exact = simplicial.symbolic_cholesky(A, S.perm)
    # relaxed amalgamation stores some explicit zeros but must stay bounded
    assert trapezoid_lnz(S) >= exact.lnz
    assert trapezoid_lnz(S) <= 2.0 * exact.lnz
    # and reduce supernode count vs no-amalgamation fundamental supernodes
    cfg0 = sst.DEFAULT.replace(nrelax=(0, 0, 0), zrelax=(0.0, 0.0, 0.0))
    S0 = analyze_supernodal(A, p, cfg0)
    assert trapezoid_lnz(S0) == exact.lnz  # no amalgamation = exact fill
    assert S.nsuper <= S0.nsuper


def test_not_positive_definite_supernodal():
    rng = np.random.default_rng(0)
    D = rng.standard_normal((40, 40))
    D = (D + D.T) / 2  # indefinite
    np.fill_diagonal(D, 0.1)
    A = sst.from_dense(np.triu(D), sym=1)
    S = analyze_supernodal(A, amd_order(A))
    F = supernodal.factorize_host(A, S)
    assert not F.ok
    assert 0 <= F.minor < 40


def test_auto_dispatch_supernodal():
    # high fl/lnz ratio → AUTO picks supernodal
    A = fixtures.laplacian_3d(10)
    cfg = CFG64
    S = sst.analyze(A, cfg)
    F = sst.factorize(A, S, cfg)  # AUTO
    assert isinstance(F, supernodal.SupernodalFactorAdapter)
    b = np.ones(A.ncol)
    x = sst.solve(F, b)
    assert residual_norm(A, x, b) < 1e-12


def test_device_solve_matches_host():
    from suitesparse_tpu.numeric import supernodal_solve
    A = fixtures.laplacian_2d(20)
    n = A.ncol
    S = analyze_supernodal(A, amd_order(A))
    F = supernodal.factorize_host(A, S)
    rng = np.random.default_rng(0)
    B = rng.standard_normal((n, 3))
    # host CSC path
    ad = supernodal.SupernodalFactorAdapter(F)
    Xh = simplicial.chol_solve(ad, B)
    # device level-scheduled path
    Xd = supernodal_solve.solve_device(F, B, CFG64)
    assert np.allclose(Xh, Xd, atol=1e-12)
    # 1-D RHS
    xd = supernodal_solve.solve_device(F, B[:, 0], CFG64)
    assert np.allclose(xd, Xh[:, 0], atol=1e-12)
    for k in range(3):
        assert residual_norm(A, Xd[:, k], B[:, k]) < 1e-12


def test_bf16_updates_with_refinement():
    """bfloat16 child-update storage + iterative refinement (config
    update_dtype) — residual recovered to fp32-class."""
    import suitesparse_tpu as sst
    from suitesparse_tpu.numeric import supernodal_solve

    A = fixtures.laplacian_3d(7)
    S = analyze_supernodal(A, amd_order(A))
    cfg = sst.DEFAULT.replace(update_dtype="bfloat16")
    F = supernodal_device.factorize_device(A, S, cfg)
    assert F.ok
    n = A.ncol
    b = 1.0 + np.arange(n) / n
    x0 = supernodal_solve.solve_device(F, b, cfg)
    r0 = sst.residual_norm(A, x0, b)
    x = supernodal_solve.solve_refined(F, A, b, iters=2, config=cfg)
    r = sst.residual_norm(A, x, b)
    assert r0 < 1e-1            # bf16 updates alone: coarse but sane
    assert r < 1e-5             # refinement recovers accuracy
    assert r <= r0


def test_factor_many_values_change():
    """analyze-once/factor-many: new values through the cached plan/program
    (the _clow_data value map) give the updated factor."""
    import suitesparse_tpu as sst
    from suitesparse_tpu.numeric import supernodal_solve
    from suitesparse_tpu.sparse import CSC

    A = fixtures.laplacian_3d(7)
    S = analyze_supernodal(A, amd_order(A))
    b = 1.0 + np.arange(A.ncol) / A.ncol
    F1 = supernodal_device.factorize_device(A, S)
    x1 = supernodal_solve.solve_device(F1, b)
    A2 = CSC(A.nrow, A.ncol, A.indptr, A.indices, A.data * 2.0, A.sym)
    F2 = supernodal_device.factorize_device(A2, S)
    x2 = supernodal_solve.solve_device(F2, b)
    assert sst.residual_norm(A2, x2, b) < 1e-3
    np.testing.assert_allclose(x2, x1 / 2.0, atol=1e-4)


def test_vectorized_plan_matches_loop_builder():
    """The vectorized plan builder must emit bit-identical GroupPlans to the
    legacy per-supernode loop builder (VERDICT r1 item 4)."""
    import os
    import numpy as np
    from suitesparse_tpu.io import fixtures
    from suitesparse_tpu.ordering.amd import amd_order
    from suitesparse_tpu.symbolic.supernodes import analyze_supernodal
    import suitesparse_tpu.numeric.supernodal_device as sd

    A = fixtures.laplacian_3d(9)
    S = analyze_supernodal(A, amd_order(A))
    C_low = A.symperm(S.perm).transpose()
    os.environ["SSTPU_PLAN_LOOPS"] = "1"
    try:
        p_old = sd.build_plan(S, C_low)
    finally:
        os.environ["SSTPU_PLAN_LOOPS"] = "0"
    p_new = sd.build_plan(S, C_low)
    for gl1, gl2 in zip(p_old.groups, p_new.groups):
        assert len(gl1) == len(gl2)
        for g1, g2 in zip(gl1, gl2):
            assert (g1.R, g1.C, g1.B, g1.panel_base) == \
                (g2.R, g2.C, g2.B, g2.panel_base)
            assert np.array_equal(g1.asrc, g2.asrc)
            assert np.array_equal(g1.adst, g2.adst)
            for (s1, d1, i1), (s2, d2, i2) in zip(g1._pair_arrays,
                                                  g2._pair_arrays):
                assert np.array_equal(s1, s2) and np.array_equal(d1, d2) \
                    and np.array_equal(i1, i2)


def test_native_super_analysis_matches_python_oracle():
    """Native cholmod_super_symbolic-analog must agree with the Python
    oracle on every output array."""
    import numpy as np
    import suitesparse_tpu.native as native
    if not native.available():
        return
    from suitesparse_tpu.io import fixtures
    from suitesparse_tpu.ordering.amd import amd_order
    import suitesparse_tpu.symbolic.supernodes as sn

    A = fixtures.laplacian_3d(8)
    p = amd_order(A)
    S1 = sn.analyze_supernodal(A, p.copy())
    orig = native.available
    native.available = lambda: False
    try:
        S2 = sn.analyze_supernodal(A, p.copy())
    finally:
        native.available = orig
    assert S1.nsuper == S2.nsuper
    for name in ("super_first", "sparent", "snode_of_col", "level_of", "Lpx"):
        assert np.array_equal(getattr(S1, name), getattr(S2, name)), name
    assert S1.lnz == S2.lnz and S1.maxcsize == S2.maxcsize
    assert abs(S1.fl - S2.fl) < 1e-6 * max(S1.fl, 1.0)
    for s in range(S1.nsuper):
        assert np.array_equal(S1.rows[s], S2.rows[s])


def test_inverse_panel_solve_matches_trisolve(monkeypatch):
    """SSTPU_SOLVE_INV=1: W = L11^{-1} panels replace every in-sweep
    trisolve with one matmul; must match the trisolve route to fp32 and
    refine to fp64-class residuals (the single-RHS latency mode)."""
    from suitesparse_tpu.numeric import supernodal_device, supernodal_solve

    A = fixtures.laplacian_3d(7)
    S = analyze_supernodal(A, amd_order(A))
    F = supernodal_device.factorize_device(A, S)
    b = 1.0 + np.arange(A.ncol) / A.ncol
    monkeypatch.setenv("SSTPU_SOLVE_INV", "0")
    S._solve_cache = None
    x_tri = supernodal_solve.solve_device(F, b)
    monkeypatch.setenv("SSTPU_SOLVE_INV", "1")
    S._solve_cache = None
    x_inv = supernodal_solve.solve_device(F, b)
    assert residual_norm(A, x_inv, b) < 1e-5
    assert np.abs(x_inv - x_tri).max() / np.abs(x_tri).max() < 1e-4
    # multi-RHS through the same cache key machinery
    B = np.stack([b, -2.0 * b], axis=1)
    X = supernodal_solve.solve_device(F, B)
    for k in range(2):
        assert residual_norm(A, X[:, k], B[:, k]) < 1e-5
    # refinement restores the double-precision contract
    xr = supernodal_solve.solve_refined(F, A, b)
    assert residual_norm(A, xr, b) < 1e-14
    # a SECOND factorize (fresh values) must rebuild W, not reuse stale
    A2 = fixtures.laplacian_3d(7)
    A2.data = A2.data * 2.0
    F2 = supernodal_device.factorize_device(A2, S)
    x3 = supernodal_solve.solve_device(F2, b)
    assert residual_norm(A2, x3, b) < 1e-5


def test_w2_stacked_panel_solve(monkeypatch):
    """SSTPU_SOLVE_W2=1: the stacked inverse panel W2 = [W ; L21 W]
    collapses each group's sweep step to ONE batched matvec (forward
    [xc; v] = W2 yc, backward xc = W2^T [yf; -xb]) with no intra-group
    dependency. Must match the inverse-panel route on every path (XLA
    and lane-batched bmv kernel), any nrhs, and refine to fp64."""
    from suitesparse_tpu.numeric import supernodal_device, supernodal_solve

    A = fixtures.laplacian_3d(7)
    S = analyze_supernodal(A, amd_order(A))
    F = supernodal_device.factorize_device(A, S)
    b = 1.0 + np.arange(A.ncol) / A.ncol
    monkeypatch.setenv("SSTPU_SOLVE_INV", "1")
    monkeypatch.setenv("SSTPU_SOLVE_W2", "0")
    S._solve_cache = None
    F._winv = None
    x_inv = supernodal_solve.solve_device(F, b)
    monkeypatch.setenv("SSTPU_SOLVE_W2", "1")
    S._solve_cache = None
    F._winv = None
    x_w2 = supernodal_solve.solve_device(F, b)
    assert residual_norm(A, x_w2, b) < 1e-5
    assert np.abs(x_w2 - x_inv).max() / np.abs(x_inv).max() < 1e-4
    # the winv entries are stacked-panel dicts
    wv = F._winv[2]
    kinds = {tuple(e.keys())[0] if isinstance(e, dict) else "tuple"
             for row in wv for e in row}
    assert kinds <= {"w2", "w2t"} and "w2" in kinds or "w2t" in kinds
    # multi-RHS
    B = np.stack([b, -2.0 * b, 0.5 * b], axis=1)
    X = supernodal_solve.solve_device(F, B)
    for k in range(3):
        assert residual_norm(A, X[:, k], B[:, k]) < 1e-5
    # compose with the lane-batched kernel (interpret mode off-TPU)
    monkeypatch.setenv("SSTPU_SOLVE_BMV", "1")
    monkeypatch.setenv("SSTPU_BMV_BMIN", "4")
    S._solve_cache = None
    F._winv = None
    x_bmv = supernodal_solve.solve_device(F, b)
    assert residual_norm(A, x_bmv, b) < 1e-5
    assert np.abs(x_bmv - x_w2).max() / np.abs(x_w2).max() < 1e-4
    wv = F._winv[2]
    assert any(isinstance(e, dict) and "w2t" in e
               for row in wv for e in row)
    # refinement restores the double-precision contract
    assert residual_norm(A, supernodal_solve.solve_refined(F, A, b),
                         b) < 1e-14
    # compose with the coarse plan
    monkeypatch.delenv("SSTPU_SOLVE_BMV", raising=False)
    monkeypatch.setenv("SSTPU_SOLVE_COARSE", "1")
    S._solve_cache = None
    F._winv = None
    x_c = supernodal_solve.solve_device(F, b)
    assert residual_norm(A, x_c, b) < 1e-5


def test_pmv_stream_matvec_solve(monkeypatch):
    """SSTPU_SOLVE_PMV=1 (+w2): big-front groups apply the stacked panel
    through the streaming pallas matvec (kernels/pmatvec.py), stored in
    both orientations so both sweeps reduce over sublanes. Must match
    the plain w2 route and refine to fp64."""
    from suitesparse_tpu.numeric import supernodal_device, supernodal_solve

    A = fixtures.laplacian_3d(12)
    S = analyze_supernodal(A, amd_order(A))
    F = supernodal_device.factorize_device(A, S)
    b = 1.0 + np.arange(A.ncol) / A.ncol
    monkeypatch.setenv("SSTPU_SOLVE_INV", "1")
    monkeypatch.setenv("SSTPU_SOLVE_W2", "1")
    S._solve_cache = None
    F._winv = None
    x0 = supernodal_solve.solve_device(F, b)
    monkeypatch.setenv("SSTPU_SOLVE_PMV", "1")
    monkeypatch.setenv("SSTPU_PMV_MIN_CELLS", "20000")
    S._solve_cache = None
    F._winv = None
    x1 = supernodal_solve.solve_device(F, b)
    assert residual_norm(A, x1, b) < 1e-5
    scale = np.abs(x0).max()
    assert np.allclose(x1, x0, atol=2e-6 * scale, rtol=2e-6)
    wv = F._winv[2]
    assert any(isinstance(e, dict) and "w2f" in e
               for row in wv for e in row), "no group took the pmv path"
    # multi-RHS + refinement
    B = np.stack([b, -2.0 * b], axis=1)
    X = supernodal_solve.solve_device(F, B)
    for k in range(2):
        assert residual_norm(A, X[:, k], B[:, k]) < 1e-5
    assert residual_norm(A, supernodal_solve.solve_refined(F, A, b),
                         b) < 1e-14


def test_sorted_route_solve(monkeypatch):
    """SSTPU_SOLVE_SORT=1: class-sorted pass-up buffers (one batch
    permutation per child group; classes read static slices, backward
    writes static update-slices). Pair-class sources are disjoint per
    child group (tree-edge routing), so results match exactly."""
    from suitesparse_tpu.numeric import supernodal_device, supernodal_solve
    from suitesparse_tpu.numeric.supernodal_solve import _sorted_route

    A = fixtures.laplacian_3d(9)
    S = analyze_supernodal(A, amd_order(A))
    F = supernodal_device.factorize_device(A, S)
    b = 1.0 + np.arange(A.ncol) / A.ncol
    monkeypatch.setenv("SSTPU_SOLVE_INV", "1")
    monkeypatch.setenv("SSTPU_SOLVE_W2", "1")
    S._solve_cache = None
    F._winv = None
    x0 = supernodal_solve.solve_device(F, b)
    monkeypatch.setenv("SSTPU_SOLVE_SORT", "1")
    S._solve_cache = None
    F._winv = None
    x1 = supernodal_solve.solve_device(F, b)
    assert residual_norm(A, x1, b) < 1e-5
    scale = np.abs(x0).max()
    assert np.allclose(x1, x0, atol=2e-6 * scale, rtol=2e-6)
    # invariants of the sort maps: disjoint coverage, offsets partition
    smap, cmap = _sorted_route(S._device_plan)
    for (key, (cat, inv, ncat)) in smap.items():
        assert len(np.unique(cat)) == len(cat) == ncat
        B_c = S._device_plan.groups[key[0]][key[1]].B
        assert (inv[cat] == np.arange(ncat)).all()
        assert inv.shape == (B_c,)
    # multi-RHS
    B = np.stack([b, -2.0 * b], axis=1)
    X = supernodal_solve.solve_device(F, B)
    for k in range(2):
        assert residual_norm(A, X[:, k], B[:, k]) < 1e-5


def test_merged_route_solve(monkeypatch):
    """SSTPU_SOLVE_MERGE=1: RU_c-bucketed class merging + the global rhs
    pre-gather.  Same-width classes concatenate with zero padding, so the
    only numeric difference vs the per-class loop is fp32 scatter-add
    ORDER on overlapping dest rows; results match to add-order tolerance
    and the bucket arrays partition the original classes exactly."""
    from suitesparse_tpu.numeric import supernodal_device, supernodal_solve
    from suitesparse_tpu.numeric.supernodal_solve import _merged_route

    A = fixtures.laplacian_3d(9)
    S = analyze_supernodal(A, amd_order(A))
    F = supernodal_device.factorize_device(A, S)
    b = 1.0 + np.arange(A.ncol) / A.ncol
    for w2 in ("0", "1"):
        monkeypatch.setenv("SSTPU_SOLVE_INV", "1")
        monkeypatch.setenv("SSTPU_SOLVE_W2", w2)
        monkeypatch.delenv("SSTPU_SOLVE_MERGE", raising=False)
        S._solve_cache = None
        F._winv = None
        x0 = supernodal_solve.solve_device(F, b)
        monkeypatch.setenv("SSTPU_SOLVE_MERGE", "1")
        S._solve_cache = None
        F._winv = None
        x1 = supernodal_solve.solve_device(F, b)
        assert residual_norm(A, x1, b) < 1e-5
        scale = np.abs(x0).max()
        assert np.allclose(x1, x0, atol=2e-6 * scale, rtol=2e-6)
    # bucket invariants: every class appears in exactly one bucket, with
    # matching widths and a contiguous [k0, k1) partition
    for gl in S._device_plan.groups:
        for g in gl:
            mr = _merged_route(g)
            npairs = sum(len(metas) for (_i, _d, metas) in mr)
            assert npairs == len(g.pairs)
            for (idxcat, dstcat, metas) in mr:
                assert idxcat.shape[0] == dstcat.shape[0] == metas[-1][4]
                prev = 0
                for (_sl, _sgi, src, k0, k1) in metas:
                    assert k0 == prev and k1 - k0 == src.size
                    prev = k1
    # multi-RHS path
    B = np.stack([b, -2.0 * b], axis=1)
    X = supernodal_solve.solve_device(F, B)
    for k in range(2):
        assert residual_norm(A, X[:, k], B[:, k]) < 1e-5


def test_fused_route_solve(monkeypatch):
    """SSTPU_SOLVE_FUSE_ROUTE=1: per-dest-group fused pair routing (one
    padded placement per group instead of one per class) must match the
    per-class loop to fp32 add-order tolerance (the per-dest-row
    accumulation order may differ across class boundaries)."""
    from suitesparse_tpu.numeric import supernodal_device, supernodal_solve

    A = fixtures.laplacian_3d(7)
    S = analyze_supernodal(A, amd_order(A))
    F = supernodal_device.factorize_device(A, S)
    b = 1.0 + np.arange(A.ncol) / A.ncol
    monkeypatch.setenv("SSTPU_SOLVE_INV", "1")
    S._solve_cache = None
    F._winv = None
    x0 = supernodal_solve.solve_device(F, b)
    monkeypatch.setenv("SSTPU_SOLVE_FUSE_ROUTE", "1")
    S._solve_cache = None
    F._winv = None
    x1 = supernodal_solve.solve_device(F, b)
    scale = np.abs(x0).max()
    assert np.allclose(x1, x0, atol=2e-6 * scale, rtol=2e-6)
    assert residual_norm(A, x1, b) < 1e-5
    # fused arrays exist on multi-class groups and cover every class
    seen = 0
    for gl in S._device_plan.groups:
        for g in gl:
            fr = getattr(g, "_solve_fused", None)
            if fr is None:
                continue
            seen += 1
            idxcat, dstcat, metas, RUmax = fr
            assert idxcat.shape[0] == dstcat.shape[0] == metas[-1][4]
            assert RUmax == max(pc.RU_c for pc in g.pairs)
            assert sum(k1 - k0 for (_s, _g, _src, k0, k1, _r) in metas) \
                == idxcat.shape[0]
    assert seen > 0
    # compose with w2 and multi-RHS
    monkeypatch.setenv("SSTPU_SOLVE_W2", "1")
    S._solve_cache = None
    F._winv = None
    B = np.stack([b, -2.0 * b], axis=1)
    X = supernodal_solve.solve_device(F, B)
    for k in range(2):
        assert residual_norm(A, X[:, k], B[:, k]) < 1e-5


def test_coarse_solve_plan(monkeypatch):
    """SSTPU_SOLVE_COARSE=1: the solve re-buckets supernodes with pow4
    rungs (~3.6x fewer sequential group steps at n=125k) and consumes a
    one-time relayout gather of the device factor (GAPPED panel rows:
    pivot at [0,nc), below at [C, C+nr-nc)). Must match the fine route,
    compose with inverse panels, and refine to fp64."""
    from suitesparse_tpu.numeric import supernodal_device, supernodal_solve

    A = fixtures.laplacian_3d(9)
    S = analyze_supernodal(A, amd_order(A))
    F = supernodal_device.factorize_device(A, S)
    b = 1.0 + np.arange(A.ncol) / A.ncol
    monkeypatch.setenv("SSTPU_SOLVE_COARSE", "0")
    S._solve_cache = None
    x0 = supernodal_solve.solve_device(F, b)
    monkeypatch.setenv("SSTPU_SOLVE_COARSE", "1")
    S._solve_cache = None
    x1 = supernodal_solve.solve_device(F, b)
    assert residual_norm(A, x1, b) < 1e-5
    assert np.abs(x1 - x0).max() / np.abs(x0).max() < 1e-4
    g_fine = sum(len(gl) for gl in S._device_plan.groups)
    g_coarse = sum(len(gl) for gl in S._solve_coarse_plan.groups)
    assert g_coarse < g_fine
    # compose with inverse panels
    monkeypatch.setenv("SSTPU_SOLVE_INV", "1")
    S._solve_cache = None
    x2 = supernodal_solve.solve_device(F, b)
    assert residual_norm(A, x2, b) < 1e-5
    assert residual_norm(A, supernodal_solve.solve_refined(F, A, b),
                         b) < 1e-14


def test_coarse_solve_after_distributed_swap(monkeypatch):
    """The coarse relayout map is keyed on the CURRENT device plan: after
    dist_factorize_v2 swaps in the split-mask plan, a coarse solve on the
    distributed factor must rebuild the map, not reuse the stale one."""
    jax = pytest.importorskip("jax")
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from suitesparse_tpu.numeric import supernodal_device, supernodal_solve
    from suitesparse_tpu.parallel import multihost as mh
    from suitesparse_tpu.parallel.dist2 import dist_factorize_v2

    monkeypatch.setenv("SSTPU_SOLVE_COARSE", "1")
    A = fixtures.laplacian_3d(7)
    S = analyze_supernodal(A, amd_order(A))
    F0 = supernodal_device.factorize_device(A, S)
    b = np.ones(A.ncol)
    x0 = supernodal_solve.solve_device(F0, b)
    assert residual_norm(A, x0, b) < 1e-5
    mesh = mh.host_chip_mesh(jax.devices()[:4], 1, 4)
    Fd = dist_factorize_v2(A, S, mesh)
    xd = supernodal_solve.solve_device(Fd, b)
    assert residual_norm(A, xd, b) < 1e-5


def test_relayout_fn_matches_map_oracle():
    """The static-slice device relayout must equal the explicit gather-map
    oracle bit-for-bit (the map is the simple spec; the slice program is
    what ships — a ladder edit that breaks the g1-within-g2 nesting
    invariant must fail HERE, not as an unlocalized residual)."""
    import jax.numpy as jnp
    from suitesparse_tpu.numeric import supernodal_device as sd
    from suitesparse_tpu.numeric import supernodal_solve as ssv

    A = fixtures.laplacian_3d(8)
    S = analyze_supernodal(A, amd_order(A))
    F = supernodal_device.factorize_device(A, S)
    plan1 = S._device_plan
    plan2 = sd.build_plan(S, S._clow_cache,
                          ladders=(ssv._SOLVE_R_LADDER,
                                   ssv._SOLVE_C_LADDER))
    m = ssv.relayout_map(S, plan1, plan2)
    ref = np.concatenate([np.asarray(F.Lx), [0.0]])[m]
    got = np.asarray(ssv.relayout_fn(S, plan1, plan2)(F.Lx))
    assert np.array_equal(got, ref.astype(got.dtype))


def test_coarse_inv_solve_after_segmented_factorize(monkeypatch):
    """Memory-bounded segmented factorize composed with the coarse+inverse
    solve modes: the relayout/W caches must key correctly off the segmented
    factor's Lx too."""
    monkeypatch.setenv("SSTPU_SEGMENT", "1")
    monkeypatch.setenv("SSTPU_SEG_CELLS", "20000")
    monkeypatch.setenv("SSTPU_SOLVE_COARSE", "1")
    monkeypatch.setenv("SSTPU_SOLVE_INV", "1")
    from suitesparse_tpu.numeric import supernodal_device, supernodal_solve

    A = fixtures.laplacian_3d(8)
    S = analyze_supernodal(A, amd_order(A))
    F = supernodal_device.factorize_device(A, S)
    b = 1.0 + np.arange(A.ncol) / A.ncol
    x = supernodal_solve.solve_device(F, b)
    assert residual_norm(A, x, b) < 1e-5
    assert residual_norm(A, supernodal_solve.solve_refined(F, A, b),
                         b) < 1e-14


def test_tile_smem_chunking(monkeypatch):
    """SSTPU_TILE_SMEM: any ONE tile-kernel call whose per-step map operand
    would exceed the SMEM arena (the aniso3d_60 1.8 MB rowmap compile
    failure) must be grid-chunked into sequential calls chained on the F
    io-alias — bit-identical to the unchunked kernel (disjoint step
    slices, absolute tile coordinates)."""
    monkeypatch.setenv("SSTPU_PLACE", "tile")
    monkeypatch.setenv("SSTPU_TILE_RMIN", "32")
    from suitesparse_tpu.numeric import supernodal_device as sd

    A = fixtures.laplacian_3d(8)
    S = analyze_supernodal(A, amd_order(A))
    F0 = sd.factorize_device(A, S)
    plan = S._device_plan
    nss = [getattr(g, "_tile").man.shape[0]
           for gl in plan.groups for g in gl
           if getattr(g, "_tile", None) is not None]
    assert nss, "no tile manifests built — RMIN gate failed to engage"
    # budget below the largest call's map operand => it must chunk
    T = 128
    budget = (max(nss) // 2) * T * 4
    monkeypatch.setenv("SSTPU_TILE_SMEM", str(max(budget, 1)))
    S2 = analyze_supernodal(A, amd_order(A))
    F1 = sd.factorize_device(A, S2)
    assert np.array_equal(F0.lx_host(), F1.lx_host())


def test_solve_dispatch_matches_solve_device(monkeypatch):
    """bench times the solve through solve_dispatch: the (fn, args) it
    returns must compute exactly what solve_device returns, in every mode."""
    from suitesparse_tpu.numeric import supernodal_device, supernodal_solve

    A = fixtures.laplacian_3d(7)
    S = analyze_supernodal(A, amd_order(A))
    F = supernodal_device.factorize_device(A, S)
    b = 1.0 + np.arange(A.ncol) / A.ncol
    for inv, coarse in (("0", "0"), ("1", "0"), ("1", "1")):
        monkeypatch.setenv("SSTPU_SOLVE_INV", inv)
        monkeypatch.setenv("SSTPU_SOLVE_COARSE", coarse)
        S._solve_cache = None
        x = supernodal_solve.solve_device(F, b)
        fn, args = supernodal_solve.solve_dispatch(F, b)
        yz = np.asarray(fn(*args), dtype=np.float64)
        xd = np.empty_like(yz[:S.n])
        xd[S.perm] = yz[:S.n]
        assert np.array_equal(xd[:, 0], x), (inv, coarse)


def test_solve_report_static_accounting():
    from suitesparse_tpu.numeric import supernodal_device, supernodal_solve

    A = fixtures.laplacian_3d(7)
    S = analyze_supernodal(A, amd_order(A))
    supernodal_device.factorize_device(A, S)
    rep = supernodal_solve.solve_report(S)
    assert "fine" in rep and "coarse" in rep
    lines = rep.splitlines()
    fine = int(lines[1].split()[1])
    coarse = int(lines[2].split()[1])
    assert coarse < fine  # the coarse plan must actually cut steps


def test_segment_precompile_bit_identical(monkeypatch):
    """SSTPU_SEG_PRECOMPILE=N AOT-compiles segment programs from a thread
    pool (the n=512k cold-start lever: segment compiles overlap instead of
    serializing at first call). The compiled executables must produce the
    exact factor the lazy jit path produces."""
    monkeypatch.setenv("SSTPU_SEGMENT", "1")
    monkeypatch.setenv("SSTPU_SEG_CELLS", "20000")
    from suitesparse_tpu.numeric import supernodal_device

    A = fixtures.laplacian_3d(8)
    S1 = analyze_supernodal(A, amd_order(A))
    F1 = supernodal_device.factorize_device(A, S1)
    lx_lazy = np.asarray(F1.Lx)

    monkeypatch.setenv("SSTPU_SEG_PRECOMPILE", "3")
    S2 = analyze_supernodal(A, amd_order(A))
    F2 = supernodal_device.factorize_device(A, S2)
    lx_pre = np.asarray(F2.Lx)
    assert np.array_equal(lx_lazy, lx_pre)
    # steady state reuses the precompiled executables
    F3 = supernodal_device.factorize_device(A, S2)
    assert np.array_equal(np.asarray(F3.Lx), lx_pre)


def test_place_strategy_parity(monkeypatch):
    """Extend-add placement strategies (VERDICT r3 item 1: the one-hot
    P@U@P' matmuls are ~27x the useful panel flops at n=125k) must produce
    the same factor as the mm oracle. gather is exact data movement; scan
    adds the same child cells in a different association order, so compare
    to fp32-tight tolerance. laplacian_3d(16) selects 4 gather and 22 scan
    classes under the respective forcing modes (auto is cost-model-gated
    and may legitimately pick all-mm at this size)."""
    from suitesparse_tpu.numeric import supernodal_device

    A = fixtures.laplacian_3d(16)
    b = 1.0 + np.arange(A.ncol) / A.ncol
    results = {}
    chosen = {}
    for mode in ("mm", "gather", "scan", "auto"):
        monkeypatch.setenv("SSTPU_PLACE", mode)
        S = analyze_supernodal(A, amd_order(A))
        F = supernodal_device.factorize_device(A, S)
        results[mode] = np.asarray(F.Lx, dtype=np.float64)
        plan = S._device_plan
        from collections import Counter
        chosen[mode] = Counter(pc.strategy for gl in plan.groups
                               for g in gl for pc in g.pairs)
        from suitesparse_tpu.numeric import supernodal_solve
        x = supernodal_solve.solve_device(F, b)
        assert residual_norm(A, x, b) < 1e-5, mode
    # the forcing modes must actually exercise their strategies
    assert chosen["gather"]["gather"] > 0
    assert chosen["scan"]["scan"] > 0
    ref = results["mm"]
    scale = np.abs(ref).max()
    for mode in ("gather", "scan", "auto"):
        err = np.abs(results[mode] - ref).max()
        assert err <= 1e-5 * scale, (mode, err)
    # gather placement is exact element selection: bit-equal to mm at
    # HIGHEST (each placed cell is a single exact product in both forms)
    assert np.array_equal(results["gather"], ref)
