"""Parity tests for the tiled extend-add Pallas kernel.

The kernel must reproduce the mm-strategy (one-hot matmul) assembly exactly
on every cell a consumer reads: panels bit-comparable, residual unchanged.
Runs in Pallas interpret mode off-TPU (SSTPU_PALLAS=1).
"""
import os

import numpy as np
import pytest

import suitesparse_tpu as sst
from suitesparse_tpu.io import fixtures
from suitesparse_tpu.ordering import nested_dissection_order
from suitesparse_tpu.symbolic.supernodes import analyze_supernodal


def _factor_panels(A, place, monkeypatch, rmin="32", tile_big=None,
                   pair=None):
    from suitesparse_tpu.numeric import supernodal_device as sd
    monkeypatch.setenv("SSTPU_PLACE", place)
    monkeypatch.setenv("SSTPU_TILE_RMIN", rmin)
    if tile_big is not None:
        monkeypatch.setenv("SSTPU_TILE_BIG", tile_big)
    if pair is not None:
        monkeypatch.setenv("SSTPU_TILE_PAIR", pair)
    monkeypatch.setenv("SSTPU_PALLAS", "1")      # interpret off-TPU
    p = nested_dissection_order(A, sst.DEFAULT)
    S = analyze_supernodal(A, p)
    F = sd.factorize_device(A, S, sst.DEFAULT)
    import jax.numpy as jnp
    return S, np.asarray(jnp.asarray(F.Lx), dtype=np.float64), F


@pytest.mark.parametrize("nx,tile_big,pair", [
    (10, None, None), (12, None, None), (12, "48", None),
    (10, None, "1"), (12, None, "1")])
def test_tile_kernel_matches_mm(nx, tile_big, pair, monkeypatch):
    # tile_big="48" forces 256x256 tiles on moderate fronts (T > R partial
    # edge blocks + the big-front manifest variant the TPU default uses
    # at R >= 2048); pair="1" = two pieces per grid step (dead-tail pieces
    # must contribute exact zeros through the -1 one-hot maps)
    A = fixtures.laplacian_3d(nx)
    S1, lx_mm, _ = _factor_panels(A, "mm", monkeypatch)
    S2, lx_tile, _ = _factor_panels(A, "tile", monkeypatch,
                                    tile_big=tile_big, pair=pair)
    # at least one group must actually use the kernel at this RMIN
    ntile = sum(1 for gl in S2._device_plan.groups for g in gl
                if getattr(g, "_tile", None) is not None)
    assert ntile > 0, "no group qualified — test is vacuous"
    assert lx_mm.shape == lx_tile.shape
    # panels must agree to fp32 add-order tolerance (placement is exact
    # selection; only the accumulation order of multiple children differs)
    scale = np.abs(lx_mm).max()
    assert np.allclose(lx_tile, lx_mm, atol=2e-6 * scale, rtol=2e-6)


def test_tile_kernel_residual(monkeypatch):
    A = fixtures.laplacian_3d(10)
    n = A.ncol
    from suitesparse_tpu.numeric import supernodal_solve
    S, _, F = _factor_panels(A, "tile", monkeypatch)
    b = 1.0 + np.arange(n) / n
    x = supernodal_solve.solve_device(F, b, sst.DEFAULT)
    assert sst.residual_norm(A, x, b) < 1e-5


def test_tile_pair_manifest_structure(monkeypatch):
    """Two-piece manifest: each step's pieces share one tile, an odd tail
    rides a dead piece (all-(-1) maps), step count = sum ceil(pieces/2)."""
    from suitesparse_tpu.numeric import supernodal_device as sd
    from suitesparse_tpu.kernels.extend_add_tiles import build_group_manifest
    monkeypatch.setenv("SSTPU_PLACE", "tile")
    monkeypatch.setenv("SSTPU_TILE_RMIN", "32")
    monkeypatch.setenv("SSTPU_TILE_PAIR", "1")
    A = fixtures.laplacian_3d(10)
    p = nested_dissection_order(A, sst.DEFAULT)
    S = analyze_supernodal(A, p)
    C_low = A.symperm(S.perm).transpose()
    plan = sd.build_plan(S, C_low)
    seen = 0
    for gl in plan.groups:
        for g in gl:
            tm = getattr(g, "_tile", None)
            if tm is None:
                continue
            seen += 1
            assert tm.man.shape[1] == 14
            assert tm.rowmap.shape[1] == 2 and tm.colmap.shape[1] == 2
            # same fold set as the plan default (fold-all, frac=0) so the
            # one-piece step count is comparable
            tm1 = build_group_manifest(g, T=128, ru_min_frac=0.0, npiece=1)
            key = (tm1.man[:, 0].astype(np.int64) * 10**8
                   + tm1.man[:, 1] * 10**4 + tm1.man[:, 2])
            _, counts = np.unique(key, return_counts=True)
            assert tm.man.shape[0] == int(np.sum((counts + 1) // 2))
            # dead tail pieces: zero block coords AND all-(-1) maps
            dead = (tm.rowmap[:, 1, :] == -1).all(axis=1)
            assert ((tm.man[:, 9:14] == 0).all(axis=1) >= dead).all() or \
                (tm.man[dead][:, 9:14] == 0).all()
            assert (tm.colmap[dead, 1, :] == -1).all()
            # live second pieces index valid slots/blocks
            live = ~dead
            if live.any():
                assert tm.man[live, 9].max() < tm.nslots
    assert seen > 0


def test_tile_manifest_structure(monkeypatch):
    """Manifest invariants: every lower tile appears exactly once as init,
    steps sorted by (slot, tr, tc), maps in range."""
    from suitesparse_tpu.numeric import supernodal_device as sd
    monkeypatch.setenv("SSTPU_PLACE", "tile")
    monkeypatch.setenv("SSTPU_TILE_RMIN", "32")
    A = fixtures.laplacian_3d(10)
    p = nested_dissection_order(A, sst.DEFAULT)
    S = analyze_supernodal(A, p)
    C_low = A.symperm(S.perm).transpose()
    plan = sd.build_plan(S, C_low)
    seen = 0
    for gl in plan.groups:
        for g in gl:
            tm = getattr(g, "_tile", None)
            if tm is None:
                continue
            seen += 1
            T = tm.rowmap.shape[-1]
            man = tm.man
            nrt = -(-g.R // T)
            keys = man[:, 0] * nrt * nrt + man[:, 1] * nrt + man[:, 2]
            assert (np.diff(keys) >= 0).all(), "steps not sorted by tile"
            # every visited tile is init'd exactly once, on its FIRST row
            # (tiles with no pieces are never visited: the aliased F input
            # preserves their content)
            assert (man[:, 4] == 1).all(), "standalone init rows remain"
            first = np.ones(keys.size, bool)
            first[1:] = keys[1:] != keys[:-1]
            assert np.array_equal(man[:, 3] == 1, first)
            inits = man[man[:, 3] == 1]
            assert (inits[:, 1] >= inits[:, 2]).all()
            # maps within the 2-block window
            assert tm.rowmap.max() < 2 * T and tm.rowmap.min() >= -1
            assert tm.colmap.max() < 2 * T and tm.colmap.min() >= -1
            pieces = man[man[:, 4] == 1]
            if pieces.size:
                assert pieces[:, 5].max() < tm.nslots
                nbr = tm.RUp // T
                assert pieces[:, 6:10].max() < max(nbr, 1)
    assert seen > 0
