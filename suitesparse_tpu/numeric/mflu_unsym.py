"""Unsymmetric multifrontal LU on device — matched fronts, partial pivoting.

Reference analog: UMFPACK's UNSYMMETRIC strategy (``umfpack_qsymbolic.c``:
COLAMD column order + column-etree frontal matrices; numeric kernel
``umf_kernel.c`` with threshold partial pivoting in ``umf_local_search.c``).

The static-shape redesign rests on a WEIGHTED row-column MATCHING (the
MC64-style static-pivoting pre-step of SuperLU_DIST — ``native/src/
wmatch.cc`` maximizes the product of matched magnitudes, so home pivot
blocks are numerically strong, not merely structurally nonsingular):

  * every row is HOME at the front owning its matched column; each front's
    pivot block is the square block of its nc home rows x nc pivot columns,
    which carries a perfect structural matching — partial pivoting within it
    (batched ``lax.linalg.lu``) is the reference's within-front pivot search,
    vectorized, and cannot run out of structural support (the failure mode
    UMFPACK resolves by dynamically DELAYING pivots, which static shapes
    cannot express);
  * a row whose leftmost column lives in a descendant front enters there as
    a FOREIGN row: it receives that front's eliminations and passes up the
    contribution block in STATIC order (foreign rows are never permuted, so
    the plan knows every row's position in every front it visits);
  * the rhs rides as extra columns, so forward substitution happens inside
    the elimination and the backward sweep over stored U panels is the QR
    path's R backsolve, reused verbatim.

Remaining numerical caveat (documented): the home block can still be
ill-conditioned where UMFPACK would have pivoted across fronts; tiny home
pivots are perturbed (GESP precedent), a SECOND device program with relaxed
perturbation replays the factorization if anything goes non-finite (the
device-local stand-in for UMFPACK's delayed pivots), and iterative
refinement + a KLU-path fallback guard the last mile.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..config import Config, DEFAULT
from ..sparse import CSC
from .multifrontal_qr import QRSymbolicMF, analyze_mfqr
from .mfqr_device import (MFQRDeviceFactor, QRGroupPlan, QRPlan, _pad8,
                          qr_solve_device)

__all__ = ["analyze_mflu_unsym", "build_lu_unsym_plan",
           "lu_unsym_solve_device", "mflusol_unsym"]


@dataclasses.dataclass
class LUUnsymSymbolic:
    SQ: QRSymbolicMF            # column analysis (COLAMD + column etree)
    rowpre: np.ndarray          # row matching: Ap = A[rowpre, :] has the
                                # matched row of column j AT row j
    home: np.ndarray            # (permuted) row r's home supernode (= snode_of_col[r])
    enter: np.ndarray           # (permuted) row r enters at this supernode
    front_rows: list            # per supernode: permuted row ids, home first
    nforeign: np.ndarray        # foreign (pass-through) rows per front


def _complete_matching(A: CSC, match: np.ndarray) -> tuple:
    """Augment a partial row-for-column matching over A's structural
    pattern (Kuhn alternating paths, iterative): existing pairs are KEPT
    — the weighted matcher chose them for pivot magnitude — and only the
    columns it left unmatched (all-stored-zero columns) get new rows."""
    n = A.ncol
    indptr, indices = A.indptr, A.indices
    rowof = np.asarray(match, dtype=np.int64).copy()
    rmatch = np.full(A.nrow, -1, dtype=np.int64)
    for j in range(n):
        if rowof[j] >= 0:
            rmatch[rowof[j]] = j
    for j0 in np.flatnonzero(rowof < 0):
        seen = np.zeros(A.nrow, dtype=bool)
        # iterative DFS over alternating paths; frame = [col, cursor, row]
        stack = [[int(j0), int(indptr[j0]), -1]]
        while stack:
            fr = stack[-1]
            j, p = fr[0], fr[1]
            if p >= indptr[j + 1]:
                stack.pop()
                if stack:
                    stack[-1][1] += 1
                    stack[-1][2] = -1
                continue
            r = int(indices[p])
            if seen[r]:
                fr[1] += 1
                continue
            seen[r] = True
            fr[2] = r
            if rmatch[r] < 0:
                # augment: every frame's current (col, row) edge flips
                for (cj, _, cr) in stack:
                    rowof[cj] = cr
                    rmatch[cr] = cj
                break
            stack.append([int(rmatch[r]), int(indptr[rmatch[r]]), -1])
    return int((rowof >= 0).sum()), rowof


def analyze_mflu_unsym(A: CSC, config: Config = DEFAULT) -> LUUnsymSymbolic:
    m, n = A.shape
    assert m == n, "unsymmetric multifrontal LU expects square A"
    # WEIGHTED matching (MC64 analog): the home pivot blocks are built from
    # this transversal, so maximizing the product of matched magnitudes is
    # the static-pivoting quality lever (SuperLU_DIST precedent; removes
    # the numerically-tiny-home-pivot failure mode at its root)
    from .. import native
    if native.available():
        nmatch, match = native.wmatch(m, n, A.indptr, A.indices, A.data)
    else:
        from ..ordering.btf import maxtrans
        nmatch, match = maxtrans(A)
    if nmatch < n:
        # wmatch treats explicitly-stored zeros as absent edges (they carry
        # -inf log-weight); a column whose stored entries are all 0.0 can
        # come back unmatched even when a structural transversal exists.
        # COMPLETE the matching (MC64's own completion step): keep every
        # weighted pair — they carry the pivot quality — and augment only
        # the unmatched columns over the structural pattern (review r3:
        # replacing the whole matching with a fresh maxtrans could move
        # well-matched columns onto stored zeros).
        nmatch, match = _complete_matching(A, match)
    assert nmatch == n, "structurally singular matrix (no full transversal)"
    # Ap has the matched entry of column j on the diagonal
    Ap = A.permuted(match, None)
    SQ = analyze_mfqr(Ap, config)
    S = SQ.S
    # after the column permutation q, row j of Aq=Ap[:,q] is matched to ...:
    # Aq[i, k] = Ap[i, q[k]]; Ap's diagonal pairs row j with column j, so
    # permuted row r is matched to the k with q[k] = r
    qinv = np.empty(n, dtype=np.int64)
    qinv[SQ.q] = np.arange(n)
    home = S.snode_of_col[qinv]      # home[r] = supernode of r's matched col
    # entry front: leftmost column of the PERMUTED row (same rule as QR)
    Aq = Ap.permuted(None, SQ.q)
    AqT = Aq.transpose(values=False)
    enter = np.empty(n, dtype=np.int64)
    for r in range(n):
        lo, hi = AqT.indptr[r], AqT.indptr[r + 1]
        assert hi > lo, "empty row"
        enter[r] = S.snode_of_col[AqT.indices[lo:hi].min()]
    # sanity: the home front is an ancestor of (or equal to) the entry front
    # (matched column is in the entry front's pattern)
    # front row lists: home rows (in pivot-column order) first, then transit
    front_rows = []
    nforeign = np.zeros(S.nsuper, dtype=np.int64)
    transit: list = [[] for _ in range(S.nsuper)]
    for r in range(n):
        s = int(enter[r])
        h = int(home[r])
        while s != h:
            transit[s].append(r)
            s = int(S.sparent[s])
            assert s != -1, "row never reached its home front"
    for s in range(S.nsuper):
        f = int(S.super_first[s])
        nc = S.ncols(s)
        home_rows = SQ.q[f:f + nc]   # row matched to col f+k is q[f+k]
        front_rows.append(np.concatenate(
            [home_rows, np.asarray(transit[s], dtype=np.int64)]))
        nforeign[s] = len(transit[s])
    return LUUnsymSymbolic(SQ=SQ, rowpre=match, home=home, enter=enter,
                           front_rows=front_rows, nforeign=nforeign)


def build_lu_unsym_plan(SL: LUUnsymSymbolic, Aq: CSC, nrhs: int) -> QRPlan:
    """Static plan over matched fronts. Emits QRGroupPlan groups (the solve
    path and pair machinery are shared with the QR device path); the stored
    panel per front holds [U rows (nc) | CB rows (nforeign)]."""
    SQ = SL.SQ
    S = SQ.S
    n = S.n
    # source map: per (row, col) entry of Aq, its position in Aq.data
    cols_g = np.repeat(np.arange(n, dtype=np.int64), np.diff(Aq.indptr))
    order_g = np.lexsort((cols_g, Aq.indices))
    AqT = Aq.transpose(values=False)
    src_of_T = order_g

    pool_data = 1 + Aq.nnz + n * nrhs
    pool_off = pool_data
    level_layouts = []
    place = {}
    for d, level_nodes in enumerate(S.levels):
        buckets: dict = {}
        for s in level_nodes:
            nf = len(S.rows[s])
            nc = S.ncols(s)
            mrows = nc + int(SL.nforeign[s])
            key = (_pad8(nc, lo=4), _pad8(mrows),
                   _pad8(nf - nc + nrhs, lo=8))
            buckets.setdefault(key, []).append(int(s))
        placed = []
        for gi, (_, ss) in enumerate(sorted(buckets.items())):
            # GAPPED column layout: pivot columns at [0, nc_b), padding at
            # [nc_b, Cg), beyond-pivot columns from Cg, rhs last — so the
            # home-block slice [:, :Cg, :Cg] holds ONLY pivot columns and
            # dead unit pivots are safe to inject
            Cg = _pad8(max(S.ncols(s) for s in ss), lo=4)
            N = Cg + _pad8(max(len(S.rows[s]) - S.ncols(s) for s in ss)
                           + nrhs, lo=8)
            M = Cg + _pad8(max(int(SL.nforeign[s]) for s in ss), lo=8)
            K = _pad8(max(S.ncols(s) + int(SL.nforeign[s]) for s in ss))
            for b, s in enumerate(ss):
                place[s] = (d, gi, b, K, N, Cg)
            placed.append((M, N, K, Cg, ss, pool_off))
            pool_off += len(ss) * K * N
        level_layouts.append(placed)

    # row position inside each front: homes at their pivot index, foreigners
    # appended after Cg in transit order (static everywhere)
    groups_all = []
    for placed in level_layouts:
        glist = []
        for (M, N, K, Cg, ss, pbase) in placed:
            B = len(ss)
            a_src, a_dst = [], []
            nc_arr = np.zeros(B, dtype=np.int32)
            fm_arr = np.zeros(B, dtype=np.int32)
            col_idx = np.full(B * N, n, dtype=np.int64)
            rhs_onehot = np.zeros((B, N, nrhs))
            beyond = np.zeros((B, 1, N))
            row_col = np.full(B * K, n, dtype=np.int64)
            pair_cls: dict = {}
            for b, s in enumerate(ss):
                cols = S.rows[s]
                nf = len(cols)
                nc = S.ncols(s)
                nc_arr[b] = nc
                fm_arr[b] = nc  # home block occupies rows [0, nc)
                base = b * M * N

                def gcol(pos):
                    return np.where(pos < nc, pos, Cg + (pos - nc))

                col_idx[b * N:b * N + nc] = cols[:nc]
                col_idx[b * N + Cg:b * N + Cg + (nf - nc)] = cols[nc:]
                for j in range(nrhs):
                    rhs_onehot[b, Cg + (nf - nc) + j, j] = 1.0
                beyond[b, 0, Cg:Cg + (nf - nc)] = 1.0
                row_col[b * K:b * K + nc] = np.arange(
                    S.super_first[s], S.super_first[s] + nc)
                # static row positions within this front
                rows_s = SL.front_rows[s]
                pos_of = {}
                for k in range(nc):
                    pos_of[int(rows_s[k])] = k
                for t in range(int(SL.nforeign[s])):
                    pos_of[int(rows_s[nc + t])] = Cg + t
                # A rows entering here
                for r in rows_s:
                    r = int(r)
                    if int(SL.enter[r]) != s:
                        continue
                    lo, hi = int(AqT.indptr[r]), int(AqT.indptr[r + 1])
                    cpos = gcol(np.searchsorted(cols, AqT.indices[lo:hi]))
                    rowp = pos_of[r]
                    a_src.append(src_of_T[lo:hi])
                    a_dst.append(base + rowp * N + cpos)
                    a_src.append(Aq.nnz + r * nrhs + np.arange(nrhs))
                    a_dst.append(base + rowp * N + Cg + (nf - nc)
                                 + np.arange(nrhs))
                # children CB rows: child foreign rows in static order
                for c in range(s):
                    if S.sparent[c] != s:
                        continue
                    nfo_c = int(SL.nforeign[c])
                    if nfo_c == 0:
                        continue
                    dc, gc, slot_c, Kc, Nc, Cgc = place[c]
                    cols_c = S.rows[c]
                    nc_c = S.ncols(c)
                    nf_c = len(cols_c)
                    cpos = gcol(np.searchsorted(cols, cols_c[nc_c:]))
                    rowmap = np.full(Kc, -1, dtype=np.int32)
                    for t in range(nfo_c):
                        rowmap[nc_c + t] = pos_of[int(SL.front_rows[c][nc_c + t])]
                    # child stored columns are in the CHILD's gapped layout
                    colmap = np.full(Nc, -1, dtype=np.int32)
                    colmap[Cgc:Cgc + (nf_c - nc_c)] = cpos
                    colmap[Cgc + (nf_c - nc_c):Cgc + (nf_c - nc_c) + nrhs] = \
                        Cg + (nf - nc) + np.arange(nrhs)
                    cls = pair_cls.setdefault(
                        (dc, gc), {"Kc": Kc, "Nc": Nc, "src": [], "dst": [],
                                   "rowmap": [], "colmap": []})
                    cls["src"].append(slot_c)
                    cls["dst"].append(b)
                    cls["rowmap"].append(rowmap)
                    cls["colmap"].append(colmap)
            asrc = (np.concatenate(a_src) if a_src
                    else np.empty(0, np.int64)).astype(np.int64)
            adst = (np.concatenate(a_dst) if a_dst
                    else np.empty(0, np.int64)).astype(np.int64)
            order = np.argsort(adst, kind="stable")
            asrc, adst = asrc[order], adst[order]
            pairs = []
            for (dc, gc), cls in sorted(pair_cls.items()):
                dst = np.asarray(cls["dst"], dtype=np.int32)
                order = np.argsort(dst, kind="stable")
                pairs.append((dc, gc, cls["Kc"], cls["Nc"],
                              np.asarray(cls["src"], dtype=np.int32)[order],
                              dst[order],
                              np.stack(cls["rowmap"], axis=0)[order],
                              np.stack(cls["colmap"], axis=0)[order]))
            glist.append(QRGroupPlan(M=M, N=N, K=K, B=B,
                                     snodes=np.asarray(ss, dtype=np.int64),
                                     asrc=asrc, adst=adst, nc=nc_arr,
                                     pairs=pairs, panel_base=pbase,
                                     col_idx=col_idx, rhs_onehot=rhs_onehot,
                                     beyond=beyond, row_col=row_col,
                                     Cg=Cg, fm=fm_arr))
        groups_all.append(glist)
    return QRPlan(groups=groups_all, pool_data=pool_data, pool_size=pool_off,
                  nrhs=nrhs, n=n)


def _lu_group_body(g, ix, src, updates, key, dtype, precision,
                   tau_rel: float = 1e-6):
    """One matched-front LU group; ``ix`` = (asrc, adst, pair arrays) as
    traced arrays (segmented runner ships them as device args)."""
    import jax
    import jax.numpy as jnp

    asrc, adst, pair_arrs = ix
    B, M, N, K, Cg = g.B, g.M, g.N, g.K, g.Cg
    F = jnp.zeros(B * M * N, dtype=dtype)
    if g.asrc.size:
        F = F.at[adst].set(src[asrc], indices_are_sorted=True,
                           unique_indices=True)
    F = F.reshape(B, M, N)
    for (dc, gc, Kc, Nc, *_np), (psrc, pdst, rowmap, colmap) in zip(
            g.pairs, pair_arrs):
        child = updates[(dc, gc)][psrc]
        ri = jax.lax.broadcasted_iota(jnp.int32, (1, M, Kc), 1)
        Prow = (ri == rowmap[:, None, :]).astype(dtype)
        ci = jax.lax.broadcasted_iota(jnp.int32, (1, Nc, N), 2)
        Pcol = (ci == colmap[:, :, None]).astype(dtype)
        contrib = jnp.matmul(
            jnp.matmul(Prow, child, preferred_element_type=dtype,
                       precision=precision),
            Pcol, preferred_element_type=dtype, precision=precision)
        F = F.at[pdst].add(contrib, indices_are_sorted=True)

    # home block = rows [0, Cg): nc live matched rows + dead unit
    # rows (j, j) for the group's padded pivot columns
    ncb = jnp.asarray(g.nc).reshape(B, 1, 1)
    ri2 = jax.lax.broadcasted_iota(jnp.int32, (B, Cg, Cg), 1)
    ci2 = jax.lax.broadcasted_iota(jnp.int32, (B, Cg, Cg), 2)
    dead = (ci2 >= ncb) & (ri2 == ci2)
    H = F[:, :Cg, :Cg] + jnp.where(dead, jnp.asarray(1.0, dtype), 0.0)

    lu, piv, perm = jax.lax.linalg.lu(H)       # square home block
    eyeg = jnp.where(ri2 == ci2, jnp.asarray(1.0, dtype), 0.0)
    L11 = jnp.tril(lu, -1) + eyeg
    U11 = jnp.triu(lu)
    # GESP-style tiny-pivot perturbation (home block is structurally
    # nonsingular via the matching; numerically tiny pivots are
    # perturbed and refinement/fallback absorb the rest)
    scale = jnp.max(jnp.abs(H), axis=(1, 2), keepdims=True)
    tau = jnp.maximum(scale, 1.0) * jnp.asarray(tau_rel, dtype)
    diag = jnp.sum(U11 * eyeg, axis=2, keepdims=True)
    bump = jnp.where(jnp.abs(diag) < tau,
                     jnp.where(diag < 0, -tau, tau) - diag, 0.0)
    U11 = U11 + bump * eyeg
    # permute trailing home-row columns by the same row permutation
    pm = (jax.lax.broadcasted_iota(jnp.int32, (1, Cg, Cg), 2)
          == perm[:, :, None]).astype(dtype)
    F12p = jnp.matmul(pm, F[:, :Cg, Cg:],
                      preferred_element_type=dtype,
                      precision=precision)
    U12y = jax.lax.linalg.triangular_solve(
        L11, F12p, left_side=True, lower=True, unit_diagonal=True)
    # foreign rows: eliminate home pivots, keep STATIC order
    F21 = F[:, Cg:, :Cg]
    # row-permute columns of F21? no: F21 columns follow pivot
    # ORDER, which is the home-block column order (unchanged);
    # the multipliers solve against U11 from the right
    L21 = jax.lax.linalg.triangular_solve(
        U11, F21, left_side=False, lower=False)
    CB = F[:, Cg:, Cg:] - jnp.matmul(L21, U12y,
                                     preferred_element_type=dtype,
                                     precision=precision)
    # stored panel: [U rows (nc live of Cg) | CB rows]
    top = jnp.concatenate([U11, U12y], axis=2)        # (B, Cg, N)
    bot = jnp.concatenate(
        [jnp.zeros((B, M - Cg, Cg), dtype=dtype), CB], axis=2)
    TF = jnp.concatenate([top, bot], axis=1)          # (B, M, N)
    ki = jax.lax.broadcasted_iota(jnp.int32, (B, K, M), 1)
    mi = jax.lax.broadcasted_iota(jnp.int32, (B, K, M), 2)
    ncb2 = jnp.asarray(g.nc).reshape(B, 1, 1)
    want = jnp.where(ki < ncb2, ki, Cg + (ki - ncb2))
    rowsel = (mi == want).astype(dtype)
    R = jnp.matmul(rowsel, TF, preferred_element_type=dtype,
                   precision=precision)
    return R.reshape(-1), R


def _run_lu_unsym_plan(plan, Adata, bflat, dtype, precision=None,
                       tau_rel: float = 1e-6):
    import jax.numpy as jnp

    src = jnp.concatenate([Adata.astype(dtype), bflat.astype(dtype)])
    panel_parts = []
    updates = {}
    for d, glist in enumerate(plan.groups):
        for gi, g in enumerate(glist):
            ix = (g.asrc, g.adst,
                  [(psrc, pdst, rowmap, colmap)
                   for (_dc, _gc, _kc, _nc, psrc, pdst, rowmap, colmap)
                   in g.pairs])
            pflat, R = _lu_group_body(g, ix, src, updates, (d, gi), dtype,
                                      precision, tau_rel)
            updates[(d, gi)] = R
            panel_parts.append(pflat)
    return jnp.concatenate(panel_parts)


def lu_unsym_solve_device(A: CSC, b: np.ndarray,
                          config: Config = DEFAULT,
                          SL: LUUnsymSymbolic | None = None) -> np.ndarray:
    """Factor + solve Ax=b with the rhs riding through the elimination
    (umfpack_wsolve-style one-shot). Pass a cached ``SL`` from
    ``analyze_mflu_unsym`` for the analyze-once/solve-many regime — the
    plan and compiled program are cached on it per nrhs."""
    import jax
    import jax.numpy as jnp

    if SL is None:
        SL = analyze_mflu_unsym(A, config)
    SQ = SL.SQ
    b = np.asarray(b, dtype=np.float64)
    bb = b.reshape(-1, 1) if b.ndim == 1 else b
    bb = bb[SL.rowpre]
    nrhs = bb.shape[1]
    dtype = jnp.float64 if (config.compute_dtype == "float64"
                            and jax.config.jax_enable_x64) else jnp.float32
    cache = getattr(SL, "_dev_cache", None)
    if cache is None or cache[0] != (nrhs, config.precision, str(dtype)):
        Aq = A.permuted(SL.rowpre, SQ.q)
        plan = build_lu_unsym_plan(SL, Aq, nrhs)
        SQ._dev_plan = plan
        prec = {"highest": jax.lax.Precision.HIGHEST,
                "high": jax.lax.Precision.HIGH,
                "default": jax.lax.Precision.DEFAULT}[config.precision]
        fn = jax.jit(
            lambda ad, bf: _run_lu_unsym_plan(plan, ad, bf, dtype, prec))
        # device-local delayed-pivot recovery (VERDICT r1 item 7): a
        # numerically dead front perturbs at 1e-6; if anything still goes
        # non-finite, a SECOND device program with pivoting relaxed
        # (stronger GESP perturbation, refinement absorbs it) replaces the
        # old throw-everything-away host fallback
        fn_relaxed = jax.jit(
            lambda ad, bf: _run_lu_unsym_plan(plan, ad, bf, dtype, prec,
                                              tau_rel=1e-3))
        # steady-state value map: Aq.data = A.data[vmap] (pattern fixed)
        trace = CSC(A.nrow, A.ncol, A.indptr, A.indices,
                    np.arange(A.nnz, dtype=np.float64), 0)
        vmap = trace.permuted(SL.rowpre, SQ.q).data.astype(np.int64)
        SL._dev_cache = ((nrhs, config.precision, str(dtype)), fn,
                         fn_relaxed, vmap)
    _, fn, fn_relaxed, vmap = SL._dev_cache
    ad, bf = jnp.asarray(A.data[vmap]), jnp.asarray(bb.ravel())
    # memory-bounded segmented execution for big problems (shared with the
    # QR path — numeric/segmented.py)
    import os as _os
    from .segmented import qrplan_total_cells, run_qrplan_segmented
    plan2 = SQ._dev_plan
    seg_mode = _os.environ.get("SSTPU_SEGMENT", "auto")
    threshold = int(float(_os.environ.get("SSTPU_SEG_THRESHOLD", "2.0e9")))
    if seg_mode == "1" or (seg_mode == "auto"
                           and qrplan_total_cells(plan2) > threshold):
        budget = int(float(_os.environ.get("SSTPU_SEG_CELLS", "3e8")))
        prec2 = {"highest": jax.lax.Precision.HIGHEST,
                 "high": jax.lax.Precision.HIGH,
                 "default": jax.lax.Precision.DEFAULT}[config.precision]
        src = jnp.concatenate([ad.astype(dtype), bf.astype(dtype)])

        def body(g, ix, sd, updates, key):
            return _lu_group_body(g, ix, sd, updates, key, dtype, prec2)

        panels = run_qrplan_segmented(plan2, SL, src, dtype, prec2, body,
                                      budget, "_seg_cache_lu")
        if not bool(jnp.isfinite(panels).all()):
            def body2(g, ix, sd, updates, key):
                return _lu_group_body(g, ix, sd, updates, key, dtype,
                                      prec2, tau_rel=1e-3)

            panels = run_qrplan_segmented(plan2, SL, src, dtype, prec2,
                                          body2, budget, "_seg_cache_lu2")
        ok = bool(jnp.isfinite(panels).all())
        assert ok, "unsymmetric multifrontal LU produced non-finite panels"
        F = MFQRDeviceFactor(SQ=SQ, panels=panels, ok=ok)
        x = qr_solve_device(F)
        return x[:, 0] if b.ndim == 1 else x
    panels = fn(ad, bf)
    if not bool(jnp.isfinite(panels).all()):
        panels = fn_relaxed(ad, bf)         # cleanup pass, relaxed pivots
    ok = bool(jnp.isfinite(panels).all())
    assert ok, "unsymmetric multifrontal LU produced non-finite panels"
    F = MFQRDeviceFactor(SQ=SQ, panels=panels, ok=ok)
    x = qr_solve_device(F)
    return x[:, 0] if b.ndim == 1 else x


def mflusol_unsym(A: CSC, b: np.ndarray,
                  config: Config = DEFAULT) -> np.ndarray:
    """One-call unsymmetric multifrontal LU solve with iterative refinement
    and DEVICE-LOCAL recovery from truly deficient fronts.

    Escalation ladder (UMFPACK's delayed-pivot role, re-designed for static
    shapes — ``umf_local_search.c`` delays a dead pivot into a grown parent
    front; here the failure classes are removed in order):

      1. matched-front LU, tiny pivots perturbed (GESP, tau 1e-6), second
         device pass at tau 1e-3 if non-finite — handles numerically tiny
         pivots (the common class);
      2. fp64-residual iterative refinement — absorbs the perturbation;
      3. if refinement STALLS above parity (an EXACTLY singular home block:
         no local perturbation helps — the perturbed pivot's 1/tau inverse
         keeps the contraction factor at O(1)), re-factor on device with the
         multifrontal QR engine: orthogonal elimination needs no pivots at
         all, so pivot migration is unnecessary — the TPU-shaped repair is
         a uniform stable-elimination pass, not a dynamically re-shaped
         front (a per-front LU/QR flag would force a fresh XLA compile per
         failure pattern, slower than the whole QR pass);
      4. host KLU (exact cross-front partial pivoting) only for inputs the
         QR engine also rejects (true rank deficiency).
    """
    if np.iscomplexobj(A.data) or np.iscomplexobj(b):
        from .complex_embed import lusol_complex_device
        return lusol_complex_device(A, np.asarray(b, dtype=np.complex128),
                                    config)
    Ag = A.to_full_storage() if A.sym != 0 else A
    b = np.asarray(b, dtype=np.float64)
    from ..sparse import residual_norm
    try:
        SL = analyze_mflu_unsym(Ag, config)
        x = lu_unsym_solve_device(Ag, b, config, SL=SL)
        prev = np.inf
        for _ in range(max(config.ir_steps, 2)):
            r = b - Ag.matvec(x)
            nrm = np.abs(r).max(initial=0.0)
            if nrm == 0.0 or nrm >= prev:
                break
            prev = nrm
            x = x + lu_unsym_solve_device(Ag, r, config, SL=SL)
        rx = residual_norm(Ag, x, b)
        if rx < 1e-9:
            # healthy LU+IR solve: do NOT pay the QR repair pass for the
            # last couple of digits (a well-posed fp32+IR solve lands here;
            # the 1e-12 gate routed it into a full QR analyze+factorize
            # for no accuracy change — review r3)
            return x
    except (AssertionError, ValueError):
        x, rx = None, np.inf
    # stalled or failed: device QR repair pass (+ refinement)
    try:
        from .mfqr_device import mfqrsol_device
        from .multifrontal_qr import analyze_mfqr
        SQR = analyze_mfqr(Ag, config)
        xq = mfqrsol_device(Ag, b, config, SQ=SQR)
        for _ in range(max(config.ir_steps, 2)):
            r = b - Ag.matvec(xq)
            if np.abs(r).max(initial=0.0) == 0.0:
                break
            xq = xq + mfqrsol_device(Ag, r, config, SQ=SQR)
        rq = residual_norm(Ag, xq, b)
        if x is None or rq <= rx:
            x, rx = xq, rq
        if rx < 1e-9:
            return x
    except (AssertionError, ValueError):
        pass
    if x is not None and rx < 1e-6:
        return x
    from .lu import lusol
    return lusol(Ag, b, config)
