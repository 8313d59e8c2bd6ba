"""Device (XLA/TPU) multifrontal LU: level-batched two-panel fronts with
WITHIN-FRONT partial pivoting.

Extends the gather-first Cholesky machinery (supernodal_device) to the
UMFPACK-class LU of :mod:`.multifrontal_lu`: each front carries an L panel
(lower trapezoid, columns of the front) and a U^T panel (lower trapezoid,
rows of the front transposed), plus a full square update matrix. The dense
diagonal block is factored with ``lax.linalg.lu`` — batched partial pivoting
WITHIN the fully-summed block, which is numerically stronger than the host
oracle's static diagonal pivoting and is exactly the freedom the multifrontal
method allows (fully-summed rows may be permuted front-locally).

Front layout per bucket (R, C), normalized as in the Cholesky path:
  Lpanel  [B, R, C]:  rows 0..nc = F11 (lower+diag), rows C.. = F21
  Utpanel [B, R, C]:  Ut[i,k] = F[k,i]  (upper triangle of F11 + F12, stored
                      transposed so it is ALSO a lower trapezoid)
  f22     [B, RU, RU] full square update matrix

Pivot permutations are returned per supernode and folded into the global row
permutation by the solve.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from ..config import Config, DEFAULT
from ..sparse import CSC
from ..symbolic.supernodes import SupernodalSymbolic
from .supernodal_device import _pad_to, _R_LADDER, _C_LADDER, _ranges

__all__ = ["factorize_lu_device", "MFLUDeviceFactor", "solve_mflu_device"]


@dataclasses.dataclass
class LUGroupPlan:
    R: int
    C: int
    B: int
    snodes: np.ndarray
    lmap: np.ndarray       # [B*R*C] gather into pool for the L panel
    umap: np.ndarray       # [B*R*C] gather into pool for the U^T panel
    fmap: np.ndarray       # [B*RU*RU] gather into pool for f22
    lleft_src: np.ndarray  # rank>=2 leftovers (scatter-add)
    lleft_dst: np.ndarray
    uleft_src: np.ndarray
    uleft_dst: np.ndarray
    fleft_src: np.ndarray
    fleft_dst: np.ndarray
    nc: np.ndarray
    panel_base: int
    heap_base: int


@dataclasses.dataclass
class LUPlan:
    groups: list
    dev_size: int
    heap_size: int
    n: int


@dataclasses.dataclass
class MFLUDeviceFactor:
    S: SupernodalSymbolic
    Lpanels: np.ndarray    # device array, padded group layout
    Utpanels: np.ndarray
    perms: np.ndarray      # [sum B*C] per-supernode pivot perms (local)
    minor: int

    @property
    def ok(self) -> bool:
        return self.minor == self.S.n


def build_lu_plan(S: SupernodalSymbolic, Cg: CSC, CgT: CSC) -> LUPlan:
    """Index plans; ``Cg`` = general permuted matrix, ``CgT`` its transpose."""
    children: list = [[] for _ in range(S.nsuper)]
    for s in range(S.nsuper):
        if S.sparent[s] != -1:
            children[S.sparent[s]].append(s)

    level_layouts = []
    place = {}
    panel_off = 0
    heap_off = 1 + Cg.nnz  # pool = [sentinel | Cg.data | level update buffers]
    for level_nodes in S.levels:
        buckets: dict = {}
        for s in level_nodes:
            nr, nc = S.nrows(s), S.ncols(s)
            key = (_pad_to(nr - nc, _R_LADDER) + _pad_to(nc, _C_LADDER),
                   _pad_to(nc, _C_LADDER))
            buckets.setdefault(key, []).append(int(s))
        placed = []
        for (R, C), ss in sorted(buckets.items()):
            maxnc = max(S.ncols(s) for s in ss)
            maxru = max(S.nrows(s) - S.ncols(s) for s in ss)
            C = max(8 * ((maxnc + 7) // 8), 4)
            R = C + 8 * ((maxru + 7) // 8)
            RU = R - C
            for b, s in enumerate(ss):
                place[s] = (heap_off + b * RU * RU, RU)
            placed.append((R, C, ss, panel_off, heap_off))
            panel_off += len(ss) * R * C
            heap_off += len(ss) * RU * RU
        level_layouts.append(placed)

    # CgT entries index into the pool as 1 + position of the SAME entry in Cg:
    # build the mapping CgT data order -> Cg data order
    # (transpose is a permutation of the entry set)
    cols_g = np.repeat(np.arange(Cg.ncol, dtype=np.int64), np.diff(Cg.indptr))
    order_g = np.lexsort((cols_g, Cg.indices))   # sort by (row, col)
    colsT = np.repeat(np.arange(CgT.ncol, dtype=np.int64), np.diff(CgT.indptr))
    # CgT entry t is (row=CgT.indices[t], col=colsT[t]) in A-space =
    # (A-row colsT? ) CgT[r,c] = Cg[c,r]: entry t of CgT corresponds to Cg
    # entry at (row=CgT.indices[t], col=colsT[t]) swapped
    order_t = np.lexsort((CgT.indices, colsT))   # sort CgT entries by (col,row)
    # Cg sorted by (row, col) == CgT sorted by (colT=row, rowT=col)
    t2g = np.empty(CgT.nnz, dtype=np.int64)
    t2g[order_t] = order_g

    groups_all = []
    for placed in level_layouts:
        gplans = []
        for (R, C, ss, pbase, hbase) in placed:
            gplans.append(_build_lu_group(S, Cg, CgT, t2g, ss, R, C, place,
                                          children, pbase, hbase))
        groups_all.append(gplans)
    return LUPlan(groups=groups_all, dev_size=panel_off, heap_size=heap_off,
                  n=S.n)


def _build_lu_group(S, Cg, CgT, t2g, ss, R, C, place, children, pbase, hbase):
    B = len(ss)
    RU = R - C
    lp_src, lp_dst = [], []
    up_src, up_dst = [], []
    f_src, f_dst = [], []
    nc_arr = np.zeros(B, dtype=np.int32)

    for b, s in enumerate(ss):
        rows = S.rows[s]
        nr = len(rows)
        f, l = int(S.super_first[s]), int(S.super_first[s + 1])
        nc = l - f
        nc_arr[b] = nc
        base = b * R * C

        def lrow(pos):
            return np.where(pos < nc, pos, C + (pos - nc))

        # column side: all entries of supernode columns with row in pattern
        lo, hi = int(Cg.indptr[f]), int(Cg.indptr[l])
        ents = np.diff(Cg.indptr[f:l + 1])
        colk = np.repeat(np.arange(nc, dtype=np.int64), ents)
        rr = Cg.indices[lo:hi]
        keep = rr >= f
        pos = np.searchsorted(rows, rr[keep])
        src = np.arange(lo, hi, dtype=np.int64)[keep] + 1
        kk = colk[keep]
        lower = pos >= kk
        lp_src.append(src[lower])
        lp_dst.append(base + lrow(pos[lower]) * C + kk[lower])
        up = ~lower  # F11 upper: F[pos, kk] pos<kk -> Ut[kk, pos]
        up_src.append(src[up])
        up_dst.append(base + lrow(kk[up]) * C + pos[up])

        # row side: entries (j=f+k, c) with c beyond the supernode
        loT, hiT = int(CgT.indptr[f]), int(CgT.indptr[l])
        entsT = np.diff(CgT.indptr[f:l + 1])
        rowk = np.repeat(np.arange(nc, dtype=np.int64), entsT)
        cc = CgT.indices[loT:hiT]
        posc = np.searchsorted(rows, cc)
        keep2 = (posc >= nc) & (posc < nr) & (rows[np.minimum(posc, nr - 1)]
                                              == cc)
        srcT = t2g[np.arange(loT, hiT, dtype=np.int64)[keep2]] + 1
        up_src.append(srcT)
        up_dst.append(base + lrow(posc[keep2]) * C + rowk[keep2])

        # extend-add from children (full square updates)
        for ch in children[s]:
            mu = S.nrows(ch) - S.ncols(ch)
            if mu == 0:
                continue
            ho, RU_c = place[ch]
            rows_c = S.rows[ch][S.ncols(ch):]
            idx = np.searchsorted(rows, rows_c)
            ri = np.broadcast_to(idx[:, None], (mu, mu))
            cj = np.broadcast_to(idx[None, :], (mu, mu))
            srcm = ho + np.arange(mu)[:, None] * RU_c + np.arange(mu)
            mL = (cj < nc) & (ri >= cj)
            mU = (cj < nc) & (ri < cj) | (cj >= nc) & (ri < nc)
            mF = (cj >= nc) & (ri >= nc)
            if mL.any():
                lp_src.append(srcm[mL])
                lp_dst.append(base + lrow(ri[mL]) * C + cj[mL])
            if mU.any():
                # F[ri, cj] -> Ut[cj, ri] (requires ri < nc here)
                up_src.append(srcm[mU])
                up_dst.append(base + lrow(cj[mU]) * C + ri[mU])
            if mF.any():
                f_src.append(srcm[mF])
                f_dst.append(b * RU * RU + (ri[mF] - nc) * RU + (cj[mF] - nc))

    def rank_split(srcs, dsts, ncells):
        dense = np.zeros(ncells, dtype=np.int64)
        if not srcs:
            return dense, np.empty(0, np.int64), np.empty(0, np.int64)
        src = np.concatenate(srcs)
        dst = np.concatenate(dsts)
        order = np.argsort(dst, kind="stable")
        src, dst = src[order], dst[order]
        first = np.ones(dst.size, dtype=bool)
        first[1:] = dst[1:] != dst[:-1]
        dense[dst[first]] = src[first]
        rest = ~first
        return dense, src[rest], dst[rest]

    lmap, lls, lld = rank_split(lp_src, lp_dst, B * R * C)
    umap, uls, uld = rank_split(up_src, up_dst, B * R * C)
    fmap, fls, fld = rank_split(f_src, f_dst, B * max(RU, 1) * max(RU, 1))
    return LUGroupPlan(R=R, C=C, B=B, snodes=np.asarray(ss, dtype=np.int64),
                      lmap=lmap, umap=umap, fmap=fmap,
                      lleft_src=lls, lleft_dst=lld,
                      uleft_src=uls, uleft_dst=uld,
                      fleft_src=fls, fleft_dst=fld,
                      nc=nc_arr, panel_base=pbase, heap_base=hbase)


def _run_lu_plan(plan: LUPlan, Cdata, dtype):
    import jax
    import jax.numpy as jnp

    pool = jnp.concatenate([jnp.zeros(1, dtype=dtype), Cdata.astype(dtype)])
    Lpanels, Utpanels, perms = [], [], []
    for glist in plan.groups:
        updates = []
        for g in glist:
            B, R, C = g.B, g.R, g.C
            RU = R - C
            lp = pool[g.lmap]
            if g.lleft_src.size:
                lp = lp.at[g.lleft_dst].add(pool[g.lleft_src])
            ut = pool[g.umap]
            if g.uleft_src.size:
                ut = ut.at[g.uleft_dst].add(pool[g.uleft_src])
            lp = lp.reshape(B, R, C)
            ut = ut.reshape(B, R, C)
            if RU > 0:
                f22 = pool[g.fmap]
                if g.fleft_src.size:
                    f22 = f22.at[g.fleft_dst].add(pool[g.fleft_src])
                f22 = f22.reshape(B, RU, RU)

            F11 = (jnp.tril(lp[:, :C, :])
                   + jnp.swapaxes(jnp.tril(ut[:, :C, :], -1), 1, 2))
            ridx = jax.lax.broadcasted_iota(jnp.int32, (B, C, C), 1)
            cidx = jax.lax.broadcasted_iota(jnp.int32, (B, C, C), 2)
            ncb = g.nc.reshape(B, 1, 1)
            live = (ridx < ncb) & (cidx < ncb)
            eye = jnp.where(ridx == cidx, jnp.asarray(1.0, dtype), 0.0)
            F11m = jnp.where(live, F11, eye)
            lu, piv, perm = jax.lax.linalg.lu(F11m)
            L11 = jnp.where(live, jnp.tril(lu, -1), 0.0) + eye
            U11 = jnp.where(live, jnp.triu(lu), eye)
            perms.append(perm.reshape(-1))
            if RU > 0:
                F21 = lp[:, C:, :]
                L21 = jax.lax.linalg.triangular_solve(
                    U11, F21, left_side=False, lower=False)
                F12 = jnp.swapaxes(ut[:, C:, :], 1, 2)  # [B, C, RU]
                F12p = jnp.take_along_axis(F12, perm[:, :, None], axis=1)
                U12 = jax.lax.linalg.triangular_solve(
                    L11, F12p, left_side=True, lower=True, unit_diagonal=True)
                U = f22 - jnp.matmul(L21, U12, preferred_element_type=dtype)
                lp_out = jnp.concatenate([jnp.where(live, L11, 0.0), L21],
                                         axis=1)
                ut_out = jnp.concatenate(
                    [jnp.swapaxes(jnp.where(live, U11, 0.0), 1, 2),
                     jnp.swapaxes(U12, 1, 2)], axis=1)  # panel stores U^T
                updates.append(U.reshape(-1))
            else:
                lp_out = jnp.where(live, L11, 0.0)
                ut_out = jnp.swapaxes(jnp.where(live, U11, 0.0), 1, 2)
                updates.append(jnp.zeros(0, dtype=dtype))
            Lpanels.append(lp_out.reshape(-1))
            Utpanels.append(ut_out.reshape(-1))
        if updates:
            pool = jnp.concatenate([pool] + updates)
    return (jnp.concatenate(Lpanels), jnp.concatenate(Utpanels),
            jnp.concatenate(perms))


def factorize_lu_device(A: CSC, S: SupernodalSymbolic,
                        config: Config = DEFAULT) -> MFLUDeviceFactor:
    import jax
    import jax.numpy as jnp
    from .multifrontal_lu import _perm_general

    Cg = _perm_general(A, S)
    CgT = Cg.transpose()
    plan = getattr(S, "_mflu_dev_plan", None)
    if plan is None:
        plan = build_lu_plan(S, Cg, CgT)
        S._mflu_dev_plan = plan
        S._mflu_dev_fn = None
    dtype = jnp.float64 if (config.compute_dtype == "float64"
                            and jax.config.jax_enable_x64) else jnp.float32
    fn = getattr(S, "_mflu_dev_fn", None)
    if fn is None or getattr(S, "_mflu_dev_dtype", None) != dtype:
        fn = jax.jit(lambda cd: _run_lu_plan(plan, cd, dtype))
        S._mflu_dev_fn = fn
        S._mflu_dev_dtype = dtype
    Lp, Ut, perms = fn(jnp.asarray(Cg.data))
    minor = S.n
    if not (bool(jnp.isfinite(Lp).all()) and bool(jnp.isfinite(Ut).all())):
        minor = 0  # located precisely on the host path if needed
    return MFLUDeviceFactor(S=S, Lpanels=Lp, Utpanels=Ut, perms=perms,
                            minor=minor)


def solve_mflu_device(F: MFLUDeviceFactor, b: np.ndarray) -> np.ndarray:
    """Host solve consuming the device factor (panels materialized once)."""
    assert F.ok
    S = F.S
    plan = S._mflu_dev_plan
    Lp = np.asarray(F.Lpanels, dtype=np.float64)
    Ut = np.asarray(F.Utpanels, dtype=np.float64)
    perms = np.asarray(F.perms)
    b = np.asarray(b, dtype=np.float64)
    rowpre = getattr(S, "_rowpre", None)
    if rowpre is not None:
        b = b[rowpre]
    y = b[S.perm].copy()

    # locate panels/perms per supernode
    panel_of = {}
    perm_off = {}
    poff = 0
    for glist in plan.groups:
        for g in glist:
            for bidx, s in enumerate(g.snodes):
                panel_of[int(s)] = (g, bidx)
                perm_off[int(s)] = poff + bidx * g.C
            poff += g.B * g.C

    def lpanel(s):
        g, bidx = panel_of[s]
        base = g.panel_base + bidx * g.R * g.C
        return Lp[base:base + g.R * g.C].reshape(g.R, g.C), g

    def utpanel(s):
        g, bidx = panel_of[s]
        base = g.panel_base + bidx * g.R * g.C
        return Ut[base:base + g.R * g.C].reshape(g.R, g.C), g

    # forward
    for s in range(S.nsuper):
        nc = S.ncols(s)
        nr = S.nrows(s)
        f = int(S.super_first[s])
        P, g = lpanel(s)
        pv = perms[perm_off[s]:perm_off[s] + nc]
        L11 = P[:nc, :nc]
        yc = y[f:f + nc][pv]
        # unit lower solve
        for k in range(nc):
            yc[k + 1:] -= L11[k + 1:nc, k] * yc[k]
        y[f:f + nc] = yc
        if nr > nc:
            below = S.rows[s][nc:]
            L21 = P[g.C:g.C + (nr - nc), :nc]
            y[below] -= L21 @ yc
    # backward
    for s in range(S.nsuper - 1, -1, -1):
        nc = S.ncols(s)
        nr = S.nrows(s)
        f = int(S.super_first[s])
        Q, g = utpanel(s)
        U11 = Q[:nc, :nc].T       # stored transposed
        rhs = y[f:f + nc]
        if nr > nc:
            below = S.rows[s][nc:]
            U12 = Q[g.C:g.C + (nr - nc), :nc].T  # [nc, mu]
            rhs = rhs - U12 @ y[below]
        for k in range(nc - 1, -1, -1):
            rhs[k] = (rhs[k] - U11[k, k + 1:nc] @ rhs[k + 1:nc]) / U11[k, k]
        y[f:f + nc] = rhs
    x = np.empty_like(y)
    x[S.perm] = y
    return x
