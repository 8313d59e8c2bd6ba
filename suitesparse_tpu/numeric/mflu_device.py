"""Device (XLA/TPU) multifrontal LU: level-batched two-panel fronts with
WITHIN-FRONT partial pivoting.

Extends the one-hot-matmul Cholesky machinery (supernodal_device) to the
UMFPACK-class LU of :mod:`.multifrontal_lu`: each front is a full square
R x R matrix over the supernode's row pattern (structurally symmetrized
analysis, like UMFPACK's symmetric strategy), assembled from

  * original entries of the supernode's columns (L side) and rows (U side)
    by ONE sorted unique scatter,
  * children's full square update matrices placed as ``P @ U_c @ P^T``
    one-hot matmuls on the MXU (see supernodal_device.py for the rationale:
    TPU gathers are ~10x slower per element than streaming; placement
    matmuls turn irregular extend-add into dense MXU work).

The dense diagonal block is factored with ``lax.linalg.lu`` — batched partial
pivoting WITHIN the fully-summed block, which is numerically stronger than the
host oracle's static diagonal pivoting and is exactly the freedom the
multifrontal method allows (fully-summed rows may be permuted front-locally).

Output layout per bucket (R, C), unchanged from the gather-first version:
  Lpanel  [B, R, C]:  rows 0..C = L11 (unit lower), rows C.. = L21
  Utpanel [B, R, C]:  U11^T then U12^T (stored transposed: lower trapezoid)

Pivot permutations are returned per supernode and folded into the global row
permutation by the solve.

Reference analog: UMFPACK's numeric kernel (umf_kernel.c:36, blas3 updates
umf_blas3_update.c:66-133) with the front-chain dynamic pivot search replaced
by the static supernodal front tree + within-front pivoting (SURVEY §7's
documented contract change).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..config import Config, DEFAULT
from ..sparse import CSC
from ..symbolic.supernodes import SupernodalSymbolic
from .supernodal_device import _pad_to, _R_LADDER, _C_LADDER

__all__ = ["factorize_lu_device", "MFLUDeviceFactor", "solve_mflu_device"]


@dataclasses.dataclass
class LUGroupPlan:
    R: int
    C: int
    B: int
    snodes: np.ndarray
    asrc: np.ndarray       # [na] gather into Cg.data
    adst: np.ndarray       # [na] flat dst into (B*R*R), sorted, unique
    nc: np.ndarray
    pairs: list            # [(src_level, src_gi, RU_c, src_slots, dst_slots, idx)]
    panel_base: int


@dataclasses.dataclass
class LUPlan:
    groups: list
    dev_size: int
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
    place = {}             # snode -> (level, gi, slot, group RU)
    panel_off = 0
    for d, level_nodes in enumerate(S.levels):
        buckets: dict = {}
        for s in level_nodes:
            nr, nc = S.nrows(s), S.ncols(s)
            key = (_pad_to(nr - nc, _R_LADDER) + _pad_to(nc, _C_LADDER),
                   _pad_to(nc, _C_LADDER))
            buckets.setdefault(key, []).append(int(s))
        placed = []
        for gi, ((R, C), ss) in enumerate(sorted(buckets.items())):
            maxnc = max(S.ncols(s) for s in ss)
            maxru = max(S.nrows(s) - S.ncols(s) for s in ss)
            C = max(8 * ((maxnc + 7) // 8), 4)
            R = C + 8 * ((maxru + 7) // 8)
            for b, s in enumerate(ss):
                place[s] = (d, gi, b, R - C)
            placed.append((R, C, ss, panel_off))
            panel_off += len(ss) * R * C
        level_layouts.append(placed)

    # CgT entry t -> position of the same entry in Cg.data
    cols_g = np.repeat(np.arange(Cg.ncol, dtype=np.int64), np.diff(Cg.indptr))
    order_g = np.lexsort((cols_g, Cg.indices))   # Cg entries by (row, col)
    colsT = np.repeat(np.arange(CgT.ncol, dtype=np.int64), np.diff(CgT.indptr))
    order_t = np.lexsort((CgT.indices, colsT))   # CgT entries by (col, row)
    t2g = np.empty(CgT.nnz, dtype=np.int64)
    t2g[order_t] = order_g

    groups_all = []
    for placed in level_layouts:
        gplans = []
        for (R, C, ss, pbase) in placed:
            gplans.append(_build_lu_group(S, Cg, CgT, t2g, ss, R, C, place,
                                          children, pbase))
        groups_all.append(gplans)
    return LUPlan(groups=groups_all, dev_size=panel_off, n=S.n)


def _build_lu_group(S, Cg, CgT, t2g, ss, R, C, place, children, pbase):
    B = len(ss)
    a_src, a_dst = [], []
    nc_arr = np.zeros(B, dtype=np.int32)
    pair_cls: dict = {}

    for b, s in enumerate(ss):
        rows = S.rows[s]
        nr = len(rows)
        f, l = int(S.super_first[s]), int(S.super_first[s + 1])
        nc = l - f
        nc_arr[b] = nc
        base = b * R * R

        def fcoord(pos):
            return np.where(pos < nc, pos, C + (pos - nc))

        # column side: entries of supernode columns with row in pattern
        # (covers F11 fully + F21)
        lo, hi = int(Cg.indptr[f]), int(Cg.indptr[l])
        ents = np.diff(Cg.indptr[f:l + 1])
        colk = np.repeat(np.arange(nc, dtype=np.int64), ents)
        rr = Cg.indices[lo:hi]
        keep = rr >= f
        pos = np.searchsorted(rows, rr[keep])
        a_src.append(np.arange(lo, hi, dtype=np.int64)[keep])
        a_dst.append(base + fcoord(pos) * R + colk[keep])

        # row side: entries (j=f+k, c) with c beyond the supernode -> F12
        loT, hiT = int(CgT.indptr[f]), int(CgT.indptr[l])
        entsT = np.diff(CgT.indptr[f:l + 1])
        rowk = np.repeat(np.arange(nc, dtype=np.int64), entsT)
        cc = CgT.indices[loT:hiT]
        posc = np.searchsorted(rows, cc)
        keep2 = (posc >= nc) & (posc < nr) & (rows[np.minimum(posc, nr - 1)]
                                              == cc)
        a_src.append(t2g[np.arange(loT, hiT, dtype=np.int64)[keep2]])
        a_dst.append(base + rowk[keep2] * R + fcoord(posc[keep2]))

        # extend-add from children: full square update into the full front
        for ch in children[s]:
            mu = S.nrows(ch) - S.ncols(ch)
            if mu == 0:
                continue
            dc, gc, slot_c, RU_c = place[ch]
            rows_c = S.rows[ch][S.ncols(ch):]
            idx = fcoord(np.searchsorted(rows, rows_c)).astype(np.int32)
            row = np.full(RU_c, -1, dtype=np.int32)
            row[:mu] = idx
            cls = pair_cls.setdefault((dc, gc), {"RU_c": RU_c, "src": [],
                                                 "dst": [], "idx": []})
            cls["src"].append(slot_c)
            cls["dst"].append(b)
            cls["idx"].append(row)

    asrc = np.concatenate(a_src) if a_src else np.empty(0, np.int64)
    adst = np.concatenate(a_dst) if a_dst else np.empty(0, np.int64)
    order = np.argsort(adst, kind="stable")
    asrc, adst = asrc[order].astype(np.int32), adst[order]

    pairs = []
    for (dc, gc), cls in sorted(pair_cls.items()):
        dst = np.asarray(cls["dst"], dtype=np.int32)
        order = np.argsort(dst, kind="stable")
        pairs.append((dc, gc, cls["RU_c"],
                      np.asarray(cls["src"], dtype=np.int32)[order],
                      dst[order],
                      np.stack(cls["idx"], axis=0)[order]))
    return LUGroupPlan(R=R, C=C, B=B, snodes=np.asarray(ss, dtype=np.int64),
                       asrc=asrc, adst=adst, nc=nc_arr, pairs=pairs,
                       panel_base=pbase)


def _run_lu_plan(plan: LUPlan, Cdata, dtype, precision=None):
    import jax
    import jax.numpy as jnp

    Lpanels, Utpanels, perms = [], [], []
    updates = {}
    for d, glist in enumerate(plan.groups):
        for gi, g in enumerate(glist):
            B, R, C = g.B, g.R, g.C
            RU = R - C
            F = jnp.zeros(B * R * R, dtype=dtype)
            if g.asrc.size:
                F = F.at[g.adst].set(Cdata[g.asrc].astype(dtype),
                                     indices_are_sorted=True,
                                     unique_indices=True)
            F = F.reshape(B, R, R)
            for (dc, gc, RU_c, src, dst, idx) in g.pairs:
                child = updates[(dc, gc)][src]           # (np, RU_c, RU_c)
                iota = jax.lax.broadcasted_iota(jnp.int32, (1, R, RU_c), 1)
                P = (iota == idx[:, None, :]).astype(dtype)
                half = jnp.matmul(P, child, preferred_element_type=dtype,
                                  precision=precision)
                contrib = jnp.matmul(half, jnp.swapaxes(P, 1, 2),
                                     preferred_element_type=dtype,
                                     precision=precision)
                F = F.at[dst].add(contrib, indices_are_sorted=True)

            ridx = jax.lax.broadcasted_iota(jnp.int32, (B, C, C), 1)
            cidx = jax.lax.broadcasted_iota(jnp.int32, (B, C, C), 2)
            ncb = g.nc.reshape(B, 1, 1)
            live = (ridx < ncb) & (cidx < ncb)
            eye = jnp.where(ridx == cidx, jnp.asarray(1.0, dtype), 0.0)
            F11m = jnp.where(live, F[:, :C, :C], eye)
            lu, piv, perm = jax.lax.linalg.lu(F11m)
            L11 = jnp.where(live, jnp.tril(lu, -1), 0.0) + eye
            U11 = jnp.where(live, jnp.triu(lu), eye)
            perms.append(perm.reshape(-1))
            if RU > 0:
                F21 = F[:, C:, :C]
                L21 = jax.lax.linalg.triangular_solve(
                    U11, F21, left_side=False, lower=False)
                F12 = F[:, :C, C:]
                F12p = jnp.take_along_axis(F12, perm[:, :, None], axis=1)
                U12 = jax.lax.linalg.triangular_solve(
                    L11, F12p, left_side=True, lower=True, unit_diagonal=True)
                U = F[:, C:, C:] - jnp.matmul(L21, U12,
                                              preferred_element_type=dtype,
                                              precision=precision)
                lp_out = jnp.concatenate([jnp.where(live, L11, 0.0), L21],
                                         axis=1)
                ut_out = jnp.concatenate(
                    [jnp.swapaxes(jnp.where(live, U11, 0.0), 1, 2),
                     jnp.swapaxes(U12, 1, 2)], axis=1)  # panel stores U^T
                updates[(d, gi)] = U
            else:
                lp_out = jnp.where(live, L11, 0.0)
                ut_out = jnp.swapaxes(jnp.where(live, U11, 0.0), 1, 2)
            Lpanels.append(lp_out.reshape(-1))
            Utpanels.append(ut_out.reshape(-1))
    return (jnp.concatenate(Lpanels), jnp.concatenate(Utpanels),
            jnp.concatenate(perms))


def _cg_data(A: CSC, S: SupernodalSymbolic) -> np.ndarray:
    """Values of _perm_general(A, S) via a cached position map (steady-state
    factor-many does no per-call host symbolic work, like _clow_data)."""
    from .multifrontal_lu import _perm_general

    key = A.pattern_key()
    cache = getattr(S, "_cg_map", None)
    if cache is None or cache[0] != key:
        trace = CSC(A.nrow, A.ncol, A.indptr, A.indices,
                    np.arange(A.nnz, dtype=np.float64), A.sym)
        Cg = _perm_general(trace, S)
        S._cg_map = (key, Cg.data.astype(np.int64))
    return A.data[S._cg_map[1]]


def factorize_lu_device(A: CSC, S: SupernodalSymbolic,
                        config: Config = DEFAULT) -> MFLUDeviceFactor:
    import jax
    import jax.numpy as jnp
    from .multifrontal_lu import _perm_general

    plan = getattr(S, "_mflu_dev_plan", None)
    if plan is None:
        Cg = _perm_general(A, S)
        CgT = Cg.transpose()
        plan = build_lu_plan(S, Cg, CgT)
        S._mflu_dev_plan = plan
        S._mflu_dev_fn = None
    dtype = jnp.float64 if (config.compute_dtype == "float64"
                            and jax.config.jax_enable_x64) else jnp.float32
    fn = getattr(S, "_mflu_dev_fn", None)
    if fn is None or getattr(S, "_mflu_dev_dtype", None) != dtype:
        prec = {"highest": jax.lax.Precision.HIGHEST,
                "high": jax.lax.Precision.HIGH,
                "default": jax.lax.Precision.DEFAULT}[config.precision]
        fn = jax.jit(lambda cd: _run_lu_plan(plan, cd, dtype, prec))
        S._mflu_dev_fn = fn
        S._mflu_dev_dtype = dtype
    Lp, Ut, perms = fn(jnp.asarray(_cg_data(A, S)))
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
