"""Sparse LU for general square matrices: BTF blocking + left-looking LU.

The KLU-equivalent path of the framework (reference ``KLU/Source/klu_analyze.c``
BTF + per-block ordering; ``klu_factor.c:384``/``klu_kernel.c`` Gilbert–Peierls
left-looking LU with threshold diagonal-preference pivoting; ``klu_refactor.c``
same-pattern refactorization; ``klu_solve.c:14`` block back-substitution with
off-diagonal updates; row scaling per ``klu_scale.c``). Numeric kernels run in
native C++ (``native/src/lu.cc``) with a Python Gilbert–Peierls fallback.

This path is deliberately host-resident, like the reference (KLU uses no BLAS
by design — circuit matrices produce tiny supernodes); the TPU-accelerated
factorization for flop-dense problems is the supernodal Cholesky / multifrontal
path. The ``refactor`` fast path (same pattern, new values) is the
circuit-simulation workload.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..config import Config, DEFAULT
from ..sparse import CSC
from ..ordering.btf import BTF, btf_order
from ..ordering.amd import amd_order

__all__ = ["LUSymbolic", "LUNumeric", "analyze_lu", "factor_lu", "refactor_lu",
           "solve_lu", "lusol", "extract_lu", "sort_lu"]


@dataclasses.dataclass
class LUSymbolic:
    """BTF + per-block fill-reducing analysis (klu_analyze analog)."""

    n: int
    btf: BTF
    rowperm: np.ndarray    # global row perm AFTER per-block AMD, BEFORE pivoting
    colperm: np.ndarray    # global col perm (final)
    r: np.ndarray          # block boundaries


@dataclasses.dataclass
class BlockLU:
    Lp: np.ndarray
    Li: np.ndarray
    Lx: np.ndarray
    Up: np.ndarray
    Ui: np.ndarray
    Ux: np.ndarray
    P: np.ndarray          # pivot perm within the block (local rows)


@dataclasses.dataclass
class LUNumeric:
    """Numeric LU factors (klu Numeric analog)."""

    S: LUSymbolic
    blocks: list          # BlockLU per block (None for 1x1: use diag[]
    diag: np.ndarray      # pivot values of 1x1 blocks (0 elsewhere)
    rowperm: np.ndarray   # final global row perm incl. pivoting
    Rs: np.ndarray        # row scale factors (original row space)
    Off: CSC              # off-diagonal entries of A(rowperm, colperm) above blocks
    singular_col: int     # -1 if ok, else first singular column (global)

    @property
    def ok(self) -> bool:
        return self.singular_col == -1


def analyze_lu(A: CSC, config: Config = DEFAULT) -> LUSymbolic:
    n = A.ncol
    assert A.nrow == n, "LU requires square A"
    Ag = A.to_full_storage() if A.sym != 0 else A
    if config.lu_btf:
        B = btf_order(Ag, work_limit=config.btf_work_limit)
    else:
        ident = np.arange(n, dtype=np.int64)
        B = BTF(rowperm=ident, colperm=ident.copy(),
                r=np.array([0, n], dtype=np.int64), nblocks=1,
                structural_rank=n)
    rowperm = B.rowperm.copy()
    colperm = B.colperm.copy()
    Aperm = Ag.permuted(rowperm, colperm)
    # per-block fill-reducing ordering on pattern(C+C')
    for k in range(B.nblocks):
        k1, k2 = int(B.r[k]), int(B.r[k + 1])
        nk = k2 - k1
        if nk <= 2:
            continue
        Cb = _extract_block(Aperm, k1, k2)
        q = amd_order(Cb, config)
        rowperm[k1:k2] = rowperm[k1:k2][q]
        colperm[k1:k2] = colperm[k1:k2][q]
    return LUSymbolic(n=n, btf=B, rowperm=rowperm, colperm=colperm, r=B.r)


def _extract_block(Aperm: CSC, k1: int, k2: int) -> CSC:
    """Diagonal block Aperm[k1:k2, k1:k2] as CSC with local indices.

    Aperm's rows are sorted within columns (``permuted`` sorts), so the
    block is a mask-filter that PRESERVES order — direct CSC assembly, no
    triplet sort (the from_triplets route cost ~0.1 s at circuit scale,
    klu_l parity study)."""
    nk = k2 - k1
    if nk == Aperm.ncol and k1 == 0:
        return Aperm                      # single-block BTF: the whole matrix
    lo, hi = int(Aperm.indptr[k1]), int(Aperm.indptr[k2])
    rr = Aperm.indices[lo:hi]
    sel = (rr >= k1) & (rr < k2)
    csel = np.zeros(hi - lo + 1, dtype=np.int64)
    np.cumsum(sel, out=csel[1:])
    indptr = csel[Aperm.indptr[k1:k2 + 1] - lo]
    return CSC(nk, nk, indptr, rr[sel] - k1, Aperm.data[lo:hi][sel], 0)


def _scale_rows(A: CSC, mode: int) -> tuple[CSC, np.ndarray]:
    """Row scaling (klu_scale analog): mode 0 none, 1 row-sum, 2 row-max."""
    n = A.nrow
    if mode == 0 or A.nnz == 0:
        return A, np.ones(n)
    absx = np.abs(A.data)
    if mode == 1:
        Rs = np.bincount(A.indices, weights=absx, minlength=n)
    else:
        Rs = np.zeros(n)
        np.maximum.at(Rs, A.indices, absx)
    Rs[Rs == 0.0] = 1.0
    scaled = CSC(A.nrow, A.ncol, A.indptr, A.indices, A.data / Rs[A.indices],
                 A.sym)
    return scaled, Rs


def _prep_perm(S: LUSymbolic, Ascaled: CSC, rowperm, colperm, tag: str):
    """Permuted view + per-block extraction + off pattern, ALL as cached
    position maps (klu's analyze-once discipline applied to the permutation
    plumbing: a same-pattern re-factorization is pure O(nnz) gathers).

    Returns (Aperm, blocks, diag_pos, off) where blocks[k] is None for 1x1
    blocks or (indptr, indices, pos) of the local diagonal block; diag_pos[j]
    is the data position of A[j, j] (-1 if absent) for 1x1 blocks; off is
    (indptr_like off CSC pattern, indices, pos)."""
    import zlib

    store = getattr(S, "_lu_maps", None)
    if store is None:
        store = {}
        S._lu_maps = store
    key = (Ascaled.pattern_key(),
           zlib.crc32(np.ascontiguousarray(rowperm).tobytes()),
           zlib.crc32(np.ascontiguousarray(colperm).tobytes()))
    ent = store.get(tag)
    if ent is None or ent[0] != key:
        from .. import native
        if native.available() and native.has("sstpu_lu_prep"):
            # fused native path: permutation + block/off/diag maps in one
            # call (symbolic.cc sstpu_lu_prep) — the numpy pipeline below
            # was ~half of cold factor time at circuit scale
            from ..sparse import invert_permutation
            ip, ii, pos, diag_pos, blocks, off = native.lu_prep(
                S.n, Ascaled.indptr, Ascaled.indices,
                invert_permutation(np.asarray(rowperm)), colperm, S.r)
            store[tag] = (key, ip, ii, pos, blocks, diag_pos, off)
            data = Ascaled.data[pos]
            return (CSC(S.n, S.n, ip, ii, data, 0), blocks, diag_pos, off,
                    data)
        n = S.n
        ip, ii, pos = Ascaled.permuted_map(rowperm, colperm)
        cols = np.repeat(np.arange(n, dtype=np.int64), np.diff(ip))
        cbs = np.empty(n, dtype=np.int64)
        cbe = np.empty(n, dtype=np.int64)
        for k in range(S.btf.nblocks):
            cbs[S.r[k]:S.r[k + 1]] = S.r[k]
            cbe[S.r[k]:S.r[k + 1]] = S.r[k + 1]
        in_blk = (ii >= cbs[cols]) & (ii < cbe[cols])
        # 1x1 diagonal positions
        diag_pos = np.full(n, -1, dtype=np.int64)
        ond = in_blk & (ii == cols) & (cbe[cols] - cbs[cols] == 1)
        diag_pos[cols[ond]] = np.arange(ii.size, dtype=np.int64)[ond]
        blocks = []
        for k in range(S.btf.nblocks):
            k1, k2 = int(S.r[k]), int(S.r[k + 1])
            if k2 - k1 == 1:
                blocks.append(None)
                continue
            lo, hi = int(ip[k1]), int(ip[k2])
            sel = in_blk[lo:hi]
            bpos = np.arange(lo, hi, dtype=np.int64)[sel]
            bi = ii[lo:hi][sel] - k1
            bc = cols[lo:hi][sel] - k1
            bip = np.zeros(k2 - k1 + 1, dtype=np.int64)
            np.cumsum(np.bincount(bc, minlength=k2 - k1), out=bip[1:])
            blocks.append((bip, bi, bpos))
        osel = ii < cbs[cols]
        opos = np.arange(ii.size, dtype=np.int64)[osel]
        oc = cols[osel]
        oip = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(np.bincount(oc, minlength=n), out=oip[1:])
        off = (oip, ii[osel], opos)
        store[tag] = (key, ip, ii, pos, blocks, diag_pos, off)
    _, ip, ii, pos, blocks, diag_pos, off = store[tag]
    data = Ascaled.data[pos]
    return (CSC(S.n, S.n, ip, ii, data, 0), blocks, diag_pos, off, data)


def factor_lu(A: CSC, S: LUSymbolic, config: Config = DEFAULT) -> LUNumeric:
    n = S.n
    Ag = A.to_full_storage() if A.sym != 0 else A
    Ascaled, Rs = _scale_rows(Ag, config.lu_scale)
    Aperm, bmaps, diag_pos, _off0, pdata = _prep_perm(
        S, Ascaled, S.rowperm, S.colperm, "analyze")

    blocks: list = [None] * S.btf.nblocks
    diag = np.zeros(n, dtype=Aperm.data.dtype)
    rowperm3 = S.rowperm.copy()
    singular_col = -1
    for k in range(S.btf.nblocks):
        k1, k2 = int(S.r[k]), int(S.r[k + 1])
        nk = k2 - k1
        if nk == 1:
            j = k1
            d = pdata[diag_pos[j]] if diag_pos[j] >= 0 else 0.0
            if d == 0.0 and singular_col == -1:
                singular_col = j
                if config.halt_if_singular:
                    break
            diag[j] = d
            continue
        bip, bi, bpos = bmaps[k]
        C = CSC(nk, nk, bip, bi, pdata[bpos], 0)
        blu, status = _factor_block(C, config.lu_pivot_tol)
        if status != 0:
            if singular_col == -1:
                singular_col = k1 + status - 1
            if config.halt_if_singular:
                break
            continue
        blocks[k] = blu
        rowperm3[k1:k2] = S.rowperm[k1:k2][blu.P]

    # off-diagonal part in final row space (cached maps keyed by the pivoted
    # row permutation: values-stable pivots make repeat factors pure gathers)
    _ApermF, _bm, _dp, (oip, oi, opos), pdataF = _prep_perm(
        S, Ascaled, rowperm3, S.colperm, "final")
    Off = CSC(n, n, oip, oi, pdataF[opos], 0)
    return LUNumeric(S=S, blocks=blocks, diag=diag, rowperm=rowperm3, Rs=Rs,
                     Off=Off, singular_col=singular_col)


def _factor_block(C: CSC, tol: float) -> tuple[BlockLU | None, int]:
    """Factor one diagonal block; returns (factor, status) with status as in
    sstpu_lu_factor (0 ok, k+1 singular)."""
    from .. import native
    nk = C.ncol
    if (native.available() and native.has("sstpu_lu_factor")
            and not np.iscomplexobj(C.data)):  # complex uses the Python kernel
        import ctypes
        capacity = max(4 * C.nnz + nk, 1024)
        dll = native._load()
        Ap = np.ascontiguousarray(C.indptr)
        Ai = np.ascontiguousarray(C.indices)
        Ax = np.ascontiguousarray(C.data, dtype=np.float64)
        while True:
            # kernel writes Lp/Up fully (Lp[0]=0 onward) — no zeroing needed
            Lp = np.empty(nk + 1, dtype=np.int64)
            Li = np.empty(capacity, dtype=np.int64)
            Lx = np.empty(capacity, dtype=np.float64)
            Up = np.empty(nk + 1, dtype=np.int64)
            Ui = np.empty(capacity, dtype=np.int64)
            Ux = np.empty(capacity, dtype=np.float64)
            P = np.empty(nk, dtype=np.int64)
            rc = dll.sstpu_lu_factor(
                nk, native._ptr_i64(Ap), native._ptr_i64(Ai),
                native._ptr_f64(Ax), ctypes.c_double(tol), capacity,
                native._ptr_i64(Lp), native._ptr_i64(Li), native._ptr_f64(Lx),
                native._ptr_i64(Up), native._ptr_i64(Ui), native._ptr_f64(Ux),
                native._ptr_i64(P))
            if rc == -1:
                capacity *= 2
                continue
            if rc != 0:
                return None, int(rc)
            lnz, unz = int(Lp[nk]), int(Up[nk])
            # shrink IN PLACE (realloc tail-free, no copy): the trim copies
            # were ~2/3 of the non-kernel factor cost at circuit scale on
            # this 280 MB/s-memcpy host (klu_l parity study, round 3)
            for arr, sz in ((Li, lnz), (Lx, lnz), (Ui, unz), (Ux, unz)):
                arr.resize(sz, refcheck=False)
            return BlockLU(Lp=Lp, Li=Li, Lx=Lx, Up=Up, Ui=Ui, Ux=Ux,
                           P=P), 0
    return _lu_gp_python(C, tol)


def _lu_gp_python(C: CSC, tol: float) -> tuple[BlockLU | None, int]:
    """Gilbert–Peierls left-looking LU, Python fallback (cs_lu-style)."""
    n = C.ncol
    pinv = np.full(n, -1, dtype=np.int64)
    P = np.empty(n, dtype=np.int64)
    x = np.zeros(n, dtype=np.complex128 if np.iscomplexobj(C.data)
                 else np.float64)
    marked = np.zeros(n, dtype=bool)
    Lp = np.zeros(n + 1, dtype=np.int64)
    Up = np.zeros(n + 1, dtype=np.int64)
    Lcols_i: list[np.ndarray] = []
    Lcols_x: list[np.ndarray] = []
    Ucols_i: list[np.ndarray] = []
    Ucols_x: list[np.ndarray] = []
    Lidx: list[list] = [None] * n  # per factored column: (orig rows, values)

    for k in range(n):
        # symbolic: DFS reach
        topo: list[int] = []
        pattern: list[int] = []
        stack: list[tuple[int, int]] = []
        for rr0 in C.rows_of(k):
            if marked[rr0]:
                continue
            stack.append((int(rr0), 0))
            marked[rr0] = True
            while stack:
                rr, ei = stack[-1]
                j = pinv[rr]
                if j < 0:
                    pattern.append(rr)
                    stack.pop()
                    continue
                rows_j = Lidx[j][0]
                descended = False
                while ei < len(rows_j):
                    rn = int(rows_j[ei])
                    ei += 1
                    if not marked[rn]:
                        marked[rn] = True
                        stack[-1] = (rr, ei)
                        stack.append((rn, 0))
                        descended = True
                        break
                if not descended:
                    stack[-1] = (rr, ei)
                    topo.append(rr)
                    stack.pop()
        # numeric
        rows_k = C.rows_of(k)
        x[rows_k] = C.vals_of(k)
        for rr in reversed(topo):
            j = pinv[rr]
            xj = x[rr]
            if xj != 0.0:
                rows_j, vals_j = Lidx[j]
                x[rows_j] -= vals_j * xj
        # pivot
        cand = np.array(pattern, dtype=np.int64)
        if cand.size == 0:
            return None, k + 1
        av = np.abs(x[cand])
        amax = av.max()
        if amax == 0.0:
            return None, k + 1
        prow = int(cand[int(np.argmax(av))])
        if tol > 0 and k in cand and abs(x[k]) >= tol * amax:
            prow = k
        pivot = x[prow]
        # store
        ui = np.array([pinv[rr] for rr in reversed(topo)] + [k], dtype=np.int64)
        ux = np.array([x[rr] for rr in reversed(topo)] + [pivot])
        Ucols_i.append(ui)
        Ucols_x.append(ux)
        P[k] = prow
        pinv[prow] = k
        others = cand[cand != prow]
        li = np.concatenate([[prow], others])
        lx = np.concatenate([[1.0], x[others] / pivot])
        Lcols_i.append(li)
        Lcols_x.append(lx)
        Lidx[k] = (others.copy(), lx[1:].copy())
        Lp[k + 1] = Lp[k] + li.size
        Up[k + 1] = Up[k] + ui.size
        # reset
        for rr in topo:
            marked[rr] = False
            x[rr] = 0.0
        for rr in pattern:
            marked[rr] = False
            x[rr] = 0.0
    Li = pinv[np.concatenate(Lcols_i)] if Lcols_i else np.empty(0, np.int64)
    return BlockLU(Lp=Lp, Li=Li, Lx=np.concatenate(Lcols_x),
                   Up=Up, Ui=np.concatenate(Ucols_i),
                   Ux=np.concatenate(Ucols_x), P=P), 0


def refactor_lu(A: CSC, N: LUNumeric, config: Config = DEFAULT) -> LUNumeric:
    """Recompute factor values for a matrix with the SAME pattern
    (klu_refactor analog — the circuit-simulation fast path, no pivot search)."""
    from .. import native
    S = N.S
    n = S.n
    Ag = A.to_full_storage() if A.sym != 0 else A
    Ascaled, Rs = _scale_rows(Ag, config.lu_scale)
    Aperm, bmaps, diag_pos, offmap, pdata = _prep_perm(
        S, Ascaled, N.rowperm, S.colperm, "final")  # final row space
    singular_col = -1
    diag = np.zeros(n, dtype=Aperm.data.dtype)
    for k in range(S.btf.nblocks):
        k1, k2 = int(S.r[k]), int(S.r[k + 1])
        nk = k2 - k1
        if nk == 1:
            j = k1
            d = pdata[diag_pos[j]] if diag_pos[j] >= 0 else 0.0
            if d == 0.0 and singular_col == -1:
                singular_col = j
            diag[j] = d
            continue
        blu = N.blocks[k]
        bip, bi, bpos = bmaps[k]
        C = CSC(nk, nk, bip, bi, pdata[bpos], 0)
        # rows of C are already in final (pivoted) order: local pivot = identity
        if native.available() and native.has("sstpu_lu_refactor"):
            dll = native._load()
            Ap = np.ascontiguousarray(C.indptr)
            Ai = np.ascontiguousarray(C.indices)
            Ax = np.ascontiguousarray(C.data, dtype=np.float64)
            ident = np.arange(nk, dtype=np.int64)
            rc = dll.sstpu_lu_refactor(
                nk, native._ptr_i64(Ap), native._ptr_i64(Ai),
                native._ptr_f64(Ax),
                native._ptr_i64(blu.Lp), native._ptr_i64(blu.Li),
                native._ptr_f64(blu.Lx),
                native._ptr_i64(blu.Up), native._ptr_i64(blu.Ui),
                native._ptr_f64(blu.Ux), native._ptr_i64(ident))
            if rc != 0 and singular_col == -1:
                singular_col = k1 + int(rc) - 1
        else:
            blu2, status = _lu_gp_python(C, tol=-1.0)
            if status != 0:
                singular_col = k1 + status - 1
            else:
                blu.Lx[:] = blu2.Lx
                blu.Ux[:] = blu2.Ux
    # off-diagonal values refresh (cached positions)
    oip, oi, opos = offmap
    Off = CSC(n, n, oip, oi, pdata[opos], 0)
    return LUNumeric(S=S, blocks=N.blocks, diag=diag, rowperm=N.rowperm,
                     Rs=Rs, Off=Off, singular_col=singular_col)


def extract_lu(N: LUNumeric):
    """Materialize the factorization as global CSC matrices (klu_extract
    analog, ``klu_extract.c``): returns (L, U, F_off, P, Q, Rs) such that

        diag(1/Rs[P]) @ A[P, Q] = (L @ U + F_off)

    where L is unit-lower with the block-diagonal L factors, U upper with the
    U factors and 1x1 pivots, and F_off holds the off-diagonal (above-block)
    entries in factor coordinates."""
    assert N.ok
    from ..sparse import from_triplets
    S = N.S
    n = S.n
    rL, cL, xL = [np.arange(n)], [np.arange(n)], [np.ones(n)]
    rU, cU, xU = [], [], []
    for k in range(S.btf.nblocks):
        k1, k2 = int(S.r[k]), int(S.r[k + 1])
        nk = k2 - k1
        if nk == 1:
            rU.append([k1]); cU.append([k1]); xU.append([N.diag[k1]])
            continue
        blu = N.blocks[k]
        cols = np.repeat(np.arange(nk), np.diff(blu.Lp))
        off = blu.Li != cols                # drop unit diagonal duplicates
        rL.append(k1 + blu.Li[off]); cL.append(k1 + cols[off])
        xL.append(blu.Lx[off])
        colsU = np.repeat(np.arange(nk), np.diff(blu.Up))
        rU.append(k1 + blu.Ui); cU.append(k1 + colsU); xU.append(blu.Ux)
    cat = np.concatenate
    dt = N.diag.dtype
    L = from_triplets(n, n, cat([np.asarray(a) for a in rL]),
                      cat([np.asarray(a) for a in cL]),
                      cat([np.asarray(a, dtype=dt) for a in xL]))
    U = from_triplets(n, n, cat([np.asarray(a) for a in rU]),
                      cat([np.asarray(a) for a in cU]),
                      cat([np.asarray(a, dtype=dt) for a in xU]))
    return L, U, N.Off, N.rowperm, S.colperm, N.Rs


def sort_lu(N: LUNumeric) -> LUNumeric:
    """Sort row indices within every factor column in place (klu_sort
    analog) — the factors come out of Gilbert-Peierls in topological order."""
    for blu in N.blocks:
        if blu is None:
            continue
        for (Ip, Ii, Ix) in ((blu.Lp, blu.Li, blu.Lx),
                             (blu.Up, blu.Ui, blu.Ux)):
            for j in range(Ip.size - 1):
                lo, hi = Ip[j], Ip[j + 1]
                o = np.argsort(Ii[lo:hi], kind="stable")
                Ii[lo:hi] = Ii[lo:hi][o]
                Ix[lo:hi] = Ix[lo:hi][o]
    return N


def solve_lu(N: LUNumeric, b: np.ndarray) -> np.ndarray:
    """x = A \\ b by block back-substitution (klu_solve analog)."""
    assert N.ok, f"LU factorization singular at column {N.singular_col}"
    from .simplicial import lsolve, usolve
    S = N.S
    n = S.n
    b = np.asarray(b)
    cplx = (np.iscomplexobj(b) or np.iscomplexobj(N.diag) or any(
        np.iscomplexobj(bl.Lx) for bl in N.blocks if bl is not None))
    b = b.astype(np.complex128 if cplx else np.float64)
    # scale + row-permute the rhs
    if b.ndim > 1:
        y = (b[N.rowperm].T / N.Rs[N.rowperm]).T
    else:
        y = b[N.rowperm] / N.Rs[N.rowperm]
    Offp, Offi, Offx = N.Off.indptr, N.Off.indices, N.Off.data
    for k in range(S.btf.nblocks - 1, -1, -1):
        k1, k2 = int(S.r[k]), int(S.r[k + 1])
        nk = k2 - k1
        if nk == 1:
            y[k1] = y[k1] / N.diag[k1]
        else:
            blu = N.blocks[k]
            from .. import native
            if (y.ndim == 1 and not cplx
                    and not np.iscomplexobj(blu.Lx)
                    and native.available()):
                # native sweeps straight on the factor arrays — no CSC
                # wrapper churn on the per-solve path (klu_solve shape)
                yk = np.ascontiguousarray(y[k1:k2])
                native.lsolve(nk, blu.Lp, blu.Li, blu.Lx, yk)
                native.usolve(nk, blu.Up, blu.Ui, blu.Ux, yk)
                y[k1:k2] = yk
            else:
                Lb = CSC(nk, nk, blu.Lp, blu.Li, blu.Lx, 0)
                Ub = CSC(nk, nk, blu.Up, blu.Ui, blu.Ux, 0)
                y[k1:k2] = usolve(Ub, lsolve(Lb, y[k1:k2]))
        # off-diagonal updates to earlier blocks
        if Offp[k2] == Offp[k1]:
            continue  # no off entries in this block's columns
        if (y.ndim == 1 and not cplx and not np.iscomplexobj(Offx)):
            from .. import native
            if native.available():
                native.offupdate(k1, k2, Offp, Offi,
                                 np.ascontiguousarray(Offx,
                                                      dtype=np.float64), y)
                continue
        for j in range(k1, k2):
            lo, hi = Offp[j], Offp[j + 1]
            if hi > lo:
                if y.ndim == 1:
                    y[Offi[lo:hi]] -= Offx[lo:hi] * y[j]
                else:
                    y[Offi[lo:hi]] -= np.outer(Offx[lo:hi], y[j])
    x = np.empty_like(y)
    x[S.colperm] = y
    return x


def solve_lu_refined(N: LUNumeric, A: CSC, b: np.ndarray,
                     ir_steps: int = 2) -> np.ndarray:
    """Solve with iterative refinement (UMFPACK ``Control[UMFPACK_IRSTEP]``
    analog, ``umfpack_solve.c:102``): x ← x + A \\ (b - A x), up to
    ``ir_steps`` sweeps, stopping early when the residual stops improving."""
    x = solve_lu(N, b)
    if ir_steps <= 0:
        return x
    b = np.asarray(b)
    if not np.iscomplexobj(b):
        b = b.astype(np.float64)
    prev = np.inf
    for _ in range(ir_steps):
        r = b - A.matvec(x)
        nrm = np.abs(r).max(initial=0.0)
        if nrm == 0.0 or nrm >= prev:
            break
        prev = nrm
        x = x + solve_lu(N, r)
    return x


def lusol(A: CSC, b: np.ndarray, config: Config = DEFAULT) -> np.ndarray:
    """One-call general square solve (cs_lusol / klu driver analog), with
    UMFPACK-style iterative refinement per ``config.ir_steps``."""
    S = analyze_lu(A, config)
    N = factor_lu(A, S, config)
    return solve_lu_refined(N, A, b, config.ir_steps)
