"""Block-triangular-form permutation: maximum transversal + strong components.

Reference analog: the BTF package — ``btf_maxtrans.c`` (augmenting-path maximum
matching), ``btf_strongcomp.c`` (Tarjan SCC), ``btf_order.c:35`` (combined
permutation to block upper triangular form). Python implementations here are
the oracles/fallbacks; the native C++ kernels in ``native/src/btf.cc`` are the
fast path.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..sparse import CSC

__all__ = ["maxtrans", "strongcomp", "btf_order", "BTF"]


def maxtrans(A: CSC, work_limit: float = -1.0) -> tuple[int, np.ndarray]:
    """Maximum transversal. Returns (nmatch, match) with ``match[j]`` = row
    matched to column j, or -1. ``nmatch`` is the structural rank.

    ``work_limit`` > 0 bounds augmenting-path work to ``work_limit * nnz``
    edge examinations (reference ``btf.h:206`` maxwork contract); past the
    budget, columns are matched by the cheap O(nnz) scan only and the
    matching may be suboptimal (structural rank under-reported)."""
    from .. import native
    if native.available():
        return native.maxtrans(A.nrow, A.ncol, A.indptr, A.indices,
                               work_limit)
    return _maxtrans_python(A.nrow, A.ncol, A.indptr, A.indices, work_limit)


def strongcomp(A: CSC) -> tuple[int, np.ndarray, np.ndarray]:
    """Tarjan SCC of the digraph of square A. Returns (nblocks, p, r): A(p,p)
    is block upper triangular with block k spanning ``p[r[k]:r[k+1]]``."""
    assert A.nrow == A.ncol
    from .. import native
    if native.available():
        return native.strongcomp(A.ncol, A.indptr, A.indices)
    return _strongcomp_python(A.ncol, A.indptr, A.indices)


@dataclasses.dataclass
class BTF:
    """Block-upper-triangular permutation: A(rowperm, colperm) is block upper
    triangular with ``nblocks`` diagonal blocks at boundaries ``r``."""

    rowperm: np.ndarray
    colperm: np.ndarray
    r: np.ndarray          # block boundaries, size nblocks+1
    nblocks: int
    structural_rank: int


def btf_order(A: CSC, work_limit: float = -1.0) -> BTF:
    """Permutation to block upper triangular form (btf_order analog).

    First a maximum transversal puts a zero-free diagonal (if structurally
    nonsingular), then Tarjan SCC of the matched matrix finds the blocks."""
    n = A.ncol
    assert A.nrow == n, "btf_order requires square A"
    nmatch, match = maxtrans(A, work_limit)
    if nmatch < n:
        # structurally singular: complete the matching arbitrarily
        used = np.zeros(n, dtype=bool)
        m = match.copy()
        used[m[m >= 0]] = True
        free_rows = np.flatnonzero(~used)
        m[m < 0] = free_rows[: np.count_nonzero(m < 0)]
        match = m
    # B = A with rows permuted so the matching is the diagonal: B[j',j] with
    # j' = position of row match[j]  =>  row perm q such that B = A(match, :)
    # then SCC on B's digraph
    rowinv = np.empty(n, dtype=np.int64)
    rowinv[match] = np.arange(n, dtype=np.int64)
    B = CSC(n, n, A.indptr, rowinv[A.indices], A.data, 0)
    nb, p, r = strongcomp(B)
    colperm = p
    rowperm = match[p]
    return BTF(rowperm=rowperm, colperm=colperm, r=r, nblocks=nb,
               structural_rank=nmatch)


# ---------------- Python oracles ----------------

def _maxtrans_python(nrow: int, ncol: int, Ap: np.ndarray, Ai: np.ndarray,
                     work_limit: float = -1.0) -> tuple[int, np.ndarray]:
    match = np.full(ncol, -1, dtype=np.int64)
    rowmatch = np.full(nrow, -1, dtype=np.int64)
    cheap = Ap[:-1].astype(np.int64).copy()
    visited = np.full(ncol, -1, dtype=np.int64)
    nmatched = 0
    budget = int(work_limit * max(int(Ap[-1]), 1)) if work_limit > 0 else -1
    work = 0
    for jroot in range(ncol):
        # recursive-style DFS via explicit stacks
        cstack = [jroot]
        es = [int(Ap[jroot])]
        rowused = [-1]
        final_row = -1
        budget_spent = budget >= 0 and work > budget
        while cstack and final_row == -1:
            j = cstack[-1]
            if visited[j] != jroot:
                visited[j] = jroot
                p = cheap[j]
                while p < Ap[j + 1] and rowmatch[Ai[p]] != -1:
                    p += 1
                cheap[j] = p
                if p < Ap[j + 1]:
                    final_row = int(Ai[p])
                    break
                es[-1] = int(Ap[j])
            if budget_spent:
                break          # cheap-only mode: no DFS descent
            descended = False
            while es[-1] < Ap[j + 1]:
                work += 1
                i = int(Ai[es[-1]])
                es[-1] += 1
                jn = int(rowmatch[i])
                if visited[jn] == jroot:
                    continue
                rowused[-1] = i
                cstack.append(jn)
                es.append(int(Ap[jn]))
                rowused.append(-1)
                descended = True
                break
            if not descended:
                cstack.pop(); es.pop(); rowused.pop()
        if final_row != -1:
            j = cstack[-1]
            match[j] = final_row
            rowmatch[final_row] = j
            for t in range(len(cstack) - 2, -1, -1):
                match[cstack[t]] = rowused[t]
                rowmatch[rowused[t]] = cstack[t]
            nmatched += 1
    return nmatched, match


def _strongcomp_python(n: int, Ap: np.ndarray, Ai: np.ndarray
                       ) -> tuple[int, np.ndarray, np.ndarray]:
    low = np.full(n, -1, dtype=np.int64)
    num = np.full(n, -1, dtype=np.int64)
    sccid = np.full(n, -1, dtype=np.int64)
    onstack = np.zeros(n, dtype=bool)
    tstack: list[int] = []
    counter = 0
    nscc = 0
    for root in range(n):
        if num[root] != -1:
            continue
        dstack = [root]
        estack = [int(Ap[root])]
        num[root] = low[root] = counter; counter += 1
        tstack.append(root); onstack[root] = True
        while dstack:
            v = dstack[-1]
            if estack[-1] < Ap[v + 1]:
                w = int(Ai[estack[-1]])
                estack[-1] += 1
                if num[w] == -1:
                    num[w] = low[w] = counter; counter += 1
                    tstack.append(w); onstack[w] = True
                    dstack.append(w); estack.append(int(Ap[w]))
                elif onstack[w]:
                    low[v] = min(low[v], num[w])
            else:
                if low[v] == num[v]:
                    while True:
                        w = tstack.pop()
                        onstack[w] = False
                        sccid[w] = nscc
                        if w == v:
                            break
                    nscc += 1
                dstack.pop(); estack.pop()
                if dstack:
                    low[dstack[-1]] = min(low[dstack[-1]], low[v])
    bsize = np.bincount(sccid, minlength=nscc)
    r = np.zeros(nscc + 1, dtype=np.int64)
    np.cumsum(bsize, out=r[1:])
    cursor = r[:-1].copy()
    p = np.empty(n, dtype=np.int64)
    for v in range(n):
        b = sccid[v]
        p[cursor[b]] = v
        cursor[b] += 1
    return nscc, p, r
