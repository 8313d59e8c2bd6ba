"""Supernodal symbolic analysis: fundamental supernodes, relaxed amalgamation,
row patterns, and the static TPU execution plan.

Reference analog: ``CHOLMOD/Supernodal/cholmod_super_symbolic.c`` (fundamental
supernodes :155-:465, supernode etree ``Sparent`` :465, relaxed amalgamation
:475-560 with the nrelax/zrelax rule of ``cholmod_core.h:495-510``, pattern
construction :775+, workspace bounds maxcsize/maxesize :849-936).

TPU-first differences:
  * the postorder is folded into the permutation up front, so supernodes are
    contiguous column ranges of the *factored* matrix;
  * beyond CHOLMOD's arrays (``super/pi/px/s``), the analysis emits a static
    *execution plan*: supernodes grouped by elimination-tree level (every
    supernode in a level is independent → one batched device step) and padded
    into shape buckets (so XLA compiles a bounded kernel zoo — SURVEY §7's
    "shape bucketing" mitigation). The numeric multifrontal factorization
    (numeric/supernodal.py) consumes this plan verbatim; nothing about the
    matrix pattern is decided on device.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..config import Config, DEFAULT
from ..sparse import CSC, invert_permutation
from .etree import col_counts, etree, postorder

__all__ = ["SupernodalSymbolic", "Supernode", "analyze_supernodal"]


@dataclasses.dataclass
class SupernodalSymbolic:
    """Supernodal analysis result (cholmod supernodal-symbolic factor analog)."""

    n: int
    perm: np.ndarray          # final fill-reducing permutation (postorder folded)
    parent: np.ndarray        # column etree of C = A(perm, perm)
    colcount: np.ndarray      # exact nnz(L(:,j)) BEFORE amalgamation
    nsuper: int
    super_first: np.ndarray   # first column of each supernode, size nsuper+1
    sparent: np.ndarray       # supernode etree
    rows: list                # rows[s]: global row ids of supernode s's panel
                              # (first ncols entries are the supernode's columns)
    snode_of_col: np.ndarray  # column -> supernode
    levels: list              # levels[d] = np.array of supernodes at tree depth d
    level_of: np.ndarray
    lnz: int                  # nnz stored in panels (incl. amalgamation zeros)
    fl: float                 # factorization flops (2-flop fused multiply-add=2)
    maxcsize: int             # largest child update matrix (rows)
    # flat panel layout (CHOLMOD px analog): panel s occupies
    # Lpx[s] : Lpx[s+1] as a dense (nrows, ncols) column-major block
    Lpx: np.ndarray

    def ncols(self, s: int) -> int:
        return int(self.super_first[s + 1] - self.super_first[s])

    def nrows(self, s: int) -> int:
        return len(self.rows[s])


Supernode = SupernodalSymbolic  # legacy alias


def analyze_supernodal(A: CSC, perm: np.ndarray | None = None,
                       config: Config = DEFAULT) -> SupernodalSymbolic:
    """Full supernodal analysis of A(p,p) for upper-stored symmetric A."""
    n = A.ncol
    assert A.sym == 1
    if perm is None:
        perm = np.arange(n, dtype=np.int64)
    perm = np.asarray(perm, dtype=np.int64)

    # fold the etree postorder into the permutation so supernode columns are
    # contiguous (cholmod_analyze does the same via its postorder step)
    C = A.symperm(perm)
    par0 = etree(C)
    post = postorder(par0)
    perm = perm[post]
    C = A.symperm(perm)
    parent = etree(C)
    post2 = postorder(parent)
    # after folding once the tree is postordered; (post2 == identity normally)
    if not np.array_equal(post2, np.arange(n)):
        perm = perm[post2]
        C = A.symperm(perm)
        parent = etree(C)
        post2 = np.arange(n)
    cc = col_counts(C, parent, np.arange(n, dtype=np.int64))

    # ---- fundamental supernodes (Liu) ----
    nchild = np.zeros(n + 1, dtype=np.int64)
    for j in range(n):
        p = parent[j]
        nchild[p if p >= 0 else n] += 1
    super_first_list = [0]
    for j in range(1, n):
        merge = (parent[j - 1] == j and cc[j] == cc[j - 1] - 1
                 and nchild[j] == 1)
        if not merge:
            super_first_list.append(j)
    super_first = np.array(super_first_list + [n], dtype=np.int64)
    nsuper = len(super_first) - 1

    # supernode etree + per-supernode zero bookkeeping for amalgamation
    def build_sparent(sf):
        ns = len(sf) - 1
        scol = np.empty(n, dtype=np.int64)
        for s in range(ns):
            scol[sf[s]:sf[s + 1]] = s
        sp = np.full(ns, -1, dtype=np.int64)
        for s in range(ns):
            lastcol = sf[s + 1] - 1
            p = parent[lastcol]
            sp[s] = scol[p] if p != -1 else -1
        return sp, scol

    # ---- relaxed amalgamation (CHOLMOD rule, cholmod_core.h:495-510) ----
    nrelax0, nrelax1, nrelax2 = config.nrelax
    zrelax0, zrelax1, zrelax2 = config.zrelax
    # merge child s into parent s+1 repeatedly; track zeros introduced
    merged = True
    sf = list(super_first[:-1]) + [n]
    zeros = {}  # first supernode col -> accumulated explicit zeros
    while merged:
        merged = False
        sfa = np.array(sf, dtype=np.int64)
        ns = len(sfa) - 1
        sp, scol = build_sparent(sfa)
        for s in range(ns - 2, -1, -1):
            if sp[s] != s + 1:
                continue
            f_s, f_p = sfa[s], sfa[s + 1]
            ncols_s = sfa[s + 1] - sfa[s]
            ncols_p = sfa[s + 2] - sfa[s + 1]
            nstot = ncols_s + ncols_p
            # rows of merged panel at child's first col = ncols_s + cc[f_p]
            # zeros added by padding child's columns to the merged height
            z_add = 0
            for i, j in enumerate(range(f_s, f_p)):
                z_add += (nstot - (j - f_s) + cc[f_p] - 1) - cc[j]
            z_tot = zeros.get(f_s, 0) + zeros.get(f_p, 0) + z_add
            # total entries of merged panel
            tot = 0
            for i in range(nstot):
                tot += (nstot - i) + cc[f_p] - 1 - (ncols_p - 1)
            # simpler exact: per merged column height = (cols below in snode)
            # + |below-diag rows of parent's first col pattern|
            h_below = cc[f_p] - 1 - (ncols_p - 1)  # rows below merged cols
            tot = sum((nstot - i) + h_below for i in range(nstot))
            z = z_tot / max(tot, 1)
            ok = (nstot <= nrelax0 or z_add == 0
                  or (nstot <= nrelax1 and z < zrelax0)
                  or (nstot <= nrelax2 and z < zrelax1)
                  or (z < zrelax2))
            if ok:
                zeros[f_s] = z_tot
                zeros.pop(f_p, None)
                del sf[s + 1]
                merged = True
                break  # rebuild sparent after each merge (simple, O(k^2))
    super_first = np.array(sf, dtype=np.int64)
    nsuper = len(super_first) - 1
    sparent, snode_of_col = build_sparent(super_first)

    # ---- per-supernode row patterns (merge-up over the supernode tree) ----
    # pattern(s) = cols(s) ∪ rows(A(:, cols(s)) below) ∪ (children patterns
    # minus their cols)
    Clow = C.transpose(values=False)  # lower triangle by columns
    rows: list = [None] * nsuper
    children: list = [[] for _ in range(nsuper)]
    for s in range(nsuper):
        if sparent[s] != -1:
            children[sparent[s]].append(s)
    for s in range(nsuper):
        f, l = super_first[s], super_first[s + 1]
        own = [np.arange(f, l, dtype=np.int64)]
        for j in range(f, l):
            rr = Clow.indices[Clow.indptr[j]:Clow.indptr[j + 1]]
            own.append(rr[rr >= l])
        for c in children[s]:
            rc = rows[c]
            own.append(rc[rc >= l])
        rows[s] = np.unique(np.concatenate(own))

    # ---- levels (supernode-tree depth) for batched execution ----
    level_of = np.zeros(nsuper, dtype=np.int64)
    for s in range(nsuper):  # children have smaller ids (postordered cols)
        p = sparent[s]
        if p != -1:
            level_of[p] = max(level_of[p], level_of[s] + 1)
    nlev = int(level_of.max()) + 1 if nsuper else 0
    levels = [np.flatnonzero(level_of == d) for d in range(nlev)]

    # ---- layout + stats ----
    Lpx = np.zeros(nsuper + 1, dtype=np.int64)
    fl = 0.0
    maxcsize = 0
    for s in range(nsuper):
        nr, nc = len(rows[s]), int(super_first[s + 1] - super_first[s])
        Lpx[s + 1] = Lpx[s] + nr * nc
        # dense panel flops: potrf + trsm + syrk-ish accounting
        fl += nc * nc * nc / 3.0 + (nr - nc) * nc * nc + (nr - nc) ** 2 * nc
        maxcsize = max(maxcsize, nr - nc)
    return SupernodalSymbolic(
        n=n, perm=perm, parent=parent, colcount=cc, nsuper=nsuper,
        super_first=super_first, sparent=sparent, rows=rows,
        snode_of_col=snode_of_col, levels=levels, level_of=level_of,
        lnz=int(Lpx[-1]), fl=float(fl), maxcsize=int(maxcsize), Lpx=Lpx)
