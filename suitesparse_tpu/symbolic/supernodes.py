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
from ..sparse import CSC
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

    from .. import native
    if native.available():
        # native path (cholmod_super_symbolic-speed; Python below is oracle)
        Clow = C.transpose(values=False)
        r = native.super_analyze(n, Clow.indptr, Clow.indices, parent, cc,
                                 config.nrelax, config.zrelax)
        nsuper = len(r["super_first"]) - 1
        rows_ptr, rows_cat = r["rows_ptr"], r["rows"]
        rows = [rows_cat[rows_ptr[s]:rows_ptr[s + 1]] for s in range(nsuper)]
        level_of = r["level_of"]
        nlev = int(level_of.max()) + 1 if nsuper else 0
        levels = [np.flatnonzero(level_of == d) for d in range(nlev)]
        return SupernodalSymbolic(
            n=n, perm=perm, parent=parent, colcount=cc, nsuper=nsuper,
            super_first=r["super_first"], sparent=r["sparent"], rows=rows,
            snode_of_col=r["snode_of_col"], levels=levels, level_of=level_of,
            lnz=int(r["lpx"][-1]), fl=r["fl"], maxcsize=r["maxcsize"],
            Lpx=r["lpx"])

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
    # Single right-to-left pass over fundamental supernodes. When processing
    # fundamental supernode s, the block headed by s+1 (if s merges into it)
    # has never been merged leftward yet, so s+1 always heads its block;
    # per-block height/zeros/entries are tracked exactly.
    nrelax0, nrelax1, nrelax2 = config.nrelax
    zrelax0, zrelax1, zrelax2 = config.zrelax
    ns_f = nsuper
    sf = super_first
    block_end = np.arange(1, ns_f + 1, dtype=np.int64)  # fund. index, exclusive
    height = np.array([cc[sf[s]] for s in range(ns_f)], dtype=np.int64)
    ncols_b = (sf[1:] - sf[:-1]).astype(np.int64)
    zeros_b = np.zeros(ns_f, dtype=np.int64)
    merged_into_next = np.zeros(ns_f, dtype=bool)
    for s in range(ns_f - 2, -1, -1):
        # does s's etree parent column live in the block headed by s+1?
        parent_col = parent[sf[s + 1] - 1]
        t = s + 1
        if parent_col == -1 or not (sf[t] <= parent_col < sf[block_end[t]]):
            continue
        nc_s = int(ncols_b[s])
        nc_t = int(ncols_b[t])
        nstot = nc_s + nc_t
        H = nc_s + int(height[t])
        cols_s = np.arange(sf[s], sf[s + 1])
        z_add = int(np.sum((H - np.arange(nc_s)) - cc[cols_s]))
        z_tot = int(zeros_b[s] + zeros_b[t]) + z_add
        tot = nstot * H - nstot * (nstot - 1) // 2
        z = z_tot / max(tot, 1)
        ok = (nstot <= nrelax0 or z_add == 0
              or (nstot <= nrelax1 and z < zrelax0)
              or (nstot <= nrelax2 and z < zrelax1)
              or (z < zrelax2))
        if ok:
            merged_into_next[s] = True
            block_end[s] = block_end[t]
            height[s] = H
            ncols_b[s] = nstot
            zeros_b[s] = z_tot
    # a block's head is its leftmost fundamental supernode: s heads a block
    # iff its LEFT neighbor did not merge into it
    heads = np.flatnonzero(np.concatenate([[True], ~merged_into_next[:-1]]))
    super_first = np.concatenate([sf[heads], [n]]).astype(np.int64)
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
