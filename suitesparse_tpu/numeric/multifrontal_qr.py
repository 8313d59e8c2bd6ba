"""Multifrontal QR (SPQR-class path, TPU-first).

Reference analog: SPQR (``spqr_analyze.cpp`` front tree over the column etree
of A'A; ``spqr_kernel.cpp``/``spqr_front.cpp`` staircase Householder fronts;
``spqr_rhpack``/``spqr_cpack`` R and contribution-block packing). Re-designed
like the other multifrontal paths here:

  * the front tree IS the supernodal structure of chol(A'A) (R = L'), reusing
    :func:`..symbolic.supernodes.analyze_supernodal` on the A'A pattern;
  * front s stacks (a) the original A rows whose LEFTMOST column lies in the
    supernode and (b) the children's contribution blocks (their R rows beyond
    their own pivot columns); one dense QR per front yields the final R rows
    of the supernode plus the contribution block for the parent — every shape
    is STRUCTURAL (row counts are data-independent), so the device path runs
    level-batched padded ``jnp.linalg.qr``;
  * Q is not stored (SPQR's Q-less economy mode): the right-hand side rides
    along as extra front columns and is transformed in place — the standard
    "apply Q' to B during factorization" contract
    (``SuiteSparseQR`` with ``getCTX=..`` modes).

Least-squares solve: after factorization, x = R \\ y by the level-scheduled
backward substitution over the supernode tree.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..config import Config, DEFAULT, Ordering
from ..sparse import CSC, from_triplets
from ..symbolic.supernodes import SupernodalSymbolic, analyze_supernodal

__all__ = ["QRSymbolicMF", "analyze_mfqr", "factorize_qr_host", "qr_mf_solve",
           "mfqrsol"]


@dataclasses.dataclass
class QRSymbolicMF:
    """Front-tree analysis for multifrontal QR of A (m x n, m >= n)."""

    S: SupernodalSymbolic          # supernodal structure of chol(A'A)
    q: np.ndarray                  # column permutation (== S.perm)
    row_front: np.ndarray          # original A row -> owning supernode (-1 none)
    front_arows: list              # per supernode: original A row ids
    front_m: np.ndarray            # structural row count of each front
    front_k: np.ndarray            # rows of R produced (min(m, ncols_front))
    cb_rows: np.ndarray            # contribution-block rows passed to parent


@dataclasses.dataclass
class MFQRFactor:
    """R panels per supernode + transformed rhs ('y') rows."""

    SQ: QRSymbolicMF
    Rpanels: list                  # per supernode: (k x nfcols) dense R rows
    Ypanels: list                  # per supernode: (k x nrhs) transformed rhs
    rank_est: int


def analyze_mfqr(A: CSC, config: Config = DEFAULT,
                 q: np.ndarray | None = None) -> QRSymbolicMF:
    m, n = A.shape
    assert m >= n, "multifrontal QR expects m >= n (transpose for min-norm)"
    # column order + A'A pattern supernodal analysis
    if q is None:
        if config.ordering in (Ordering.NATURAL, Ordering.GIVEN):
            q = np.arange(n, dtype=np.int64)
        else:
            from ..ordering.colamd import colamd_order
            q = colamd_order(A, config)
    # build pattern of A'A (upper) for the supernodal analysis
    Aq = A.permuted(None, q)
    AtA = _ata_pattern_upper(Aq)
    S = analyze_supernodal(AtA, np.arange(n, dtype=np.int64), config)
    # fold the analysis postorder into q
    q = q[S.perm]
    Aq = A.permuted(None, q)
    # assign every A row to the supernode owning its leftmost column
    AqT = Aq.transpose(values=False)
    row_front = np.full(m, -1, dtype=np.int64)
    for r in range(m):
        lo, hi = AqT.indptr[r], AqT.indptr[r + 1]
        if hi > lo:
            row_front[r] = S.snode_of_col[AqT.indices[lo:hi].min()]
    front_arows = [np.flatnonzero(row_front == s) for s in range(S.nsuper)]
    # structural row counts bottom-up
    front_m = np.zeros(S.nsuper, dtype=np.int64)
    front_k = np.zeros(S.nsuper, dtype=np.int64)
    cb_rows = np.zeros(S.nsuper, dtype=np.int64)
    for s in range(S.nsuper):
        nf = len(S.rows[s])
        nc = S.ncols(s)
        mrows = len(front_arows[s])
        # children have smaller ids (postordered)
        mrows += sum(int(cb_rows[c]) for c in range(s)
                     if S.sparent[c] == s)
        front_m[s] = mrows
        front_k[s] = min(mrows, nf)
        cb_rows[s] = max(0, int(front_k[s]) - nc)
    SQ = QRSymbolicMF(S=S, q=q, row_front=row_front, front_arows=front_arows,
                      front_m=front_m, front_k=front_k, cb_rows=cb_rows)
    # normalize S.perm to identity in the folded space (q carries everything)
    return SQ


def _ata_pattern_upper(A: CSC) -> CSC:
    """Pattern of A'A as upper-stored CSC with unit values (+ diagonal)."""
    n = A.ncol
    AT = A.transpose(values=False)
    rows_l, cols_l = [], []
    for i in range(A.nrow):
        lo, hi = AT.indptr[i], AT.indptr[i + 1]
        js = AT.indices[lo:hi]
        if js.size < 2:
            continue
        i0, i1 = np.triu_indices(js.size, 1)
        rows_l.append(js[i0])
        cols_l.append(js[i1])
    rows_l.append(np.arange(n, dtype=np.int64))
    cols_l.append(np.arange(n, dtype=np.int64))
    r = np.concatenate(rows_l)
    c = np.concatenate(cols_l)
    return from_triplets(n, n, r, c, np.ones(r.size), sym=1)


def factorize_qr_host(A: CSC, SQ: QRSymbolicMF, b: np.ndarray,
                      config: Config = DEFAULT) -> MFQRFactor:
    """Numpy multifrontal QR with rhs transform (oracle / host path)."""
    S = SQ.S
    Aq = A.permuted(None, SQ.q)
    AqT = Aq.transpose()
    b = np.asarray(b, dtype=np.float64)
    one_d = b.ndim == 1
    bb = b.reshape(-1, 1) if one_d else b
    nrhs = bb.shape[1]

    Rpanels: list = [None] * S.nsuper
    Ypanels: list = [None] * S.nsuper
    cb_store: dict = {}
    tol = config.qr_tol
    if tol < 0:
        maxnorm = 0.0
        for j in range(Aq.ncol):
            v = Aq.vals_of(j)
            if v.size:
                maxnorm = max(maxnorm, float(np.linalg.norm(v)))
        tol = 20.0 * (A.nrow + A.ncol) * np.finfo(np.float64).eps * maxnorm
    rank_est = 0

    for s in range(S.nsuper):
        cols = S.rows[s]               # front columns (global, permuted space)
        nf = len(cols)
        nc = S.ncols(s)
        arows = SQ.front_arows[s]
        blocks = []
        yblocks = []
        # original A rows (spread over front columns)
        for r in arows:
            row = np.zeros(nf)
            lo, hi = AqT.indptr[r], AqT.indptr[r + 1]
            pos = np.searchsorted(cols, AqT.indices[lo:hi])
            row[pos] = AqT.data[lo:hi]
            blocks.append(row)
            yblocks.append(bb[r])
        # children contribution blocks
        for c in range(s):
            if S.sparent[c] != s or int(SQ.cb_rows[c]) == 0:
                continue
            CB, CBy, cbcols = cb_store.pop(c)
            pos = np.searchsorted(cols, cbcols)
            blk = np.zeros((CB.shape[0], nf))
            blk[:, pos] = CB
            blocks.append(blk)
            yblocks.append(CBy)
        F = np.vstack([np.atleast_2d(x) for x in blocks]) if blocks else \
            np.zeros((0, nf))
        Y = np.vstack([np.atleast_2d(y) for y in yblocks]) if yblocks else \
            np.zeros((0, nrhs))
        mloc = F.shape[0]
        k = min(mloc, nf)
        if mloc:
            # dense Householder QR with rhs transform: [R; 0], Q'Y
            Qf, Rf = np.linalg.qr(F, mode="complete")
            Yt = Qf.T @ Y
        else:
            Rf = np.zeros((0, nf))
            Yt = np.zeros((0, nrhs))
        # final R rows of the supernode (zero-padded if the front is short)
        Rpanels[s] = (Rf[:nc, :] if mloc >= nc else
                      np.vstack([Rf[:mloc, :], np.zeros((nc - mloc, nf))]))
        Ypanels[s] = Yt[:nc, :] if mloc >= nc else \
            np.vstack([Yt[:mloc, :], np.zeros((nc - mloc, nrhs))])
        rank_est += int(np.sum(np.abs(np.diag(Rpanels[s][:, :nc])) > tol))
        mu = int(SQ.cb_rows[s])
        if mu > 0:
            cb_store[s] = (Rf[nc:nc + mu, nc:], Yt[nc:nc + mu, :],
                           cols[nc:])
    return MFQRFactor(SQ=SQ, Rpanels=Rpanels, Ypanels=Ypanels,
                      rank_est=rank_est)


def qr_mf_solve(F: MFQRFactor) -> np.ndarray:
    """x = R \\ y by level-scheduled backward substitution (root -> leaves)."""
    SQ = F.SQ
    S = SQ.S
    n = S.n
    nrhs = F.Ypanels[0].shape[1] if S.nsuper else 1
    x = np.zeros((n, nrhs))
    for s in range(S.nsuper - 1, -1, -1):
        cols = S.rows[s]
        nc = S.ncols(s)
        f = int(S.super_first[s])
        R = F.Rpanels[s]
        rhs = F.Ypanels[s].copy()
        if len(cols) > nc:
            rhs -= R[:, nc:] @ x[cols[nc:]]
        R11 = R[:nc, :nc]
        # upper-triangular solve; zero diagonal (rank deficiency) -> zero x
        for kk in range(nc - 1, -1, -1):
            acc = rhs[kk] - R11[kk, kk + 1:nc] @ x[f + kk + 1:f + nc]
            d = R11[kk, kk]
            x[f + kk] = acc / d if d != 0.0 else 0.0
    xout = np.zeros_like(x)
    xout[SQ.q] = x
    return xout


def mfqrsol(A: CSC, b: np.ndarray, config: Config = DEFAULT) -> np.ndarray:
    """Least-squares min ||Ax - b|| via multifrontal QR (m >= n)."""
    SQ = analyze_mfqr(A, config)
    F = factorize_qr_host(A, SQ, b, config)
    x = qr_mf_solve(F)
    return x[:, 0] if np.asarray(b).ndim == 1 else x
