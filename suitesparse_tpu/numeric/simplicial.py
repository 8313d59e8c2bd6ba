"""Simplicial (column-at-a-time) Cholesky: symbolic + up-looking numeric + solves.

Host-side correctness core of the framework, the analog of the reference's
teaching-scale pipeline (``CSparse/Source/cs_schol.c``, ``cs_chol.c``,
``cs_lsolve.c``/``cs_ltsolve.c``; LDL' analog ``LDL/Source/ldl.c``; CHOLMOD's
simplicial path ``Cholesky/cholmod_rowfac.c:572``). Everything here is plain
numpy on host; the supernodal module builds the TPU execution path on top of
the same symbolic objects.

Numeric failure contract mirrors the reference: a non-positive pivot at column k
records ``minor = k`` and stops (reference ``cholmod_core.h:1609-1620``
``L->minor`` discipline) rather than raising deep inside the kernel.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..sparse import CSC, invert_permutation
from ..symbolic.etree import col_counts, ereach, etree, postorder

__all__ = [
    "SymbolicChol",
    "symbolic_cholesky",
    "chol_up",
    "ldl_up",
    "Factor",
    "lsolve",
    "ltsolve",
    "usolve",
    "utsolve",
    "chol_solve",
    "solve_system",
]


@dataclasses.dataclass
class SymbolicChol:
    """Result of Cholesky symbolic analysis (cs_schol / cholmod_analyze analog)."""

    n: int
    perm: np.ndarray        # fill-reducing permutation p: C = A(p,p)
    parent: np.ndarray      # etree of C
    post: np.ndarray        # postorder of the etree
    colcount: np.ndarray    # nnz per column of L (incl. diagonal)
    Lp: np.ndarray          # column pointers of L (cumulative colcount)
    lnz: int                # nnz(L)
    fl: float               # factorization flop count: sum colcount[j]^2

    @property
    def pinv(self) -> np.ndarray:
        return invert_permutation(self.perm)


def symbolic_cholesky(A: CSC, perm: np.ndarray | None = None) -> SymbolicChol:
    """Symbolic analysis of PAP' for upper-stored symmetric A.

    ``perm`` is the fill-reducing permutation (identity if None; callers get it
    from :mod:`suitesparse_tpu.ordering`)."""
    n = A.ncol
    assert A.sym == 1, "symbolic_cholesky expects upper-stored symmetric input"
    if perm is None:
        perm = np.arange(n, dtype=np.int64)
    C = A.symperm(perm) if not np.array_equal(perm, np.arange(n)) else A
    parent = etree(C)
    post = postorder(parent)
    cc = col_counts(C, parent, post)
    Lp = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(cc, out=Lp[1:])
    fl = float(np.sum(cc.astype(np.float64) ** 2))
    return SymbolicChol(n=n, perm=np.asarray(perm, dtype=np.int64), parent=parent,
                        post=post, colcount=cc, Lp=Lp, lnz=int(Lp[-1]), fl=fl)


@dataclasses.dataclass
class Factor:
    """Numeric factor: A(p,p) = L L' (or L D L' when ``d`` is present).

    ``L`` is lower-triangular CSC with the diagonal entry first in each column.
    ``minor`` = n on success, else the column where the factorization failed
    (reference ``L->minor`` semantics)."""

    L: CSC
    perm: np.ndarray
    d: np.ndarray | None = None    # LDL' diagonal (L unit-diagonal) if not None
    minor: int = -1

    @property
    def ok(self) -> bool:
        return self.minor == self.L.ncol


def chol_up(A: CSC, S: SymbolicChol) -> Factor:
    """Up-looking simplicial LL' of C = A(p,p) (cs_chol analog).

    Per column k: the pattern of L[k, :k] is the etree reach of C[:,k]; a sparse
    triangular solve against already-computed columns produces the row, then the
    pivot is sqrt of what remains."""
    n = S.n
    C = A.symperm(S.perm) if not np.array_equal(S.perm, np.arange(n)) else A
    cplx = np.iscomplexobj(C.data)
    dtype = np.complex128 if cplx else np.float64
    Lp = S.Lp
    Li = np.zeros(S.lnz, dtype=np.int64)
    Lx = np.zeros(S.lnz, dtype=dtype)
    # next write slot per column; diagonal reserved at Lp[k] (written last)
    fill = Lp[:-1].copy() + 1
    x = np.zeros(n, dtype=dtype)
    mark = np.full(n, -1, dtype=np.int64)
    reach_buf = np.zeros(n, dtype=np.int64)
    parent = S.parent
    minor = n
    for k in range(n):
        # scatter C[0:k+1, k] (upper storage ⇒ all rows <= k)
        top = ereach(C, k, parent, mark, reach_buf)
        lo, hi = C.indptr[k], C.indptr[k + 1]
        rows_k = C.indices[lo:hi]
        x[rows_k] = C.data[lo:hi]
        d = x[k].real if cplx else x[k]
        x[k] = 0.0
        for t in range(top, n):
            i = reach_buf[t]
            # forward-solve value y_i = x[i] / L[i,i] (diagonal is real > 0)
            yi = x[i] / Lx[Lp[i]].real
            x[i] = 0.0
            # x -= y_i * L[i+1:, i]
            p0, p1 = Lp[i] + 1, fill[i]
            x[Li[p0:p1]] -= yi * Lx[p0:p1]
            # store L[k, i] = conj(y_i) (A = L L^H for complex Hermitian)
            d -= (yi * np.conj(yi)).real if cplx else yi * yi
            q = fill[i]
            Li[q] = k
            Lx[q] = np.conj(yi) if cplx else yi
            fill[i] = q + 1
        if d <= 0.0 or not np.isfinite(d):
            minor = k
            # zero any dangling workspace entries before bailing
            x[:] = 0.0
            break
        Li[Lp[k]] = k
        Lx[Lp[k]] = np.sqrt(d)
    L = CSC(n, n, Lp, Li, Lx, 0)
    return Factor(L=L, perm=S.perm, d=None, minor=minor)


def ldl_up(A: CSC, S: SymbolicChol, dbound: float = 0.0) -> Factor:
    """Up-looking simplicial LDL' (LDL/ldl.c analog; handles indefinite D).

    Real-only (complex Hermitian input uses :func:`chol_up`)."""
    assert not np.iscomplexobj(A.data), "LDL' is real-only; use chol_up"
    n = S.n
    C = A.symperm(S.perm) if not np.array_equal(S.perm, np.arange(n)) else A
    Lp = S.Lp
    Li = np.zeros(S.lnz, dtype=np.int64)
    Lx = np.zeros(S.lnz, dtype=np.float64)
    D = np.zeros(n, dtype=np.float64)
    fill = Lp[:-1].copy() + 1
    x = np.zeros(n, dtype=np.float64)
    mark = np.full(n, -1, dtype=np.int64)
    reach_buf = np.zeros(n, dtype=np.int64)
    parent = S.parent
    minor = n
    for k in range(n):
        top = ereach(C, k, parent, mark, reach_buf)
        lo, hi = C.indptr[k], C.indptr[k + 1]
        x[C.indices[lo:hi]] = C.data[lo:hi]
        d = x[k]
        x[k] = 0.0
        for t in range(top, n):
            i = reach_buf[t]
            yi = x[i]          # solution of the unit-lower solve L y = C[:,k]
            lki = yi / D[i]
            x[i] = 0.0
            p0, p1 = Lp[i] + 1, fill[i]
            x[Li[p0:p1]] -= Lx[p0:p1] * yi
            d -= lki * yi
            q = fill[i]
            Li[q] = k
            Lx[q] = lki
            fill[i] = q + 1
        if d == 0.0 or not np.isfinite(d):
            minor = k
            x[:] = 0.0
            break
        if dbound > 0.0 and abs(d) < dbound:
            d = dbound if d >= 0 else -dbound
        D[k] = d
        Li[Lp[k]] = k
        Lx[Lp[k]] = 1.0
    L = CSC(n, n, Lp, Li, Lx, 0)
    return Factor(L=L, perm=S.perm, d=D, minor=minor)


# ---------------- triangular solves (host CSC kernels) ----------------

def _native_tri(kind: str, M: CSC, x: np.ndarray) -> bool:
    """Run the native host sweep when eligible (real f64, single RHS)."""
    if x.ndim != 1 or np.iscomplexobj(x) or np.iscomplexobj(M.data):
        return False
    from .. import native
    if not native.available():
        return False
    getattr(native, kind)(M.ncol, M.indptr, M.indices,
                          np.ascontiguousarray(M.data, dtype=np.float64), x)
    return True


def lsolve(L: CSC, b: np.ndarray) -> np.ndarray:
    """x = L \\ b for lower-triangular CSC L with diagonal entry first per column
    (cs_lsolve analog). Works for multiple RHS (b 2-D)."""
    cplx = np.iscomplexobj(L.data) or np.iscomplexobj(b)
    x = np.array(b, dtype=np.complex128 if cplx else np.float64, copy=True)
    if _native_tri("lsolve", L, x):
        return x
    Lp, Li, Lx = L.indptr, L.indices, L.data
    for j in range(L.ncol):
        p0 = Lp[j]
        x[j] = x[j] / Lx[p0]
        p1 = Lp[j + 1]
        if p1 > p0 + 1:
            rows = Li[p0 + 1:p1]
            if x.ndim == 1:
                x[rows] -= Lx[p0 + 1:p1] * x[j]
            else:
                x[rows] -= np.outer(Lx[p0 + 1:p1], x[j])
    return x


def ltsolve(L: CSC, b: np.ndarray) -> np.ndarray:
    """x = L' \\ b (cs_ltsolve analog); conjugate-transpose solve L^H x = b
    for complex factors."""
    cplx = np.iscomplexobj(L.data) or np.iscomplexobj(b)
    x = np.array(b, dtype=np.complex128 if cplx else np.float64, copy=True)
    if not cplx and _native_tri("ltsolve", L, x):
        return x
    Lp, Li, Lx = L.indptr, L.indices, np.conj(L.data) if cplx else L.data
    for j in range(L.ncol - 1, -1, -1):
        p0, p1 = Lp[j], Lp[j + 1]
        if p1 > p0 + 1:
            rows = Li[p0 + 1:p1]
            if x.ndim == 1:
                x[j] -= np.dot(Lx[p0 + 1:p1], x[rows])
            else:
                x[j] -= Lx[p0 + 1:p1] @ x[rows]
        x[j] = x[j] / Lx[p0]
    return x


def usolve(U: CSC, b: np.ndarray) -> np.ndarray:
    """x = U \\ b for upper-triangular CSC U with the diagonal entry LAST in
    each column (cs_usolve analog)."""
    cplx = np.iscomplexobj(U.data) or np.iscomplexobj(b)
    x = np.array(b, dtype=np.complex128 if cplx else np.float64, copy=True)
    if _native_tri("usolve", U, x):
        return x
    Up, Ui, Ux = U.indptr, U.indices, U.data
    for j in range(U.ncol - 1, -1, -1):
        p0, p1 = Up[j], Up[j + 1]
        x[j] = x[j] / Ux[p1 - 1]
        if p1 - 1 > p0:
            rows = Ui[p0:p1 - 1]
            if x.ndim == 1:
                x[rows] -= Ux[p0:p1 - 1] * x[j]
            else:
                x[rows] -= np.outer(Ux[p0:p1 - 1], x[j])
    return x


def utsolve(U: CSC, b: np.ndarray) -> np.ndarray:
    """x = U' \\ b (conjugate transpose for complex factors)."""
    cplx = np.iscomplexobj(U.data) or np.iscomplexobj(b)
    x = np.array(b, dtype=np.complex128 if cplx else np.float64, copy=True)
    if not cplx and _native_tri("utsolve", U, x):
        return x
    Up, Ui, Ux = U.indptr, U.indices, np.conj(U.data) if cplx else U.data
    for j in range(U.ncol):
        p0, p1 = Up[j], Up[j + 1]
        if p1 - 1 > p0:
            rows = Ui[p0:p1 - 1]
            if x.ndim == 1:
                x[j] -= np.dot(Ux[p0:p1 - 1], x[rows])
            else:
                x[j] -= Ux[p0:p1 - 1] @ x[rows]
        x[j] = x[j] / Ux[p1 - 1]
    return x


def chol_solve(F: Factor, b: np.ndarray) -> np.ndarray:
    """x = A \\ b given A(p,p) = LL' (or LDL'): x = P'(L' \\ (D \\ (L \\ Pb)))."""
    assert F.ok, f"factorization failed at column {F.minor}"
    pb = np.asarray(b)[F.perm]

    y = lsolve(F.L, pb)
    if F.d is not None:
        y = (y.T / F.d).T if y.ndim > 1 else y / F.d
    z = ltsolve(F.L, y)
    x = np.empty_like(z)
    x[F.perm] = z
    return x


def solve_system(F: Factor, b: np.ndarray, sys: str = "A") -> np.ndarray:
    """The reference's nine solve systems (cholmod_solve, systems enumerated
    ``cholmod_cholesky.h:179-187``). For an LL' factor D = I; for an LDL'
    factor L is unit lower and ``F.d`` holds D.

    sys: "A"    x = P' (L' \\ (D \\ (L \\ (P b))))   — solve Ax=b
         "LDLt" x = L' \\ (D \\ (L \\ b))           — no permutation
         "LD"   x = D \\ (L \\ b)
         "DLt"  x = L' \\ (D \\ b)
         "L"    x = L \\ b
         "Lt"   x = L' \\ b
         "D"    x = D \\ b
         "P"    x = P b   (permute)
         "Pt"   x = P' b  (inverse permute)
    """
    assert F.ok, f"factorization failed at column {F.minor}"
    b = np.asarray(b, dtype=np.complex128 if np.iscomplexobj(F.L.data)
                   or np.iscomplexobj(b) else np.float64)
    if sys == "A":
        return chol_solve(F, b)
    if sys == "P":
        return b[F.perm]
    if sys == "Pt":
        x = np.empty_like(b)
        x[F.perm] = b
        return x

    def dsolve(y):
        if F.d is None:
            return y
        return (y.T / F.d).T if y.ndim > 1 else y / F.d

    if sys == "LDLt":
        return ltsolve(F.L, dsolve(lsolve(F.L, b)))
    if sys == "LD":
        return dsolve(lsolve(F.L, b))
    if sys == "DLt":
        return ltsolve(F.L, dsolve(b))
    if sys == "L":
        return lsolve(F.L, b)
    if sys == "Lt":
        return ltsolve(F.L, b)
    if sys == "D":
        return dsolve(b)
    raise ValueError(f"unknown system {sys!r}")
