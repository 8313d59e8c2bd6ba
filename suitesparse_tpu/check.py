"""Deep structural validation and debug printing.

Reference analog: ``CHOLMOD/Check/cholmod_check.c`` (invariant checks +
``cholmod_print_*`` for every object type), ``AMD/Source/amd_valid.c``,
``KLU/Source/klu_dump.c``. Used as test oracles and for user-facing
diagnostics; every check raises ``AssertionError`` with a specific message.
"""

from __future__ import annotations

import numpy as np

from .sparse import CSC

__all__ = ["check_sparse", "check_perm", "check_factor", "check_symbolic",
           "sprint"]


def check_sparse(A: CSC) -> None:
    A.check()


def check_perm(p: np.ndarray, n: int) -> None:
    p = np.asarray(p)
    assert p.shape == (n,), f"perm shape {p.shape} != ({n},)"
    assert np.array_equal(np.sort(p), np.arange(n)), "not a permutation"


def check_factor(F) -> None:
    """Validate a simplicial/supernodal Cholesky factor object."""
    L = F.L
    n = L.ncol
    check_perm(F.perm, n)
    assert L.nrow == n
    for j in range(n):
        p0, p1 = L.indptr[j], L.indptr[j + 1]
        assert p1 > p0, f"column {j} empty"
        assert L.indices[p0] == j, f"column {j}: diagonal not first"
        assert np.all(L.indices[p0 + 1:p1] > j), f"column {j}: upper entries"
    if getattr(F, "d", None) is None and F.ok:
        diag = np.array([L.data[L.indptr[j]] for j in range(n)])
        assert np.all(diag > 0), "LL' factor with non-positive diagonal"


def check_symbolic(S) -> None:
    n = S.n
    check_perm(S.perm, n)
    parent = S.parent
    assert parent.shape == (n,)
    assert np.all((parent == -1) | (parent > np.arange(n))), \
        "etree parent must exceed child"
    cc = S.colcount
    assert np.all(cc >= 1) and np.all(cc <= n - np.arange(n)), \
        "column counts out of range"


def sprint(A: CSC, name: str = "A", max_entries: int = 20) -> str:
    """Compact printable summary (cholmod_print_sparse analog, print level 3)."""
    lines = [f"{name}: {A.nrow}-by-{A.ncol}, nnz {A.nnz}, "
             f"sym {A.sym}, dtype {A.data.dtype}"]
    cols = np.repeat(np.arange(A.ncol, dtype=np.int64), np.diff(A.indptr))
    for t in range(min(A.nnz, max_entries)):
        lines.append(f"  ({A.indices[t]}, {cols[t]}) {A.data[t]:.6g}")
    if A.nnz > max_entries:
        lines.append(f"  ... {A.nnz - max_entries} more")
    return "\n".join(lines)
