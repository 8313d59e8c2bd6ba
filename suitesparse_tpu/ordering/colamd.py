"""Column ordering for LU/QR: fill-reducing order of A'A.

Reference analog: the COLAMD package (``COLAMD/Source/colamd.c`` — column
approximate minimum degree computed WITHOUT forming A'A). This implementation
takes the complementary route that reuses the native AMD engine: drop dense
rows (which would densify A'A — same role as COLAMD's dense-row handling),
form the pattern of A'A for the remaining rows, and run AMD on it. Quality is
comparable on the target workloads; a dedicated row-list COLAMD engine can
replace the inner step without changing this interface.
"""

from __future__ import annotations

import numpy as np

from ..config import Config, DEFAULT
from ..sparse import CSC, from_triplets
from .amd import amd_order

__all__ = ["colamd_order", "ccolamd_order", "symamd_order", "csymamd_order"]


def _ata_pattern(A: CSC, config: Config) -> CSC:
    """Pattern of A'A with dense rows dropped (COLAMD's dense-row handling)."""
    m, n = A.nrow, A.ncol
    Ag = A.to_full_storage() if A.sym != 0 else A
    # drop dense rows: they make A'A dense without guiding the ordering
    row_counts = np.bincount(Ag.indices, minlength=m)
    cut = max(16.0, config.colamd_dense_row * np.sqrt(max(n, 1)))
    keep_rows = row_counts < cut
    cols = np.repeat(np.arange(n, dtype=np.int64), np.diff(Ag.indptr))
    sel = keep_rows[Ag.indices]
    Af = from_triplets(m, n, Ag.indices[sel], cols[sel], np.ones(int(sel.sum())))
    # pattern of A'A via row-wise expansion (vectorized per row)
    At = Af.transpose(values=False)
    rr, cc = [], []
    for i in range(m):
        lo, hi = At.indptr[i], At.indptr[i + 1]
        if hi - lo < 2:
            continue
        js = At.indices[lo:hi]
        # clique edges (j0, j1) for j0 < j1 — A'A pattern contribution of row i
        k = js.size
        i0, i1 = np.triu_indices(k, 1)
        rr.append(js[i0])
        cc.append(js[i1])
    if rr:
        r = np.concatenate(rr + cc)
        c = np.concatenate(cc + rr)
        return from_triplets(n, n, r, c, np.ones(r.size))
    return from_triplets(n, n, [], [], [])


def colamd_order(A: CSC, config: Config = DEFAULT) -> np.ndarray:
    """Fill-reducing column permutation q for LU/QR of A (colamd analog)."""
    n = A.ncol
    if n == 0:
        return np.empty(0, dtype=np.int64)
    S = _ata_pattern(A, config)
    from .. import native
    if native.available():
        return native.amd(S.indptr, S.indices, n, dense=config.colamd_dense_col)
    from .amd import _amd_python
    return _amd_python(S, dense=config.colamd_dense_col)


def ccolamd_order(A: CSC, cset: np.ndarray,
                  config: Config = DEFAULT) -> np.ndarray:
    """Constrained COLAMD (CCOLAMD analog, ``ccolamd.h``): column ordering for
    LU/QR where each output column block stays within one constraint set,
    sets emitted in ascending order — used by SPQR/NESDIS to post-order
    partitioned problems. Route: A'A pattern (dense rows dropped) + CAMD."""
    n = A.ncol
    if n == 0:
        return np.empty(0, dtype=np.int64)
    from . import camd_order
    S = _ata_pattern(A, config)  # full-storage symmetric pattern
    return camd_order(S, cset, config)


def symamd_order(A: CSC, config: Config = DEFAULT) -> np.ndarray:
    """SYMAMD analog (``colamd.h`` symamd): ordering for a symmetric matrix
    via the column engine. Here the AMD engine on pattern(A+A') plays that
    role directly (the reference routes through colamd on a skeleton)."""
    from .amd import amd_order
    return amd_order(A, config)


def csymamd_order(A: CSC, cset: np.ndarray,
                  config: Config = DEFAULT) -> np.ndarray:
    """CSYMAMD analog (``ccolamd.h`` csymamd): constrained symmetric ordering."""
    from . import camd_order
    return camd_order(A, cset, config)
