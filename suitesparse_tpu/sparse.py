"""Host-side sparse matrix containers and structural ops.

TPU-native analog of the reference object model (``cholmod_sparse`` CSC struct,
reference ``CHOLMOD/Include/cholmod_core.h:1214-1263``; triplet ``:2091-2152``; the
CSparse ``cs`` struct, ``CSparse/Include/cs.h:37-58``). Differences by design:

* indices are always int64 numpy arrays (the reference's ``SuiteSparse_long``
  discipline — nnz(L) of audikw_1-class matrices overflows int32),
* values are a numpy array of any float dtype on host; device execution converts
  to the configured compute dtype,
* everything is immutable-by-convention and vectorized — no per-entry Python loops
  in structural kernels (compress, transpose, permute are O(nnz) numpy),
* device mirrors are produced on demand (`to_device_*`) rather than stored.

Structural routines covered here and their reference analogs:
  from_triplets      — cholmod_triplet_to_sparse / cs_compress (cs_compress.c)
  transpose          — cholmod_transpose / cs_transpose (cs_transpose.c)
  permuted (PAQ')    — cholmod_ptranspose (Core/cholmod_transpose.c)
  symperm (PAP')     — cs_symperm (cs_symperm.c) / cholmod_ptranspose sym case
  add, multiply      — cholmod_add / cholmod_ssmult (MatrixOps)
  aat_pattern        — cholmod_aat / AMD's amd_aat (pattern of A+A')
  norms              — cholmod_norm (MatrixOps/cholmod_norm.c)
"""

from __future__ import annotations

import dataclasses

import numpy as np

__all__ = [
    "CSC",
    "from_triplets",
    "from_dense",
    "eye",
    "residual_norm",
    "invert_permutation",
    "horzcat",
    "vertcat",
]


def _as_index(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, dtype=np.int64))


@dataclasses.dataclass
class CSC:
    """Compressed sparse column matrix.

    ``indices[indptr[j]:indptr[j+1]]`` are the row indices of column j, sorted
    ascending with no duplicates; ``data`` holds matching values. ``nrow × ncol``.
    ``sym`` mirrors cholmod's ``stype`` (reference ``cholmod_core.h:1240-1263``):
    0 = unsymmetric/general, 1 = symmetric with only upper part stored,
    -1 = symmetric with only lower part stored.
    """

    nrow: int
    ncol: int
    indptr: np.ndarray   # int64, size ncol+1
    indices: np.ndarray  # int64, size nnz
    data: np.ndarray     # float, size nnz
    sym: int = 0

    # ---------------- basic properties ----------------

    @property
    def nnz(self) -> int:
        return int(self.indptr[-1])

    @property
    def shape(self) -> tuple[int, int]:
        return (self.nrow, self.ncol)

    def copy(self) -> "CSC":
        return CSC(self.nrow, self.ncol, self.indptr.copy(), self.indices.copy(),
                   self.data.copy(), self.sym)

    def pattern_key(self) -> tuple:
        """Cheap pattern fingerprint: (nnz, sym, crc32(indptr||indices)).

        Cache key for the analyze-once/factor-many value maps — two matrices
        of equal nnz but different pattern must never share a cached position
        map (would silently gather wrong values). crc32 runs ~1.3 ms/500k
        int64 entries; memoized per indices-array identity."""
        import zlib

        memo = getattr(self, "_pat_key", None)
        if memo is None or memo[0] is not self.indices:
            crc = zlib.crc32(np.ascontiguousarray(self.indptr))
            crc = zlib.crc32(np.ascontiguousarray(self.indices), crc)
            memo = (self.indices, (self.nnz, self.sym, crc))
            self._pat_key = memo
        return memo[1]

    def check(self) -> None:
        """Structural invariant check (cholmod_check_sparse analog,
        reference ``CHOLMOD/Check/cholmod_check.c``)."""
        assert self.indptr.ndim == 1 and self.indptr.size == self.ncol + 1
        assert self.indptr[0] == 0
        assert np.all(np.diff(self.indptr) >= 0), "indptr not monotone"
        nnz = self.nnz
        assert self.indices.size == nnz and self.data.size == nnz
        if nnz:
            assert self.indices.min() >= 0 and self.indices.max() < self.nrow
        for j in range(self.ncol):
            col = self.indices[self.indptr[j]:self.indptr[j + 1]]
            assert np.all(np.diff(col) > 0), f"col {j} unsorted or duplicated"

    # ---------------- conversions ----------------

    def to_dense(self) -> np.ndarray:
        A = np.zeros((self.nrow, self.ncol), dtype=self.data.dtype)
        cols = np.repeat(np.arange(self.ncol), np.diff(self.indptr))
        A[self.indices, cols] = self.data
        if self.sym != 0:
            # reflect the stored triangle (Hermitian for complex data,
            # matching the CHOLMOD stype convention)
            mirror = A.conj().T if np.iscomplexobj(A) else A.T
            full = A + mirror
            d = np.arange(min(self.nrow, self.ncol))
            full[d, d] = A[d, d]
            return full
        return A

    def col_lengths(self) -> np.ndarray:
        return np.diff(self.indptr)

    def rows_of(self, j: int) -> np.ndarray:
        return self.indices[self.indptr[j]:self.indptr[j + 1]]

    def vals_of(self, j: int) -> np.ndarray:
        return self.data[self.indptr[j]:self.indptr[j + 1]]

    # ---------------- structural kernels (vectorized) ----------------

    def transpose(self, values: bool = True) -> "CSC":
        """A' in CSC form (== A in CSR). Counting-sort, O(nnz).

        Reference analog: ``cs_transpose.c`` / ``Core/cholmod_transpose.c``.
        """
        from . import native
        if native.available() and hasattr(native._load(), "sstpu_transpose"):
            outp, outi, pos = native.transpose(self.nrow, self.ncol,
                                               self.indptr, self.indices)
            data = (self.data[pos] if values
                    else np.zeros(len(outi), self.data.dtype))
            return CSC(self.ncol, self.nrow, outp, outi, data, -self.sym)
        cols = np.repeat(np.arange(self.ncol, dtype=np.int64), np.diff(self.indptr))
        order = np.argsort(self.indices, kind="stable")
        new_indices = cols[order]
        new_data = self.data[order] if values else np.empty(0, self.data.dtype)
        counts = np.bincount(self.indices, minlength=self.nrow)
        indptr = np.zeros(self.nrow + 1, dtype=np.int64)
        np.cumsum(counts, out=indptr[1:])
        return CSC(self.ncol, self.nrow, indptr, new_indices,
                   new_data if values else np.zeros(len(new_indices), self.data.dtype),
                   -self.sym)

    def permuted(self, p: np.ndarray | None, q: np.ndarray | None,
                 values: bool = True) -> "CSC":
        """C = P A Q' i.e. C[i,j] = A[p[i], q[j]] for row perm p, col perm q.

        For ``sym != 0`` inputs use :meth:`symperm`. Reference analog:
        ``cs_permute.c`` / ``cholmod_ptranspose``.
        """
        assert self.sym == 0, "use symperm for symmetric-stored matrices"
        n, m = self.nrow, self.ncol
        pinv = invert_permutation(p) if p is not None else None
        q = _as_index(q) if q is not None else np.arange(m, dtype=np.int64)
        # gather columns in q order
        col_starts = self.indptr[q]
        col_lens = self.indptr[q + 1] - col_starts
        indptr = np.zeros(m + 1, dtype=np.int64)
        np.cumsum(col_lens, out=indptr[1:])
        gather = _concat_ranges(col_starts, col_lens)
        rows = self.indices[gather]
        if pinv is not None:
            rows = pinv[rows]
        data = self.data[gather] if values else self.data[gather]
        # re-sort rows within each column: double transpose via the native
        # O(nnz) counting kernel when available (lexsort cost ~0.14 s at
        # nnz=500k — it was most of klu-path factor_lu's overhead)
        from . import native
        if native.available() and hasattr(native._load(), "sstpu_transpose"):
            tp, ti, tpos = native.transpose(n, m, indptr, rows)
            op, oi, opos = native.transpose(m, n, tp, ti)
            assert np.array_equal(op, indptr)
            return CSC(n, m, indptr, oi, data[tpos][opos], 0)
        out = CSC(n, m, indptr, rows, data, 0)
        return out._sort_indices()

    def permuted_map(self, p: np.ndarray | None, q: np.ndarray | None):
        """(indptr, indices, pos) of C = P A Q': pattern plus the data
        position map (C.data = A.data[pos]) — cache it once per pattern and
        a refactorization is one gather (klu_refactor's analyze-once
        discipline applied to the permutation plumbing)."""
        assert self.sym == 0, "use symperm for symmetric-stored matrices"
        n, m = self.nrow, self.ncol
        pinv = invert_permutation(p) if p is not None else None
        q = _as_index(q) if q is not None else np.arange(m, dtype=np.int64)
        col_starts = self.indptr[q]
        col_lens = self.indptr[q + 1] - col_starts
        indptr = np.zeros(m + 1, dtype=np.int64)
        np.cumsum(col_lens, out=indptr[1:])
        gather = _concat_ranges(col_starts, col_lens)
        rows = self.indices[gather]
        if pinv is not None:
            rows = pinv[rows]
        from . import native
        if native.available() and hasattr(native._load(), "sstpu_transpose"):
            tp, ti, tpos = native.transpose(n, m, indptr, rows)
            op, oi, opos = native.transpose(m, n, tp, ti)
            return indptr, oi, gather[tpos][opos]
        cols = np.repeat(np.arange(m, dtype=np.int64), np.diff(indptr))
        order = np.lexsort((rows, cols))
        return indptr, rows[order], gather[order]

    def symperm(self, p: np.ndarray) -> "CSC":
        """C = P A P' keeping only the upper triangle, for symmetric A stored
        upper (``sym=1``). Reference analog: ``cs_symperm.c``."""
        assert self.sym == 1, "symperm expects upper-stored symmetric"
        n = self.ncol
        pinv = invert_permutation(p)
        from . import native
        if native.available() and hasattr(native._load(), "sstpu_symperm"):
            outp, outi, pos = native.symperm(n, self.indptr, self.indices,
                                             pinv)
            flip = pos < 0
            pos = np.where(flip, ~pos, pos)
            data = self.data[pos]
            if np.iscomplexobj(data):
                data = np.where(flip, np.conj(data), data)
            return CSC(n, n, outp, outi, data, 1)
        cols = np.repeat(np.arange(n, dtype=np.int64), np.diff(self.indptr))
        i2 = pinv[self.indices]
        j2 = pinv[cols]
        # keep entry in upper triangle of C: row=min, col=max; entries that
        # flip triangles conjugate under the Hermitian convention
        r = np.minimum(i2, j2)
        c = np.maximum(i2, j2)
        x = self.data
        if np.iscomplexobj(x):
            x = np.where(i2 > j2, np.conj(x), x)
        return from_triplets(n, n, r, c, x, sym=1)

    def _sort_indices(self) -> "CSC":
        """Sort row indices within each column (stable lexsort over (col,row))."""
        cols = np.repeat(np.arange(self.ncol, dtype=np.int64), np.diff(self.indptr))
        order = np.lexsort((self.indices, cols))
        return CSC(self.nrow, self.ncol, self.indptr, self.indices[order],
                   self.data[order], self.sym)

    def drop_zeros(self, tol: float = 0.0) -> "CSC":
        """Drop stored entries with |x| <= tol (cholmod_drop analog)."""
        keep = np.abs(self.data) > tol
        cols = np.repeat(np.arange(self.ncol, dtype=np.int64), np.diff(self.indptr))
        counts = np.bincount(cols[keep], minlength=self.ncol)
        indptr = np.zeros(self.ncol + 1, dtype=np.int64)
        np.cumsum(counts, out=indptr[1:])
        return CSC(self.nrow, self.ncol, indptr, self.indices[keep],
                   self.data[keep], self.sym)

    def band(self, k1: int, k2: int) -> "CSC":
        """Entries within diagonals k1..k2 inclusive (cholmod_band analog)."""
        A = self.to_full_storage() if self.sym != 0 else self
        cols = np.repeat(np.arange(A.ncol, dtype=np.int64), np.diff(A.indptr))
        d = cols - A.indices
        return A._filter((d >= k1) & (d <= k2))

    def tril(self, k: int = 0) -> "CSC":
        keep = self.indices >= (np.repeat(np.arange(self.ncol, dtype=np.int64),
                                          np.diff(self.indptr)) + k)
        return self._filter(keep)

    def triu(self, k: int = 0) -> "CSC":
        keep = self.indices <= (np.repeat(np.arange(self.ncol, dtype=np.int64),
                                          np.diff(self.indptr)) - k)
        return self._filter(keep)

    def _filter(self, keep: np.ndarray) -> "CSC":
        cols = np.repeat(np.arange(self.ncol, dtype=np.int64), np.diff(self.indptr))
        counts = np.bincount(cols[keep], minlength=self.ncol)
        indptr = np.zeros(self.ncol + 1, dtype=np.int64)
        np.cumsum(counts, out=indptr[1:])
        return CSC(self.nrow, self.ncol, indptr, self.indices[keep],
                   self.data[keep], self.sym)

    def to_full_storage(self) -> "CSC":
        """Symmetric-stored (sym=±1) → general storage with both triangles
        (Hermitian reflection for complex data)."""
        if self.sym == 0:
            return self
        cols = np.repeat(np.arange(self.ncol, dtype=np.int64), np.diff(self.indptr))
        off = self.indices != cols
        r = np.concatenate([self.indices, cols[off]])
        c = np.concatenate([cols, self.indices[off]])
        mirrored = self.data[off]
        if np.iscomplexobj(self.data):
            mirrored = np.conj(mirrored)
        x = np.concatenate([self.data, mirrored])
        return from_triplets(self.nrow, self.ncol, r, c, x, sym=0)

    # ---------------- numeric ops (host) ----------------

    def matvec(self, x: np.ndarray) -> np.ndarray:
        """y = A @ x (dense x; handles sym storage). cholmod_sdmult analog."""
        A = self
        if A.sym != 0:
            A = A.to_full_storage()
        x = np.asarray(x)
        cols = np.repeat(np.arange(A.ncol, dtype=np.int64), np.diff(A.indptr))
        if x.ndim == 1:
            y = np.zeros(A.nrow, dtype=np.result_type(A.data, x))
            np.add.at(y, A.indices, A.data * x[cols])
        else:
            y = np.zeros((A.nrow, x.shape[1]), dtype=np.result_type(A.data, x))
            np.add.at(y, A.indices, A.data[:, None] * x[cols])
        return y

    def rmatvec(self, x: np.ndarray) -> np.ndarray:
        """y = A' @ x."""
        if self.sym != 0:
            return self.matvec(x)
        return self.transpose().matvec(x)

    def add(self, other: "CSC", alpha: float = 1.0, beta: float = 1.0) -> "CSC":
        """alpha*A + beta*B (cholmod_add analog)."""
        assert self.shape == other.shape and self.sym == other.sym
        ca = np.repeat(np.arange(self.ncol, dtype=np.int64), np.diff(self.indptr))
        cb = np.repeat(np.arange(other.ncol, dtype=np.int64), np.diff(other.indptr))
        r = np.concatenate([self.indices, other.indices])
        c = np.concatenate([ca, cb])
        x = np.concatenate([alpha * self.data, beta * other.data])
        return from_triplets(self.nrow, self.ncol, r, c, x, sym=self.sym)

    def matmat(self, other: "CSC") -> "CSC":
        """C = A @ B, sparse × sparse (cholmod_ssmult / cs_multiply analog).

        Column-at-a-time with a dense accumulator per column — fine for the
        host-side structural uses (A'A pattern etc.)."""
        A = self.to_full_storage()
        B = other.to_full_storage()
        assert A.ncol == B.nrow
        rows_out, cols_out, vals_out = [], [], []
        for j in range(B.ncol):
            acc = {}
            for t in range(B.indptr[j], B.indptr[j + 1]):
                k = B.indices[t]
                bv = B.data[t]
                lo, hi = A.indptr[k], A.indptr[k + 1]
                for i, av in zip(A.indices[lo:hi], A.data[lo:hi]):
                    acc[i] = acc.get(i, 0.0) + av * bv
            rows_out.extend(acc.keys())
            cols_out.extend([j] * len(acc))
            vals_out.extend(acc.values())
        return from_triplets(A.nrow, B.ncol, np.array(rows_out, dtype=np.int64),
                             np.array(cols_out, dtype=np.int64),
                             np.array(vals_out, dtype=A.data.dtype))

    def norm1(self) -> float:
        """max column sum of |A| (cholmod_norm analog)."""
        A = self.to_full_storage() if self.sym != 0 else self
        if A.nnz == 0:
            return 0.0
        cols = np.repeat(np.arange(A.ncol, dtype=np.int64), np.diff(A.indptr))
        sums = np.bincount(cols, weights=np.abs(A.data), minlength=A.ncol)
        return float(sums.max()) if A.ncol else 0.0

    def norm_inf(self) -> float:
        A = self.to_full_storage() if self.sym != 0 else self
        if A.nnz == 0:
            return 0.0
        sums = np.bincount(A.indices, weights=np.abs(A.data), minlength=A.nrow)
        return float(sums.max()) if A.nrow else 0.0

    def norm_fro(self) -> float:
        """Frobenius norm (cholmod_norm CHOLMOD_NORM analog family)."""
        A = self.to_full_storage() if self.sym != 0 else self
        return float(np.sqrt(np.sum(np.abs(A.data) ** 2)))

    def scale(self, left: np.ndarray | None = None,
              right: np.ndarray | None = None) -> "CSC":
        """diag(left) @ A @ diag(right) (cholmod_scale analog; either side
        may be None). Symmetric inputs require left == right."""
        A = self
        if A.sym != 0:
            assert left is None or right is None or np.array_equal(left, right)
        data = A.data.copy()
        if left is not None:
            data *= np.asarray(left)[A.indices]
        if right is not None:
            cols = np.repeat(np.arange(A.ncol, dtype=np.int64),
                             np.diff(A.indptr))
            data *= np.asarray(right)[cols]
        return CSC(A.nrow, A.ncol, A.indptr.copy(), A.indices.copy(), data,
                   A.sym)

    def submatrix(self, rows: np.ndarray | None,
                  cols: np.ndarray | None) -> "CSC":
        """A[rows, cols] with general (possibly permuting/duplicating) index
        lists (cholmod_submatrix analog). None = all, in order."""
        A = self.to_full_storage() if self.sym != 0 else self
        rsel = (np.arange(A.nrow, dtype=np.int64) if rows is None
                else _as_index(rows))
        csel = (np.arange(A.ncol, dtype=np.int64) if cols is None
                else _as_index(cols))
        # row map: original row -> list positions (handle duplicates via sort)
        rr, cc, xx = [], [], []
        order = np.argsort(rsel, kind="stable")
        rsorted = rsel[order]
        for out_j, j in enumerate(csel):
            lo, hi = A.indptr[j], A.indptr[j + 1]
            ridx = A.indices[lo:hi]
            loi = np.searchsorted(rsorted, ridx, side="left")
            hii = np.searchsorted(rsorted, ridx, side="right")
            for t in range(ridx.size):
                for k in range(loi[t], hii[t]):
                    rr.append(order[k])
                    cc.append(out_j)
                    xx.append(A.data[lo + t])
        return from_triplets(rsel.size, csel.size, rr, cc,
                             np.asarray(xx, dtype=A.data.dtype))

    def symmetry(self, tol: float = 0.0) -> dict:
        """Structural/numeric symmetry report (cholmod_symmetry analog):
        returns {'structural': frac, 'numeric': frac, 'hermitian': frac,
        'nzdiag': count} over the off-diagonal pattern."""
        A = self.to_full_storage() if self.sym != 0 else self
        assert A.nrow == A.ncol
        cols = np.repeat(np.arange(A.ncol, dtype=np.int64), np.diff(A.indptr))
        diag = A.indices == cols
        nzdiag = int(np.count_nonzero(diag))
        off = ~diag
        r, c, x = A.indices[off], cols[off], A.data[off]
        if r.size == 0:
            return {"structural": 1.0, "numeric": 1.0, "hermitian": 1.0,
                    "nzdiag": nzdiag}
        key = r * A.ncol + c
        keyT = c * A.ncol + r
        order = np.argsort(key)
        pos = np.searchsorted(key[order], keyT)
        pos = np.clip(pos, 0, key.size - 1)
        hit = key[order][pos] == keyT
        struct = float(np.count_nonzero(hit)) / r.size
        xv = x[order][pos]
        num_ok = hit & (np.abs(xv - x) <= tol + tol * np.abs(x))
        herm_ok = hit & (np.abs(np.conj(xv) - x) <= tol + tol * np.abs(x))
        return {"structural": struct,
                "numeric": float(np.count_nonzero(num_ok)) / r.size,
                "hermitian": float(np.count_nonzero(herm_ok)) / r.size,
                "nzdiag": nzdiag}

    # ---------------- patterns for analysis ----------------

    def aat_pattern(self) -> "CSC":
        """Pattern of A + A' minus the diagonal, as general CSC with data=1.

        The AMD/elimination-graph input (reference ``AMD/Source/amd_aat.c``).
        Native two-pass counting construction when available (the numpy
        triplet route cost ~1.1 s at n=125k — half the analyze budget);
        note A+A' of one stored triangle equals A+A' of the full pattern,
        so sym input needs no expansion."""
        n = self.ncol
        assert self.nrow == n
        from . import native
        if native.available():
            # native construction sorts and dedups (full-storage mirroring
            # duplicates included) — use the result directly
            outp, outi = native.aat(n, self.indptr, self.indices)
            return CSC(n, n, outp, outi, np.ones(outi.size), 0)
        A = self.to_full_storage() if self.sym != 0 else self
        cols = np.repeat(np.arange(n, dtype=np.int64), np.diff(A.indptr))
        off = A.indices != cols
        r = np.concatenate([A.indices[off], cols[off]])
        c = np.concatenate([cols[off], A.indices[off]])
        out = from_triplets(n, n, r, c, np.ones(r.size), sym=0)
        out.data[:] = 1.0
        return out

    def ata_pattern(self) -> "CSC":
        """Pattern of A'A (for LU/QR column analysis; formed explicitly only for
        small host-side uses — COLAMD avoids this, our colamd does too)."""
        At = self.transpose()
        return At.matmat(self)

    def to_csr_arrays(self):
        """Return (indptr, indices, data) of the CSR view (i.e. of A')."""
        T = self.transpose()
        return T.indptr, T.indices, T.data


# ---------------- constructors ----------------

def from_triplets(nrow: int, ncol: int, rows, cols, vals, sym: int = 0) -> CSC:
    """Triplet → CSC with duplicate summation (cs_compress + cs_dupl analog)."""
    rows = _as_index(rows)
    cols = _as_index(cols)
    vals = np.asarray(vals)
    if vals.dtype.kind not in "fc":
        vals = vals.astype(np.float64)
    assert rows.size == cols.size == vals.size
    if rows.size == 0:
        return CSC(nrow, ncol, np.zeros(ncol + 1, np.int64),
                   np.empty(0, np.int64), np.empty(0, vals.dtype), sym)
    assert rows.min() >= 0 and rows.max() < nrow, "row index out of range"
    assert cols.min() >= 0 and cols.max() < ncol, "col index out of range"
    order = np.lexsort((rows, cols))
    r, c, x = rows[order], cols[order], vals[order]
    # collapse duplicates
    new_grp = np.ones(r.size, dtype=bool)
    new_grp[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1])
    grp_id = np.cumsum(new_grp) - 1
    x_sum = np.bincount(grp_id, weights=x.real)
    if np.iscomplexobj(x):
        x_sum = x_sum + 1j * np.bincount(grp_id, weights=x.imag)
    r_u = r[new_grp]
    c_u = c[new_grp]
    counts = np.bincount(c_u, minlength=ncol)
    indptr = np.zeros(ncol + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    return CSC(nrow, ncol, indptr, r_u, x_sum.astype(vals.dtype), sym)


def from_dense(A: np.ndarray, sym: int = 0, tol: float = 0.0) -> CSC:
    A = np.asarray(A)
    if sym == 1:
        mask = (np.abs(A) > tol) & (np.arange(A.shape[0])[:, None]
                                    <= np.arange(A.shape[1])[None, :])
    elif sym == -1:
        mask = (np.abs(A) > tol) & (np.arange(A.shape[0])[:, None]
                                    >= np.arange(A.shape[1])[None, :])
    else:
        mask = np.abs(A) > tol
    r, c = np.nonzero(mask)
    return from_triplets(A.shape[0], A.shape[1], r, c, A[r, c], sym=sym)


def eye(n: int, dtype=np.float64) -> CSC:
    idx = np.arange(n, dtype=np.int64)
    return CSC(n, n, np.arange(n + 1, dtype=np.int64), idx,
               np.ones(n, dtype=dtype), 0)


# ---------------- helpers ----------------

def invert_permutation(p) -> np.ndarray:
    p = _as_index(p)
    pinv = np.empty_like(p)
    pinv[p] = np.arange(p.size, dtype=np.int64)
    return pinv


def _concat_ranges(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Vectorized concatenation of ranges [starts[i], starts[i]+lens[i])."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    out = np.ones(total, dtype=np.int64)
    ends = np.cumsum(lens)
    out[0] = starts[0]
    idx = ends[:-1][lens[1:] > 0]
    # set jump values at range boundaries
    nonzero = lens > 0
    srt = starts[nonzero]
    lns = lens[nonzero]
    e = np.cumsum(lns)
    out = np.ones(total, dtype=np.int64)
    out[0] = srt[0]
    out[e[:-1]] = srt[1:] - (srt[:-1] + lns[:-1] - 1)
    return np.cumsum(out)


def horzcat(A: CSC, B: CSC) -> CSC:
    """[A B] (cholmod_horzcat analog)."""
    A = A.to_full_storage() if A.sym != 0 else A
    B = B.to_full_storage() if B.sym != 0 else B
    assert A.nrow == B.nrow
    indptr = np.concatenate([A.indptr, A.nnz + B.indptr[1:]])
    return CSC(A.nrow, A.ncol + B.ncol, indptr,
               np.concatenate([A.indices, B.indices]),
               np.concatenate([A.data, B.data]), 0)


def vertcat(A: CSC, B: CSC) -> CSC:
    """[A ; B] (cholmod_vertcat analog)."""
    A = A.to_full_storage() if A.sym != 0 else A
    B = B.to_full_storage() if B.sym != 0 else B
    assert A.ncol == B.ncol
    ca = np.repeat(np.arange(A.ncol, dtype=np.int64), np.diff(A.indptr))
    cb = np.repeat(np.arange(B.ncol, dtype=np.int64), np.diff(B.indptr))
    return from_triplets(A.nrow + B.nrow, A.ncol,
                         np.concatenate([A.indices, A.nrow + B.indices]),
                         np.concatenate([ca, cb]),
                         np.concatenate([A.data, B.data]))


def residual_norm(A: CSC, x: np.ndarray, b: np.ndarray) -> float:
    """norm(Ax-b,inf) / (norm(A,1)*norm(x,inf) + norm(b,inf)).

    The reference acceptance criterion (``CSparse/Demo/cs_demo.c:52``)."""
    r = A.matvec(x) - b
    denom = A.norm1() * np.abs(x).max(initial=0.0) + np.abs(b).max(initial=0.0)
    if denom == 0.0:
        return float(np.abs(r).max(initial=0.0))
    return float(np.abs(r).max(initial=0.0) / denom)
