"""Test fixture loading and synthetic matrix generators.

Two sources:
  1. The reference's demo matrices, read straight from the read-only mount at
     ``/root/reference`` when present (plain ``row col value`` 0-based triplet
     files under ``CSparse/Matrix`` — the cs_demo input format,
     reference ``CSparse/Demo/cs_demo.c`` ``cs_load``-style; and Matrix Market
     files under ``CHOLMOD/Demo/Matrix``, ``UMFPACK`` etc.).
  2. Synthetic generators (2D/3D Laplacians, banded SPD, random patterns) —
     the benchmark workloads when the reference mount or network (ssget,
     reference ``ssget/README.txt``) is unavailable.
"""

from __future__ import annotations

import os

import numpy as np

from ..sparse import CSC, from_triplets

REFERENCE_ROOT = os.environ.get("SUITESPARSE_REFERENCE", "/root/reference")

__all__ = [
    "have_reference",
    "load_triplet_file",
    "load_demo",
    "laplacian_2d",
    "laplacian_3d",
    "random_spd",
    "banded_spd",
    "arrow_spd",
    "random_sparse",
]


def have_reference() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "CSparse", "Matrix"))


def load_triplet_file(path: str, sym: int = 0) -> CSC:
    """Read a 0-based ``row col value`` triplet text file (cs_load format)."""
    rows, cols, vals = [], [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 2:
                continue
            rows.append(int(parts[0]))
            cols.append(int(parts[1]))
            vals.append(float(parts[2]) if len(parts) > 2 else 1.0)
    r = np.array(rows, dtype=np.int64)
    c = np.array(cols, dtype=np.int64)
    x = np.array(vals)
    nrow = int(r.max()) + 1 if r.size else 0
    ncol = int(c.max()) + 1 if c.size else 0
    if sym == 1:
        return from_triplets(max(nrow, ncol), max(nrow, ncol),
                             np.minimum(r, c), np.maximum(r, c), x, sym=1)
    return from_triplets(nrow, ncol, r, c, x, sym=0)


# The cs_demo matrices and how cs_demo2/cs_demo3 treat them
# (demo list: reference CSparse/Demo — t1 general; bcsstk01/bcsstk16 symmetric
# lower-stored; west0067/ibm32a general rectangular-ish).
_DEMO_SYM = {
    "t1": 0, "ash219": 0, "bcsstk01": 1, "bcsstk16": 1, "fs_183_1": 0,
    "grid3x5": 0, "ibm32a": 0, "ibm32b": 0, "lp_afiro": 0, "mbeacxc": 0,
    "west0067": 0,
}


def load_demo(name: str) -> CSC:
    """Load a reference CSparse demo matrix by name (requires the mount)."""
    path = os.path.join(REFERENCE_ROOT, "CSparse", "Matrix", name)
    sym = _DEMO_SYM.get(name, 0)
    A = load_triplet_file(path, sym=0)
    if sym == 1:
        # files store the lower triangle of a symmetric matrix;
        # convert to our upper-stored convention
        cols = np.repeat(np.arange(A.ncol, dtype=np.int64), np.diff(A.indptr))
        return from_triplets(max(A.nrow, A.ncol), max(A.nrow, A.ncol),
                             np.minimum(A.indices, cols),
                             np.maximum(A.indices, cols), A.data, sym=1)
    return A


# ---------------- synthetic generators ----------------

def laplacian_2d(nx: int, ny: int | None = None, shift: float = 0.0) -> CSC:
    """5-point 2D Laplacian (SPD), upper-stored. n = nx*ny."""
    ny = ny if ny is not None else nx
    idx = np.arange(nx * ny, dtype=np.int64).reshape(nx, ny)
    rows = [idx.ravel()]
    cols = [idx.ravel()]
    vals = [np.full(nx * ny, 4.0 + shift)]
    # +x neighbor
    r = idx[:-1, :].ravel(); c = idx[1:, :].ravel()
    rows.append(r); cols.append(c); vals.append(np.full(r.size, -1.0))
    # +y neighbor
    r = idx[:, :-1].ravel(); c = idx[:, 1:].ravel()
    rows.append(r); cols.append(c); vals.append(np.full(r.size, -1.0))
    return from_triplets(nx * ny, nx * ny, np.concatenate(rows),
                         np.concatenate(cols), np.concatenate(vals), sym=1)


def laplacian_3d(nx: int, ny: int | None = None, nz: int | None = None,
                 shift: float = 0.0) -> CSC:
    """7-point 3D Laplacian (SPD), upper-stored — the nd3k/nd24k-style workload."""
    ny = ny if ny is not None else nx
    nz = nz if nz is not None else nx
    idx = np.arange(nx * ny * nz, dtype=np.int64).reshape(nx, ny, nz)
    rows = [idx.ravel()]
    cols = [idx.ravel()]
    vals = [np.full(idx.size, 6.0 + shift)]
    for sl_r, sl_c in (((slice(None, -1), slice(None), slice(None)),
                        (slice(1, None), slice(None), slice(None))),
                       ((slice(None), slice(None, -1), slice(None)),
                        (slice(None), slice(1, None), slice(None))),
                       ((slice(None), slice(None), slice(None, -1)),
                        (slice(None), slice(None), slice(1, None)))):
        r = idx[sl_r].ravel(); c = idx[sl_c].ravel()
        rows.append(r); cols.append(c); vals.append(np.full(r.size, -1.0))
    n = nx * ny * nz
    return from_triplets(n, n, np.concatenate(rows), np.concatenate(cols),
                         np.concatenate(vals), sym=1)


def random_spd(n: int, density: float = 0.01, seed: int = 0) -> CSC:
    """Random SPD: random sparse pattern + diagonal dominance, upper-stored."""
    rng = np.random.default_rng(seed)
    m = max(1, int(density * n * n / 2))
    r = rng.integers(0, n, size=m)
    c = rng.integers(0, n, size=m)
    lo = np.minimum(r, c); hi = np.maximum(r, c)
    off = lo != hi
    vals = rng.standard_normal(off.sum())
    rows = np.concatenate([lo[off], np.arange(n)])
    cols = np.concatenate([hi[off], np.arange(n)])
    # diagonal dominance: diag = 1 + sum |offdiag| bound
    diag = np.full(n, 1.0)
    np.add.at(diag, lo[off], np.abs(vals))
    np.add.at(diag, hi[off], np.abs(vals))
    data = np.concatenate([vals, diag + 1.0])
    return from_triplets(n, n, rows, cols, data, sym=1)


def banded_spd(n: int, bandwidth: int, seed: int = 0) -> CSC:
    rng = np.random.default_rng(seed)
    rows, cols, vals = [np.arange(n, dtype=np.int64)], \
        [np.arange(n, dtype=np.int64)], [np.full(n, 2.0 * bandwidth + 1.0)]
    for k in range(1, bandwidth + 1):
        r = np.arange(n - k, dtype=np.int64)
        rows.append(r); cols.append(r + k)
        vals.append(rng.uniform(-1.0, 1.0, size=n - k))
    return from_triplets(n, n, np.concatenate(rows), np.concatenate(cols),
                         np.concatenate(vals), sym=1)


def arrow_spd(n: int, heads: int = 1) -> CSC:
    """Arrowhead SPD — worst-case fill for natural order, trivial for AMD."""
    rows = [np.arange(n, dtype=np.int64)]
    cols = [np.arange(n, dtype=np.int64)]
    vals = [np.full(n, float(n))]
    for h in range(heads):
        r = np.arange(heads, n, dtype=np.int64)
        rows.append(np.full(r.size, h, dtype=np.int64)); cols.append(r)
        vals.append(np.full(r.size, -1.0))
    return from_triplets(n, n, np.concatenate(rows), np.concatenate(cols),
                         np.concatenate(vals), sym=1)


def random_sparse(nrow: int, ncol: int, density: float = 0.05, seed: int = 0,
                  ensure_full_diag: bool = True) -> CSC:
    """Random unsymmetric matrix (for LU/QR paths)."""
    rng = np.random.default_rng(seed)
    m = max(1, int(density * nrow * ncol))
    r = rng.integers(0, nrow, size=m)
    c = rng.integers(0, ncol, size=m)
    x = rng.standard_normal(m)
    if ensure_full_diag and nrow == ncol:
        d = np.arange(nrow, dtype=np.int64)
        r = np.concatenate([r, d]); c = np.concatenate([c, d])
        x = np.concatenate([x, np.full(nrow, 4.0 + density * nrow)])
    return from_triplets(nrow, ncol, r, c, x, sym=0)
