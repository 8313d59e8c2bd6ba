"""Native (C++) host-side kernels: graph algorithms and symbolic analysis.

The reference implements every ordering/symbolic component in C
(``AMD/Source/amd_2.c``, ``BTF/Source/btf_*.c``, ``CSparse`` etc.); here the
equivalents live in ``src/*.cc``, compiled once into ``lib/libsstpu.so`` and
bound via ctypes (no pybind11 in this image). Python fallbacks exist for every
entry point, so the package works without a toolchain — the native path is the
default for large problems.

Build: lazy, at first use, via ``g++ -O3 -march=native -shared -fPIC``; cached
by source mtime hash.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src")
_LIBDIR = os.path.join(_HERE, "lib")
_LIB = os.path.join(_LIBDIR, "libsstpu.so")
_STAMP = os.path.join(_LIBDIR, "build.stamp")

_lock = threading.Lock()
_dll = None
_build_failed = False

_i64 = ctypes.POINTER(ctypes.c_int64)
_f64 = ctypes.POINTER(ctypes.c_double)


def _src_hash() -> str:
    h = hashlib.sha256()
    if not os.path.isdir(_SRC):
        return "none"
    for name in sorted(os.listdir(_SRC)):
        if name.endswith((".cc", ".h", ".hpp")):
            with open(os.path.join(_SRC, name), "rb") as f:
                h.update(name.encode())
                h.update(f.read())
    return h.hexdigest()


def _build() -> bool:
    sources = [os.path.join(_SRC, f) for f in sorted(os.listdir(_SRC))
               if f.endswith(".cc")] if os.path.isdir(_SRC) else []
    if not sources:
        return False
    os.makedirs(_LIBDIR, exist_ok=True)
    want = _src_hash()
    if os.path.exists(_LIB) and os.path.exists(_STAMP):
        with open(_STAMP) as f:
            if f.read().strip() == want:
                return True
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-march=native",
           "-funroll-loops", "-o", _LIB, *sources]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    except (subprocess.SubprocessError, FileNotFoundError):
        return False
    with open(_STAMP, "w") as f:
        f.write(want)
    return True


def _load():
    global _dll, _build_failed
    with _lock:
        if _dll is not None or _build_failed:
            return _dll
        if not _build():
            _build_failed = True
            return None
        try:
            _dll = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        _declare(_dll)
        return _dll


def has(name: str) -> bool:
    """Whether the native library exposes entry point ``name``."""
    dll = _load()
    return dll is not None and hasattr(dll, name)


def _declare(dll) -> None:
    c = ctypes.c_int64
    d = ctypes.c_double

    def maybe(name, restype, argtypes):
        if hasattr(dll, name):
            fn = getattr(dll, name)
            fn.restype = restype
            fn.argtypes = argtypes

    maybe("sstpu_amd", c, [c, _i64, _i64, _i64, d, c])
    maybe("sstpu_etree", None, [c, _i64, _i64, _i64, c])
    maybe("sstpu_postorder", None, [c, _i64, _i64])
    maybe("sstpu_col_counts", None, [c, c, _i64, _i64, _i64, _i64, _i64, c])
    maybe("sstpu_maxtrans", c, [c, c, _i64, _i64, _i64, d])
    maybe("sstpu_strongcomp", c, [c, _i64, _i64, _i64, _i64])
    maybe("sstpu_lu_factor", c, [
        c, _i64, _i64, _f64,      # n, Ap, Ai, Ax (CSC of block)
        d,                        # pivot tolerance
        c,                        # capacity per factor (grown by caller on -1)
        _i64, _i64, _f64,         # Lp, Li, Lx out
        _i64, _i64, _f64,         # Up, Ui, Ux out
        _i64,                     # P out (pivot row of step k)
    ])
    maybe("sstpu_lu_refactor", c, [
        c, _i64, _i64, _f64,
        _i64, _i64, _f64, _i64, _i64, _f64, _i64,
    ])
    maybe("sstpu_colamd", c, [c, c, _i64, _i64, d, d, c, _i64, _i64])
    maybe("sstpu_nested_dissection", c, [c, _i64, _i64, _i64, c, c])
    maybe("sstpu_nested_dissection_sets", c, [c, _i64, _i64, _i64, c, c, _i64])
    maybe("sstpu_edgecut", c, [c, _i64, _i64, _i64, d, d, c, _i64])
    maybe("sstpu_camd", c, [c, _i64, _i64, _i64, _i64, c])
    maybe("sstpu_wmatch", c, [c, c, _i64, _i64, _f64, _i64])
    maybe("sstpu_aat", c, [c, _i64, _i64, _i64, _i64])
    maybe("sstpu_symperm", None, [c, _i64, _i64, _i64, _i64, _i64, _i64])
    maybe("sstpu_transpose", None, [c, c, _i64, _i64, _i64, _i64, _i64])
    maybe("sstpu_lu_prep", None, [c, _i64, _i64, _i64, _i64, _i64, c,
                                  _i64, _i64, _i64, _i64, _i64, _i64,
                                  _i64, _i64, _i64, _i64, _i64, _i64, _i64])
    vp = ctypes.c_void_p
    maybe("sstpu_super_analyze", vp,
          [c, _i64, _i64, _i64, _i64, c, c, c, d, d, d])
    maybe("sstpu_super_result", c, [vp, c, _i64])
    maybe("sstpu_super_fl", d, [vp])
    maybe("sstpu_super_maxcsize", c, [vp])
    maybe("sstpu_super_free", None, [vp])


def available() -> bool:
    return _load() is not None


def _ptr_i64(a: np.ndarray):
    return a.ctypes.data_as(_i64)


def _ptr_f64(a: np.ndarray):
    return a.ctypes.data_as(_f64)


def amd(indptr: np.ndarray, indices: np.ndarray, n: int,
        dense: float = 10.0, aggressive: bool = True) -> np.ndarray:
    """AMD over the off-diagonal pattern of A+A' given in CSC (general)."""
    dll = _load()
    assert dll is not None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    perm = np.empty(n, dtype=np.int64)
    rc = dll.sstpu_amd(n, _ptr_i64(indptr), _ptr_i64(indices), _ptr_i64(perm),
                       ctypes.c_double(dense), 1 if aggressive else 0)
    assert rc == 0, f"native amd failed rc={rc}"
    return perm


def camd(indptr: np.ndarray, indices: np.ndarray, n: int, cset: np.ndarray,
         aggressive: bool = True) -> np.ndarray:
    """Constrained AMD: like amd() but the output keeps constraint sets
    contiguous in ascending set order (CAMD analog)."""
    dll = _load()
    assert dll is not None and hasattr(dll, "sstpu_camd")
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    cset = np.ascontiguousarray(cset, dtype=np.int64)
    perm = np.empty(n, dtype=np.int64)
    rc = dll.sstpu_camd(n, _ptr_i64(indptr), _ptr_i64(indices),
                        _ptr_i64(perm), _ptr_i64(cset), 1 if aggressive else 0)
    assert rc == 0, f"native camd failed rc={rc}"
    return perm


def colamd(nrow: int, ncol: int, indptr: np.ndarray, indices: np.ndarray,
           dense_row: float = 10.0, dense_col: float = 10.0,
           aggressive: bool = True,
           cmember: np.ndarray | None = None) -> np.ndarray:
    """Row-list column approximate minimum degree (COLAMD; CCOLAMD when
    ``cmember`` is given). Returns q with q[k] = kth column."""
    dll = _load()
    assert dll is not None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    perm = np.empty(ncol, dtype=np.int64)
    cm = (None if cmember is None
          else np.ascontiguousarray(cmember, dtype=np.int64))
    rc = dll.sstpu_colamd(nrow, ncol, _ptr_i64(indptr), _ptr_i64(indices),
                          ctypes.c_double(dense_row),
                          ctypes.c_double(dense_col),
                          1 if aggressive else 0,
                          _ptr_i64(cm) if cm is not None else None,
                          _ptr_i64(perm))
    assert rc == 0, f"native colamd failed rc={rc}"
    return perm


def nested_dissection(indptr: np.ndarray, indices: np.ndarray, n: int,
                      nd_small: int = 200, seed: int = 1) -> np.ndarray:
    """Multilevel ND over the off-diagonal pattern of A+A' in CSC."""
    dll = _load()
    assert dll is not None and hasattr(dll, "sstpu_nested_dissection")
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    perm = np.empty(n, dtype=np.int64)
    rc = dll.sstpu_nested_dissection(n, _ptr_i64(indptr), _ptr_i64(indices),
                                     _ptr_i64(perm), nd_small, seed)
    assert rc != -3, "pattern exceeds int32 ND internals (n or nnz >= 2^31)"
    assert rc == 0, f"native nested dissection failed rc={rc}"
    return perm


def nested_dissection_sets(indptr: np.ndarray, indices: np.ndarray, n: int,
                           nd_small: int = 200, seed: int = 1
                           ) -> tuple[np.ndarray, np.ndarray]:
    """ND returning (perm, cmember): per-vertex constraint-set ids of the
    leaf-block/separator decomposition (NESDIS Cmember analog)."""
    dll = _load()
    assert dll is not None and hasattr(dll, "sstpu_nested_dissection_sets")
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    perm = np.empty(n, dtype=np.int64)
    cmember = np.empty(n, dtype=np.int64)
    rc = dll.sstpu_nested_dissection_sets(
        n, _ptr_i64(indptr), _ptr_i64(indices), _ptr_i64(perm), nd_small,
        seed, _ptr_i64(cmember))
    assert rc != -3, "pattern exceeds int32 ND internals (n or nnz >= 2^31)"
    assert rc == 0, f"native nested dissection failed rc={rc}"
    return perm, cmember


def edgecut(indptr: np.ndarray, indices: np.ndarray, n: int,
            target_split: float = 0.5, tolerance: float = 0.05,
            seed: int = 1) -> tuple[np.ndarray, int]:
    """Multilevel two-way edge-cut partition (Mongoose EdgeCut analog).
    Returns (part in {0,1}^n, cut weight)."""
    dll = _load()
    assert dll is not None and hasattr(dll, "sstpu_edgecut")
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    part = np.empty(n, dtype=np.int64)
    out = np.zeros(2, dtype=np.int64)
    rc = dll.sstpu_edgecut(n, _ptr_i64(indptr), _ptr_i64(indices),
                           _ptr_i64(part), ctypes.c_double(target_split),
                           ctypes.c_double(tolerance), seed, _ptr_i64(out))
    assert rc != -3, "pattern exceeds int32 ND internals (n or nnz >= 2^31)"
    assert rc == 0, f"native edgecut failed rc={rc}"
    return part, int(out[0])


def etree(n: int, indptr: np.ndarray, indices: np.ndarray,
          ata: bool = False, nrow: int | None = None) -> np.ndarray:
    dll = _load()
    assert dll is not None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    parent = np.empty(n, dtype=np.int64)
    dll.sstpu_etree(n, _ptr_i64(indptr), _ptr_i64(indices), _ptr_i64(parent),
                    (nrow if nrow is not None else n) if ata else -1)
    return parent


def postorder(parent: np.ndarray) -> np.ndarray:
    dll = _load()
    assert dll is not None
    parent = np.ascontiguousarray(parent, dtype=np.int64)
    post = np.empty(parent.size, dtype=np.int64)
    dll.sstpu_postorder(parent.size, _ptr_i64(parent), _ptr_i64(post))
    return post


def col_counts(n: int, nrow: int, indptr: np.ndarray, indices: np.ndarray,
               parent: np.ndarray, post: np.ndarray, ata: bool) -> np.ndarray:
    dll = _load()
    assert dll is not None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    parent = np.ascontiguousarray(parent, dtype=np.int64)
    post = np.ascontiguousarray(post, dtype=np.int64)
    counts = np.empty(n, dtype=np.int64)
    dll.sstpu_col_counts(n, nrow, _ptr_i64(indptr), _ptr_i64(indices),
                         _ptr_i64(parent), _ptr_i64(post), _ptr_i64(counts),
                         1 if ata else 0)
    return counts


def maxtrans(nrow: int, ncol: int, indptr: np.ndarray,
             indices: np.ndarray,
             work_limit: float = -1.0) -> tuple[int, np.ndarray]:
    """Maximum transversal (row match for each column); -1 = unmatched.
    ``work_limit`` > 0 caps DFS work at work_limit*nnz (btf.h:206)."""
    dll = _load()
    assert dll is not None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    match = np.empty(ncol, dtype=np.int64)
    nmatch = dll.sstpu_maxtrans(nrow, ncol, _ptr_i64(indptr), _ptr_i64(indices),
                                _ptr_i64(match), ctypes.c_double(work_limit))
    return int(nmatch), match


def strongcomp(n: int, indptr: np.ndarray, indices: np.ndarray
               ) -> tuple[int, np.ndarray, np.ndarray]:
    """Tarjan SCC of the square matrix's digraph: returns (nblocks, p, r)."""
    dll = _load()
    assert dll is not None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    p = np.empty(n, dtype=np.int64)
    r = np.empty(n + 1, dtype=np.int64)
    nb = dll.sstpu_strongcomp(n, _ptr_i64(indptr), _ptr_i64(indices),
                              _ptr_i64(p), _ptr_i64(r))
    return int(nb), p, r[:nb + 1].copy()


def super_analyze(n: int, Cp: np.ndarray, Ci: np.ndarray,
                  parent: np.ndarray, cc: np.ndarray,
                  nrelax, zrelax) -> dict:
    """Native supernodal symbolic analysis (cholmod_super_symbolic analog).

    ``Cp/Ci`` = LOWER-triangle pattern by columns of the postordered permuted
    matrix. Returns the full analysis as numpy arrays."""
    dll = _load()
    assert dll is not None and hasattr(dll, "sstpu_super_analyze")
    Cp = np.ascontiguousarray(Cp, dtype=np.int64)
    Ci = np.ascontiguousarray(Ci, dtype=np.int64)
    parent = np.ascontiguousarray(parent, dtype=np.int64)
    cc = np.ascontiguousarray(cc, dtype=np.int64)
    h = dll.sstpu_super_analyze(
        n, _ptr_i64(Cp), _ptr_i64(Ci), _ptr_i64(parent), _ptr_i64(cc),
        int(nrelax[0]), int(nrelax[1]), int(nrelax[2]),
        ctypes.c_double(zrelax[0]), ctypes.c_double(zrelax[1]),
        ctypes.c_double(zrelax[2]))
    assert h, "super_analyze failed"
    try:
        out = {}
        names = ["super_first", "snode_of_col", "sparent", "level_of",
                 "rows_ptr", "rows", "lpx"]
        for what, name in enumerate(names):
            ln = dll.sstpu_super_result(h, what, None)
            arr = np.empty(ln, dtype=np.int64)
            dll.sstpu_super_result(h, what, _ptr_i64(arr))
            out[name] = arr
        out["fl"] = float(dll.sstpu_super_fl(h))
        out["maxcsize"] = int(dll.sstpu_super_maxcsize(h))
    finally:
        dll.sstpu_super_free(h)
    return out


def wmatch(nrow: int, ncol: int, indptr: np.ndarray, indices: np.ndarray,
           data: np.ndarray) -> tuple[int, np.ndarray]:
    """Weighted maximum-product transversal (MC64 job-5 analog):
    match[j] = row matched to column j maximizing prod |A[match[j], j]|."""
    dll = _load()
    assert dll is not None and hasattr(dll, "sstpu_wmatch")
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    data = np.ascontiguousarray(np.abs(data), dtype=np.float64)
    match = np.empty(ncol, dtype=np.int64)
    nm = dll.sstpu_wmatch(nrow, ncol, _ptr_i64(indptr), _ptr_i64(indices),
                          data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                          _ptr_i64(match))
    return int(nm), match


def aat(n: int, indptr: np.ndarray, indices: np.ndarray) -> tuple:
    """Pattern of A + A' minus the diagonal (amd_aat analog), sorted and
    deduplicated; input may be the full pattern or one stored triangle."""
    dll = _load()
    assert dll is not None and hasattr(dll, "sstpu_aat")
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    tmp = np.zeros(n + 1, dtype=np.int64)
    cap = dll.sstpu_aat(n, _ptr_i64(indptr), _ptr_i64(indices),
                        _ptr_i64(tmp), None)
    outp = np.zeros(n + 1, dtype=np.int64)
    outi = np.empty(cap, dtype=np.int64)
    nnz = dll.sstpu_aat(n, _ptr_i64(indptr), _ptr_i64(indices),
                        _ptr_i64(outp), _ptr_i64(outi))
    return outp, outi[:nnz]


def symperm(n: int, indptr: np.ndarray, indices: np.ndarray,
            pinv: np.ndarray) -> tuple:
    """Sorted upper pattern of P A P' for upper-stored A plus a position map
    into the input entries (``~pos`` marks triangle flips the Hermitian
    caller must conjugate). O(nnz), cs_symperm.c analog."""
    dll = _load()
    assert dll is not None and hasattr(dll, "sstpu_symperm")
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    pinv = np.ascontiguousarray(pinv, dtype=np.int64)
    nnz = int(indptr[n])
    outp = np.empty(n + 1, dtype=np.int64)
    outi = np.empty(nnz, dtype=np.int64)
    outpos = np.empty(nnz, dtype=np.int64)
    dll.sstpu_symperm(n, _ptr_i64(indptr), _ptr_i64(indices), _ptr_i64(pinv),
                      _ptr_i64(outp), _ptr_i64(outi), _ptr_i64(outpos))
    return outp, outi, outpos


def transpose(nrow: int, ncol: int, indptr: np.ndarray,
              indices: np.ndarray) -> tuple:
    """Sorted transpose pattern plus position map, one counting pass
    (cs_transpose.c analog)."""
    dll = _load()
    assert dll is not None and hasattr(dll, "sstpu_transpose")
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    nnz = int(indptr[ncol])
    outp = np.empty(nrow + 1, dtype=np.int64)
    outi = np.empty(nnz, dtype=np.int64)
    outpos = np.empty(nnz, dtype=np.int64)
    dll.sstpu_transpose(nrow, ncol, _ptr_i64(indptr), _ptr_i64(indices),
                        _ptr_i64(outp), _ptr_i64(outi), _ptr_i64(outpos))
    return outp, outi, outpos


def lu_prep(n: int, indptr, indices, pinv, q, r) -> tuple:
    """Fused permutation + BTF block extraction maps for the KLU-path
    factor (see sstpu_lu_prep in symbolic.cc). Returns
    (ip, ii, pos, diag_pos, blocks, off) with blocks[k] = None for 1x1
    blocks else (bip, bi, bpos) views into shared arrays, and off =
    (oip, oi, opos); all positions index the PERMUTED data array."""
    dll = _load()
    assert dll is not None and hasattr(dll, "sstpu_lu_prep")
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    pinv = np.ascontiguousarray(pinv, dtype=np.int64)
    q = np.ascontiguousarray(q, dtype=np.int64)
    r = np.ascontiguousarray(r, dtype=np.int64)
    nblocks = r.size - 1
    nnz = int(indptr[n])
    ip = np.empty(n + 1, dtype=np.int64)
    ii = np.empty(nnz, dtype=np.int64)
    pos = np.empty(nnz, dtype=np.int64)
    diag_pos = np.empty(n, dtype=np.int64)
    bo = np.empty(nblocks + 1, dtype=np.int64)
    bip_off = np.empty(nblocks + 1, dtype=np.int64)
    nk = np.diff(r)
    bip_cat = np.empty(int(((nk > 1) * (nk + 1)).sum()), dtype=np.int64)
    bi_cat = np.empty(nnz, dtype=np.int64)
    bpos_cat = np.empty(nnz, dtype=np.int64)
    oip = np.empty(n + 1, dtype=np.int64)
    oi = np.empty(nnz, dtype=np.int64)
    opos = np.empty(nnz, dtype=np.int64)
    counts = np.zeros(2, dtype=np.int64)
    dll.sstpu_lu_prep(n, _ptr_i64(indptr), _ptr_i64(indices), _ptr_i64(pinv),
                      _ptr_i64(q), _ptr_i64(r), nblocks,
                      _ptr_i64(ip), _ptr_i64(ii), _ptr_i64(pos),
                      _ptr_i64(diag_pos), _ptr_i64(bo), _ptr_i64(bip_off),
                      _ptr_i64(bip_cat), _ptr_i64(bi_cat),
                      _ptr_i64(bpos_cat), _ptr_i64(oip), _ptr_i64(oi),
                      _ptr_i64(opos), _ptr_i64(counts))
    bn, on = int(counts[0]), int(counts[1])
    bi_cat = bi_cat[:bn]
    bpos_cat = bpos_cat[:bn]
    blocks = []
    for k in range(nblocks):
        if r[k + 1] - r[k] <= 1:
            blocks.append(None)
        else:
            blocks.append((bip_cat[bip_off[k]:bip_off[k + 1]],
                           bi_cat[bo[k]:bo[k + 1]],
                           bpos_cat[bo[k]:bo[k + 1]]))
    off = (oip, oi[:on].copy(), opos[:on].copy())
    return ip, ii, pos, diag_pos, blocks, off


def _tri_call(fname: str, n: int, indptr, indices, data, x) -> None:
    dll = _load()
    assert dll is not None and hasattr(dll, fname)
    getattr(dll, fname)(n, _ptr_i64(indptr), _ptr_i64(indices),
                        _ptr_f64(data), _ptr_f64(x))


def lsolve(n, indptr, indices, data, x) -> None:
    """In-place x = L \\ x (diag first per column; cs_lsolve analog)."""
    _tri_call("sstpu_lsolve", n, indptr, indices, data, x)


def usolve(n, indptr, indices, data, x) -> None:
    """In-place x = U \\ x (diag last per column; cs_usolve analog)."""
    _tri_call("sstpu_usolve", n, indptr, indices, data, x)


def ltsolve(n, indptr, indices, data, x) -> None:
    """In-place x = L' \\ x."""
    _tri_call("sstpu_ltsolve", n, indptr, indices, data, x)


def utsolve(n, indptr, indices, data, x) -> None:
    """In-place x = U' \\ x."""
    _tri_call("sstpu_utsolve", n, indptr, indices, data, x)


def offupdate(k1: int, k2: int, indptr, indices, data, x) -> None:
    """x[Offi] -= Offx * x[j] for j in [k1, k2) (klu_solve Off loop)."""
    dll = _load()
    assert dll is not None and hasattr(dll, "sstpu_offupdate")
    dll.sstpu_offupdate(k1, k2, _ptr_i64(indptr), _ptr_i64(indices),
                        _ptr_f64(data), _ptr_f64(x))
