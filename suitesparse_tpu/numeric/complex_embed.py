"""Complex device paths via the 2x2 real embedding.

Reference analog: the reference ships every solver x4 value types
(``CHOLMOD/Include/cholmod_template.h`` complex/zomplex instantiations,
UMFPACK zi/zl, SPQR ``<Complex>``). The TPU MXU has no complex datapath —
XLA itself lowers complex matmuls to real ones — so the device pipelines
stay real and complex problems run through the standard isomorphism

    x + iy  ->  [[x, -y], [y, x]]

with variables interleaved (Re_j at 2j, Im_j at 2j+1):

  * Hermitian positive definite A  ->  real SPD M (the supernodal Cholesky
    device path applies unchanged; ordering computed on the n-node complex
    pattern and expanded so conjugate pairs stay adjacent — supernode
    amalgamation then fuses each 2x2 block);
  * general square A  ->  real 2n x 2n M for the unsymmetric multifrontal
    LU device path;
  * rectangular A for least squares: |M z - e(b)|_2 = |A x - b|_2 with the
    bijection z = e(x), so the QR device path minimizes the same residual.

Cost: 2x memory and 2x the flops of an ideal 3-multiply complex kernel —
the price of keeping every hot loop on the real MXU path.
"""

from __future__ import annotations

import numpy as np

from ..config import Config, DEFAULT
from ..sparse import CSC, from_triplets

__all__ = ["embed_matrix", "embed_vec", "unembed_vec", "expand_perm",
           "cholsol_complex_device", "lusol_complex_device",
           "qrsol_complex_device"]


def embed_matrix(A: CSC) -> CSC:
    """Real embedding of a complex CSC. ``sym=1`` input (upper Hermitian)
    produces an upper-stored symmetric result; general input stays general."""
    cols = np.repeat(np.arange(A.ncol, dtype=np.int64), np.diff(A.indptr))
    rows = A.indices
    x = np.real(A.data)
    y = np.imag(A.data)
    rr, cc, vv = [], [], []
    # [[x, -y], [y, x]] per entry
    rr += [2 * rows, 2 * rows + 1, 2 * rows, 2 * rows + 1]
    cc += [2 * cols, 2 * cols + 1, 2 * cols + 1, 2 * cols]
    vv += [x, x, -y, y]
    r = np.concatenate(rr)
    c = np.concatenate(cc)
    v = np.concatenate(vv)
    # STRUCTURAL embedding: zero-valued parts are kept so M's pattern
    # depends only on A's pattern (a cached symbolic stays valid across
    # value changes — the factor-many contract); only the stored-triangle
    # filter is structural
    if A.sym == 1:
        keep = r <= c
        r, c, v = r[keep], c[keep], v[keep]
    return from_triplets(2 * A.nrow, 2 * A.ncol, r, c, v, sym=A.sym)


def embed_vec(b: np.ndarray) -> np.ndarray:
    """Interleave Re/Im along axis 0 (handles 1-D and 2-D)."""
    b = np.asarray(b)
    out_shape = (2 * b.shape[0],) + b.shape[1:]
    out = np.empty(out_shape, dtype=np.float64)
    out[0::2] = np.real(b)
    out[1::2] = np.imag(b)
    return out


def unembed_vec(z: np.ndarray) -> np.ndarray:
    return z[0::2] + 1j * z[1::2]


def expand_perm(p: np.ndarray) -> np.ndarray:
    """n-permutation -> 2n-permutation keeping conjugate pairs adjacent."""
    q = np.empty(2 * p.size, dtype=np.int64)
    q[0::2] = 2 * p
    q[1::2] = 2 * p + 1
    return q


def cholsol_complex_device(A: CSC, b: np.ndarray,
                           config: Config = DEFAULT,
                           perm: np.ndarray | None = None) -> np.ndarray:
    """HPD complex solve on the supernodal device path (embedded).

    ``perm``: optional precomputed fill-reducing permutation of the
    COMPLEX pattern (callers that already analyzed A pass it to avoid a
    second ordering). Factor-many safe: the embedded VALUES are regathered
    from A.data on every call through a cached position map (the
    ``_clow_data`` pattern), keyed on the pattern fingerprint."""
    from .supernodal_device import factorize_device
    from .supernodal_solve import solve_device
    from ..symbolic.supernodes import analyze_supernodal

    pkey = A.pattern_key()
    cache = getattr(A, "_embed_chol", None)
    if cache is None or cache[0] != pkey:
        Mpat = embed_matrix(A)           # structural: pattern-only use
        if perm is None:
            from .. import _fill_reducing_perm
            Ar = CSC(A.nrow, A.ncol, A.indptr, A.indices,
                     np.abs(A.data) + 1.0, A.sym)  # +1: keep full pattern
            perm = _fill_reducing_perm(Ar, config)
        S = analyze_supernodal(Mpat, expand_perm(perm), config)
        A._embed_chol = (pkey, S)
    else:
        _, S = cache
    # VALUES are re-embedded on every call (factor-many safe: in-place
    # A.data changes flow through; the structural embedding keeps M's
    # pattern — and thus S — value-independent)
    M = embed_matrix(A)
    F = factorize_device(M, S, config)
    assert F.ok, f"embedded factorization failed at column {F.minor}"
    be = embed_vec(b)
    z = solve_device(F, be, config)
    return unembed_vec(z)


def lusol_complex_device(A: CSC, b: np.ndarray,
                         config: Config = DEFAULT) -> np.ndarray:
    """General square complex solve on the unsym multifrontal device path."""
    from .mflu_unsym import mflusol_unsym

    M = embed_matrix(A.to_full_storage() if A.sym != 0 else A)
    z = mflusol_unsym(M, embed_vec(b), config)
    return unembed_vec(z)


def qrsol_complex_device(A: CSC, b: np.ndarray,
                         config: Config = DEFAULT) -> np.ndarray:
    """Complex least squares on the QR device path (embedded isometry)."""
    from .mfqr_device import mfqrsol_device

    M = embed_matrix(A)
    z = mfqrsol_device(M, embed_vec(b), config)
    return unembed_vec(z)
