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
    keep = v != 0.0
    # on the diagonal blocks of a Hermitian matrix y == 0; for sym=1 keep
    # only the upper triangle of the embedded matrix
    if A.sym == 1:
        keep &= r <= c
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
                           config: Config = DEFAULT) -> np.ndarray:
    """HPD complex solve on the supernodal device path (embedded)."""
    from .supernodal_device import factorize_device
    from .supernodal_solve import solve_device
    from ..symbolic.supernodes import analyze_supernodal

    cache = getattr(A, "_embed_chol", None)
    if cache is None:
        M = embed_matrix(A)
        # order on the complex pattern (n nodes), expand to pairs so the
        # 2x2 blocks stay adjacent (amalgamation fuses them)
        from .. import _fill_reducing_perm
        Ar = CSC(A.nrow, A.ncol, A.indptr, A.indices,
                 np.abs(A.data), A.sym)
        p = _fill_reducing_perm(Ar, config)
        S = analyze_supernodal(M, expand_perm(p), config)
        A._embed_chol = (M, S)
    else:
        M, S = cache
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
