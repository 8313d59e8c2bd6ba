"""suitesparse_tpu — TPU-native sparse direct solvers.

A from-scratch JAX/XLA/Pallas + C++ framework with the capabilities of the
SuiteSparse reference: fill-reducing orderings, symbolic analysis, Cholesky
(simplicial + supernodal), LU (BTF/left-looking + multifrontal), QR, triangular
solves, update/downdate and matrix I/O.

Top-level convenience API (the ``x = A\\b`` drivers, analogs of
``cs_cholsol``/``cs_lusol``/``cs_qrsol`` and ``cholmod_analyze``/``factorize``/
``solve``):

    >>> import suitesparse_tpu as sst
    >>> A = sst.io.fixtures.laplacian_2d(16)           # SPD, upper-stored
    >>> x = sst.cholsol(A, b)                           # ordering+symbolic+numeric
    >>> S = sst.analyze(A)                              # reuse symbolic
    >>> F = sst.factorize(A, S)
    >>> x = sst.solve(F, b)
"""

from __future__ import annotations

import numpy as np

from . import io, native, ordering, symbolic
from .config import Config, DEFAULT, FactorKind, Ordering
from .numeric import simplicial
from .numeric.simplicial import Factor, SymbolicChol, chol_solve
from .sparse import CSC, eye, from_dense, from_triplets, residual_norm

__all__ = [
    "CSC", "Config", "Ordering", "FactorKind", "Factor", "SymbolicChol",
    "from_triplets", "from_dense", "eye", "residual_norm",
    "analyze", "factorize", "solve", "cholsol", "lusol", "qrsol",
    "io", "ordering", "symbolic", "native",
]

__version__ = "0.1.0"


def _fill_reducing_perm(A: CSC, config: Config) -> np.ndarray:
    if config.ordering is Ordering.NATURAL:
        return np.arange(A.ncol, dtype=np.int64)
    if config.ordering is Ordering.AMD:
        return ordering.amd_order(A, config)
    if config.ordering is Ordering.COLAMD:
        return ordering.colamd_order(A, config)
    if config.ordering in (Ordering.METIS, Ordering.NESDIS):
        return ordering.nested_dissection_order(A, config)
    if config.ordering is Ordering.BEST:
        # try AMD and ND, keep lowest nnz(L) (cholmod_analyze.c:451-486 analog)
        best_perm, best_lnz = None, None
        for method in (Ordering.AMD, Ordering.NESDIS):
            try:
                p = _fill_reducing_perm(A, config.replace(ordering=method))
            except NotImplementedError:
                continue
            S = simplicial.symbolic_cholesky(A, p)
            if best_lnz is None or S.lnz < best_lnz:
                best_perm, best_lnz = p, S.lnz
        return best_perm
    raise ValueError(f"unsupported ordering {config.ordering}")


def analyze(A: CSC, config: Config = DEFAULT,
            perm: np.ndarray | None = None) -> SymbolicChol:
    """Symbolic Cholesky analysis: ordering + etree + counts
    (cholmod_analyze analog)."""
    from .stats import timed, GLOBAL_STATS
    if config.check_inputs:
        assert A.sym == 1, "analyze expects upper-stored symmetric (sym=1)"
    with timed("analyze"):
        if perm is None:
            perm = _fill_reducing_perm(A, config)
        S = simplicial.symbolic_cholesky(A, perm)
    if config.record_stats:
        GLOBAL_STATS.record("lnz", S.lnz)
        GLOBAL_STATS.record("fl", S.fl)
        GLOBAL_STATS.record("anz", A.nnz)
    return S


def factorize(A: CSC, S: SymbolicChol, config: Config = DEFAULT) -> Factor:
    """Numeric Cholesky factorization (cholmod_factorize analog).

    Chooses simplicial vs supernodal per ``config.factor_kind`` (AUTO uses the
    reference's flops-per-nnz switch, reference ``cholmod_core.h:456-463``)."""
    from .stats import timed
    kind = config.factor_kind
    if kind is FactorKind.AUTO:
        ratio = S.fl / max(S.lnz, 1)
        kind = (FactorKind.SUPERNODAL_LL if ratio >= config.supernodal_switch
                else FactorKind.SIMPLICIAL_LDL)
        if np.iscomplexobj(A.data) and kind is FactorKind.SIMPLICIAL_LDL:
            # LDL' is real-only (like the reference's supernodal LDL' gap);
            # Hermitian input routes to LL^H
            kind = FactorKind.SIMPLICIAL_LL
    if np.iscomplexobj(A.data) and kind is FactorKind.SUPERNODAL_LL:
        # the host supernodal kernels are real-only (they would silently
        # cast); complex supernodal work belongs to the embedded device
        # path (cholsol routes there) — direct factorize() falls back to
        # the complex-capable simplicial LL^H
        kind = FactorKind.SIMPLICIAL_LL
    with timed("factorize"):
        if kind is FactorKind.SIMPLICIAL_LL:
            F = simplicial.chol_up(A, S)
        elif kind is FactorKind.SIMPLICIAL_LDL:
            F = simplicial.ldl_up(A, S, dbound=config.dbound)
        elif kind is FactorKind.SUPERNODAL_LL:
            from .numeric import supernodal
            F = supernodal.factorize(A, S, config)
        else:
            raise ValueError(f"unsupported factor kind {kind}")
    if not F.ok and config.error_handler is not None:
        # reference error_handler callback contract (cholmod_core.h:565-573)
        config.error_handler(
            f"factorization not positive definite at column {F.minor}")
    return F


def solve(F: Factor, b: np.ndarray, config: Config = DEFAULT,
          sys: str = "A") -> np.ndarray:
    """x from a Cholesky factor (cholmod_solve analog). ``sys`` selects the
    reference's nine systems ("A", "LDLt", "LD", "DLt", "L", "Lt", "D", "P",
    "Pt" — ``cholmod_cholesky.h:179-187``); the default solves Ax=b.

    Supernodal factors with enough flops route to the device level-scheduled
    solve (cholmod_super_solve analog); everything else uses the host CSC
    solvers."""
    from .numeric.supernodal import SupernodalFactorAdapter
    from .stats import timed
    with timed("solve"):
        if (isinstance(F, SupernodalFactorAdapter) and sys == "A"
                and F.F.S.fl >= 5e6):
            from .numeric.supernodal_solve import solve_device
            return solve_device(F.F, b, config)
        if sys == "A":
            return chol_solve(F, b)
        # the adapter exposes L/perm/d — the system solves work on it directly
        return simplicial.solve_system(F, b, sys)


def cholsol(A: CSC, b: np.ndarray, config: Config = DEFAULT) -> np.ndarray:
    """One-call SPD solve (cs_cholsol / cholmod 'backslash' analog).

    Complex Hermitian problems with enough flops run on the device path via
    the 2x2 real embedding (numeric/complex_embed.py); small ones use the
    host complex kernels directly."""
    S = analyze(A, config)
    if np.iscomplexobj(A.data) and S.fl >= 2e6:
        from .numeric.complex_embed import cholsol_complex_device
        # reuse the ordering the analysis just computed (review finding:
        # the embedded path recomputed it from scratch)
        return cholsol_complex_device(A, b, config, perm=S.perm)
    F = factorize(A, S, config)
    return solve(F, b)


def lusol(A: CSC, b: np.ndarray, config: Config = DEFAULT) -> np.ndarray:
    """One-call general square solve via BTF + left-looking LU
    (cs_lusol / klu analog)."""
    from .numeric import lu
    return lu.lusol(A, b, config)


def qrsol(A: CSC, b: np.ndarray, config: Config = DEFAULT) -> np.ndarray:
    """Least-squares / underdetermined solve via sparse QR (cs_qrsol analog)."""
    from .numeric import qr
    return qr.qrsol(A, b, config)
