"""Supernodal (multifrontal) Cholesky numeric factorization.

Reference analog: ``CHOLMOD/Supernodal/cholmod_super_numeric.c`` /
``t_cholmod_super_numeric.c:93`` — but the dataflow is re-designed for TPU
rather than translated:

  * The reference is LEFT-looking: each supernode gathers dsyrk/dgemm updates
    from a dynamic descendant list (``Head/Next/Lpos``), which is irregular and
    sequential. Here the numeric phase is MULTIFRONTAL (right-looking over the
    supernode tree): each supernode's frontal matrix is assembled from the
    original matrix entries plus its children's update matrices (extend-add),
    then factored densely. The tree dataflow is static, child→parent — exactly
    what a static XLA program (and later the multi-host distribution, SURVEY
    §5.8) wants.
  * Supernodes at the same tree level are independent; the device path executes
    a level as a handful of BATCHED dense ops on shape-bucketed, padded fronts
    (MXU-shaped), with all gather/scatter index plans precomputed on host.

Two implementations with identical semantics:
  * :func:`factorize_host` — numpy, the correctness oracle and small-matrix path;
  * :func:`factorize_device` — JAX (XLA/TPU), batched-bucketed level execution.

``factorize`` dispatches per config/problem size. Output is a
:class:`SupernodalFactor` storing the flat panel array (CHOLMOD ``px`` layout),
convertible to CSC for the simplicial solvers, plus solve methods.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..config import Config, DEFAULT
from ..sparse import CSC
from ..symbolic.supernodes import SupernodalSymbolic, analyze_supernodal
from . import simplicial

__all__ = ["SupernodalFactor", "factorize", "factorize_host", "to_csc"]


@dataclasses.dataclass
class SupernodalFactor:
    """Numeric supernodal factor: A(p,p) = L L' with L stored as dense panels.

    Panel s is column-major (nrows, ncols) at ``S.Lpx[s] : S.Lpx[s+1]`` in
    ``Lx`` (reference ``L->px`` layout, ``cholmod_core.h:1659-1668``)."""

    S: SupernodalSymbolic
    Lx: np.ndarray  # flat panels; a DEVICE array (padded layout) on the
                    # device path, a host px-layout array on the host path
    minor: int      # = n if success
    layout: str = "px"  # "px" (CHOLMOD px host layout) | "device" (padded
                        # per-group buffers, see supernodal_device)
    _lx_px: np.ndarray | None = None

    @property
    def ok(self) -> bool:
        return self.minor == self.S.n

    @property
    def perm(self) -> np.ndarray:
        return self.S.perm

    def lx_host(self) -> np.ndarray:
        """Materialized host copy in the CHOLMOD px layout (cached)."""
        if self.layout == "px":
            if not isinstance(self.Lx, np.ndarray):
                self.Lx = np.asarray(self.Lx, dtype=np.float64)
            return self.Lx
        if self._lx_px is None:
            plan = self.S._device_plan
            Lh = np.asarray(self.Lx, dtype=np.float64)
            px = np.zeros(plan.lnz)
            px[plan.px_dst] = Lh[plan.px_src]
            self._lx_px = px
        return self._lx_px

    def panel(self, s: int) -> np.ndarray:
        S = self.S
        nr, nc = S.nrows(s), S.ncols(s)
        return self.lx_host()[S.Lpx[s]:S.Lpx[s + 1]].reshape(nr, nc, order="F")


def to_csc(F: SupernodalFactor) -> CSC:
    """Supernodal panels → CSC lower-triangular L (diagonal first per column)."""
    S = F.S
    n = S.n
    counts = np.zeros(n, dtype=np.int64)
    for s in range(S.nsuper):
        f, l = S.super_first[s], S.super_first[s + 1]
        nr = S.nrows(s)
        for k, j in enumerate(range(f, l)):
            counts[j] = nr - k
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    indices = np.empty(indptr[-1], dtype=np.int64)
    data = np.empty(indptr[-1])
    for s in range(S.nsuper):
        f, l = S.super_first[s], S.super_first[s + 1]
        P = F.panel(s)
        rr = S.rows[s]
        for k, j in enumerate(range(f, l)):
            lo = indptr[j]
            m = len(rr) - k
            indices[lo:lo + m] = rr[k:]
            data[lo:lo + m] = P[k:, k]
    return CSC(n, n, indptr, indices, data, 0)


def _assemble_front_host(C_low: CSC, S: SupernodalSymbolic, s: int,
                         updates: dict) -> np.ndarray:
    """Frontal matrix for supernode s: A entries + children extend-add."""
    rows = S.rows[s]
    nr = len(rows)
    f, l = S.super_first[s], S.super_first[s + 1]
    pos = {int(r): i for i, r in enumerate(rows)}
    Fm = np.zeros((nr, nr))
    for k, j in enumerate(range(f, l)):
        lo, hi = C_low.indptr[j], C_low.indptr[j + 1]
        rr = C_low.indices[lo:hi]
        vv = C_low.data[lo:hi]
        for r, v in zip(rr, vv):
            Fm[pos[int(r)], k] += v
    for (rows_c, U) in updates.pop(s, []):
        idx = np.searchsorted(rows, rows_c)
        Fm[np.ix_(idx, idx)] += U
    return Fm


def factorize_host(A: CSC, S: SupernodalSymbolic,
                   config: Config = DEFAULT) -> SupernodalFactor:
    """Numpy multifrontal factorization (oracle / small-matrix path)."""
    assert not np.iscomplexobj(A.data), (
        "host supernodal kernels are real-only; complex routes through "
        "numeric/complex_embed.py (cholsol does this automatically)")
    C = A.symperm(S.perm)
    C_low = C.transpose()  # lower triangle by columns, values included
    Lx = np.zeros(S.lnz)
    updates: dict = {}
    minor = S.n
    for s in range(S.nsuper):
        nc = S.ncols(s)
        Fm = _assemble_front_host(C_low, S, s, updates)
        F11 = Fm[:nc, :nc]
        # use the lower triangle only (assembly filled lower)
        F11 = np.tril(F11) + np.tril(F11, -1).T
        try:
            L11 = np.linalg.cholesky(F11)
        except np.linalg.LinAlgError:
            minor = int(S.super_first[s])
            break
        F21 = Fm[nc:, :nc]
        L21 = _solve_lower_right(F21, L11)  # F21 @ L11^{-T}
        panel = np.concatenate([L11, L21], axis=0)
        Lx[S.Lpx[s]:S.Lpx[s + 1]] = panel.ravel(order="F")
        p = S.sparent[s]
        if p != -1 and len(S.rows[s]) > nc:
            U = Fm[nc:, nc:] - L21 @ L21.T
            updates.setdefault(p, []).append((S.rows[s][nc:], U))
        elif len(S.rows[s]) > nc:
            pass  # root with below-rows cannot happen (rows end at n)
    return SupernodalFactor(S=S, Lx=Lx, minor=minor)


def _solve_lower_right(B: np.ndarray, L: np.ndarray) -> np.ndarray:
    """X = B @ L^{-T} for lower-triangular L (dtrsm right-transpose analog)."""
    # solve L X' = B'  =>  X' = forward substitution
    return np.linalg.solve(L, B.T).T if B.size else B.reshape(B.shape)


def factorize(A: CSC, S_or_simpl, config: Config = DEFAULT):
    """Entry point used by the package-level ``factorize`` dispatcher.

    Accepts either a :class:`SupernodalSymbolic` or a simplicial
    ``SymbolicChol`` (in which case supernodal analysis is run with the same
    permutation)."""
    if isinstance(S_or_simpl, SupernodalSymbolic):
        S = S_or_simpl
    else:
        S = getattr(S_or_simpl, "_super", None)
        if S is None:
            S = analyze_supernodal(A, S_or_simpl.perm, config)
            S_or_simpl._super = S  # analyze once, factor many
    use_device = _should_use_device(S, config) \
        and not np.iscomplexobj(A.data)   # complex routes via the embedding
    if use_device:
        from . import supernodal_device
        F = supernodal_device.factorize_device(A, S, config)
    else:
        F = factorize_host(A, S, config)
    return SupernodalFactorAdapter(F)


def _should_use_device(S: SupernodalSymbolic, config: Config) -> bool:
    # device pays off once panels carry real flops; below the threshold the
    # numpy multifrontal wins on dispatch overhead (the reference makes the
    # same call with its GPU thresholds, cholmod_gpu.h:33-35)
    return S.fl >= 5e6


@dataclasses.dataclass
class SupernodalFactorAdapter:
    """Adapts a SupernodalFactor to the simplicial Factor solve interface."""

    F: SupernodalFactor
    _Lcsc: CSC | None = None

    @property
    def ok(self) -> bool:
        return self.F.ok

    @property
    def minor(self) -> int:
        return self.F.minor

    @property
    def perm(self) -> np.ndarray:
        return self.F.perm

    @property
    def d(self):
        return None

    @property
    def L(self) -> CSC:
        if self._Lcsc is None:
            self._Lcsc = to_csc(self.F)
        return self._Lcsc
