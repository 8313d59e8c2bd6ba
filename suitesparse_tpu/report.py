"""Info accounting + report_* family — the UMFPACK ``Info[90]`` /
``umfpack_report_*`` analog (reference ``umfpack.h:38``, the ten
``umfpack_report_*.c`` files) and CHOLMOD's ``cholmod_print_common``.

``Info`` is a typed dataclass instead of a bare double array: sizes,
strategy/ordering actually used, nnz of the factors, flop counts, and the
plan's working-set accounting (the TPU analog of UMFPACK's peak-memory
entries). ``report_*`` functions render each object at a verbosity level
(``prl`` mirrors ``Control[UMFPACK_PRL]``).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .sparse import CSC

__all__ = ["Info", "info_from_symbolic", "info_from_factor",
           "report_matrix", "report_symbolic", "report_factor",
           "report_info", "report_perm"]


@dataclasses.dataclass
class Info:
    """Accounting record (umfpack Info[] analog, typed)."""

    n_row: int = 0
    n_col: int = 0
    nnz_a: int = 0
    strategy: str = ""            # "supernodal-ll" / "simplicial-ldl" / ...
    ordering: str = ""            # ordering actually used
    nnz_l: int = 0                # nnz(L) (panel cells for device factors)
    nnz_u: int = 0                # nnz(U) (LU paths; 0 for Cholesky)
    flops: float = 0.0            # factorization flop count
    nsuper: int = 0
    nlevels: int = 0
    peak_cells: int = 0           # estimated device working set (cells)
    factor_cells: int = 0         # device factor buffer size
    analyze_seconds: float = 0.0
    factor_seconds: float = 0.0
    # ---- per-phase accounting (UMFPACK Info[] granularity, r3) ----
    chol_flops: float = 0.0       # dense-diagonal-block factorizations
    trsm_flops: float = 0.0       # panel triangular solves
    syrk_flops: float = 0.0       # Schur-complement updates
    assembly_cells: float = 0.0   # extend-add traffic (child update cells)
    pad_ratio: float = 0.0        # device panel cells / strict lnz
    ngroups: int = 0              # compiled group steps
    npair_classes: int = 0        # extend-add pair classes
    nsegments: int = 0            # segmented-execution program count
    seg_budget_cells: int = 0     # per-segment working-set budget
    peak_bytes: float = 0.0       # estimated peak device bytes (fp32)
    ir_steps: int = 0             # iterative-refinement sweeps configured

    def as_array(self) -> np.ndarray:
        """Flat double array for UMFPACK-style consumers (stable order;
        round-3 fields appended — existing indices unchanged)."""
        return np.array([
            self.n_row, self.n_col, self.nnz_a, self.nnz_l, self.nnz_u,
            self.flops, self.nsuper, self.nlevels, self.peak_cells,
            self.factor_cells, self.analyze_seconds, self.factor_seconds,
            self.chol_flops, self.trsm_flops, self.syrk_flops,
            self.assembly_cells, self.pad_ratio, self.ngroups,
            self.npair_classes, self.nsegments, self.seg_budget_cells,
            self.peak_bytes, self.ir_steps,
        ], dtype=np.float64)


def info_from_symbolic(S, A: CSC | None = None) -> Info:
    """Populate Info from a supernodal (or simplicial) symbolic object."""
    info = Info()
    if A is not None:
        info.n_row, info.n_col, info.nnz_a = A.nrow, A.ncol, A.nnz
    n = getattr(S, "n", 0)
    info.n_row = info.n_row or n
    info.n_col = info.n_col or n
    info.nnz_l = int(getattr(S, "lnz", 0))
    info.flops = float(getattr(S, "fl", 0.0))
    info.nsuper = int(getattr(S, "nsuper", 0))
    levels = getattr(S, "levels", None)
    info.nlevels = len(levels) if levels is not None else 0
    info.strategy = "supernodal-ll" if info.nsuper else "simplicial"
    # per-phase flop split (umfpack Info's per-kernel accounting analog):
    # chol = nc^3/3 per supernode, trsm = ru*nc^2, syrk = ru^2*nc
    if info.nsuper and hasattr(S, "super_first"):
        nc = (np.asarray(S.super_first[1:])
              - np.asarray(S.super_first[:-1])).astype(np.float64)
        nr = np.array([S.nrows(s) for s in range(info.nsuper)],
                      dtype=np.float64)
        ru = nr - nc
        info.chol_flops = float((nc ** 3 / 3).sum())
        info.trsm_flops = float((ru * nc * nc).sum())
        info.syrk_flops = float((ru * ru * nc).sum())
        info.assembly_cells = float((ru * ru).sum())
    plan = getattr(S, "_device_plan", None)
    if plan is not None:
        from .numeric.supernodal_device import _estimate_group_cells
        info.factor_cells = int(plan.dev_size)
        info.peak_cells = int(max(
            (_estimate_group_cells(g) for gl in plan.groups for g in gl),
            default=0))
        info.pad_ratio = (float(plan.dev_size) / max(info.nnz_l, 1))
        info.ngroups = sum(len(gl) for gl in plan.groups)
        info.npair_classes = sum(len(g.pairs) for gl in plan.groups
                                 for g in gl)
        info.peak_bytes = 4.0 * (plan.dev_size + info.peak_cells)
    seg = getattr(S, "_seg_cache", None)
    if seg is not None:
        info.nsegments = len(seg[2])
        import os
        info.seg_budget_cells = int(float(
            os.environ.get("SSTPU_SEG_CELLS", "3e8")))
    return info


def info_from_factor(F, A: CSC | None = None) -> Info:
    S = getattr(F, "S", None) or getattr(getattr(F, "F", None), "S", None)
    info = info_from_symbolic(S, A) if S is not None else Info()
    lx = getattr(F, "Lx", None)
    if lx is None and hasattr(F, "F"):
        lx = getattr(F.F, "Lx", None)
    if lx is not None and hasattr(lx, "size"):
        info.factor_cells = int(lx.size)
    return info


def _p(prl: int, level: int, line: str, out: list) -> None:
    if prl >= level:
        out.append(line)


def report_matrix(A: CSC, name: str = "A", prl: int = 3) -> str:
    """umfpack_report_matrix / cholmod_print_sparse analog."""
    out: list = []
    _p(prl, 1, f"{name}: {A.nrow}-by-{A.ncol}, nnz {A.nnz}, "
       f"sym {A.sym}, dtype {A.data.dtype}", out)
    if prl >= 2 and A.nnz:
        degs = np.diff(A.indptr)
        _p(prl, 2, f"  col degrees: min {degs.min()} max {degs.max()} "
           f"mean {degs.mean():.1f}", out)
        _p(prl, 2, f"  |a|: min {np.abs(A.data).min():.3e} "
           f"max {np.abs(A.data).max():.3e}", out)
    if prl >= 4:
        k = min(A.ncol, 4)
        for j in range(k):
            lo, hi = A.indptr[j], A.indptr[j + 1]
            _p(prl, 4, f"  col {j}: rows {A.indices[lo:hi][:8].tolist()} "
               f"vals {np.asarray(A.data[lo:hi][:4]).tolist()}", out)
    return "\n".join(out)


def report_symbolic(S, prl: int = 3) -> str:
    """umfpack_report_symbolic analog."""
    info = info_from_symbolic(S)
    out: list = []
    _p(prl, 1, f"symbolic: n {info.n_col}, strategy {info.strategy}, "
       f"nnz(L) {info.nnz_l}, flops {info.flops:.3e}", out)
    _p(prl, 2, f"  supernodes {info.nsuper}, tree levels {info.nlevels}", out)
    if info.peak_cells:
        _p(prl, 2, f"  device factor cells {info.factor_cells}, "
           f"largest group working set {info.peak_cells}", out)
    return "\n".join(out)


def report_factor(F, prl: int = 3) -> str:
    """umfpack_report_numeric / cholmod_print_factor analog."""
    info = info_from_factor(F)
    ok = getattr(F, "ok", None)
    minor = getattr(F, "minor", None)
    out: list = []
    _p(prl, 1, f"factor: n {info.n_col}, ok {ok}, minor {minor}, "
       f"stored cells {info.factor_cells}", out)
    return "\n".join(out)


def report_perm(p: np.ndarray, prl: int = 3) -> str:
    """umfpack_report_perm analog (with validity check)."""
    p = np.asarray(p)
    n = p.size
    valid = bool(np.array_equal(np.sort(p), np.arange(n)))
    head = p[: min(n, 8)].tolist()
    return f"perm: length {n}, valid {valid}, head {head}"


def report_info(info: Info, prl: int = 3) -> str:
    """umfpack_report_info analog."""
    out: list = []
    _p(prl, 1, f"Info: {info.n_row}-by-{info.n_col}, nnz(A) {info.nnz_a}", out)
    _p(prl, 1, f"  strategy {info.strategy or '-'}  ordering "
       f"{info.ordering or '-'}", out)
    _p(prl, 1, f"  nnz(L) {info.nnz_l}  nnz(U) {info.nnz_u}  "
       f"flops {info.flops:.3e}", out)
    _p(prl, 2, f"  supernodes {info.nsuper}  levels {info.nlevels}", out)
    _p(prl, 2, f"  factor cells {info.factor_cells}  peak group cells "
       f"{info.peak_cells}", out)
    _p(prl, 2, f"  analyze {info.analyze_seconds:.3f}s  factor "
       f"{info.factor_seconds:.3f}s", out)
    if info.chol_flops:
        _p(prl, 2, f"  flop split: chol {info.chol_flops:.3e}  trsm "
           f"{info.trsm_flops:.3e}  syrk {info.syrk_flops:.3e}", out)
        _p(prl, 2, f"  assembly cells {info.assembly_cells:.3e}", out)
    if info.ngroups:
        _p(prl, 2, f"  groups {info.ngroups}  pair classes "
           f"{info.npair_classes}  pad ratio {info.pad_ratio:.2f}", out)
        _p(prl, 2, f"  est peak device bytes {info.peak_bytes:.3e}", out)
    if info.nsegments:
        _p(prl, 2, f"  segments {info.nsegments}  budget cells "
           f"{info.seg_budget_cells}", out)
    return "\n".join(out)
