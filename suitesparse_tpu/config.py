"""Runtime configuration for suitesparse_tpu.

One dataclass replaces the reference's three-tier knob system (compile-time
``SuiteSparse_config.mk``, runtime structs ``cholmod_common``/``klu_common``, and plain
``Control[]`` arrays — see reference ``CHOLMOD/Include/cholmod_core.h:414-1024``,
``KLU/Include/klu.h:139``, ``UMFPACK/Include/umfpack.h:261-300``).

Defaults reproduce the reference's numerical contract (reference
``cholmod_core.h:456-510``, ``klu_defaults.c:20-32``, ``umfpack.h:261-300``,
``spqr_tol.cpp:23``).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Callable, Sequence


class Ordering(enum.Enum):
    """Fill-reducing ordering method (reference ``cholmod_core.h:599-623``)."""

    NATURAL = "natural"
    GIVEN = "given"
    AMD = "amd"
    COLAMD = "colamd"
    METIS = "nd"          # nested dissection (METIS_NodeND analog)
    NESDIS = "nesdis"     # CHOLMOD-style ND + constrained min-degree
    BEST = "best"         # try several, keep lowest nnz(L) (cholmod_analyze.c:451-486)


class FactorKind(enum.Enum):
    """What kind of factorization to compute."""

    SIMPLICIAL_LL = "simplicial_ll"
    SIMPLICIAL_LDL = "simplicial_ldl"
    SUPERNODAL_LL = "supernodal_ll"
    AUTO = "auto"  # supernodal iff flops/nnz(L) >= supernodal_switch


@dataclasses.dataclass
class Config:
    """All runtime knobs, with reference-parity defaults."""

    # ----- Cholesky analysis (cholmod_common analog) -----
    ordering: Ordering = Ordering.AMD
    factor_kind: FactorKind = FactorKind.AUTO
    # supernodal iff fl/lnz >= this (reference cholmod_core.h:456-463)
    supernodal_switch: float = 40.0
    # relaxed supernode amalgamation (reference cholmod_core.h:495-510,
    # cholmod_super_symbolic.c:475-560)
    grow_ratio: float = 1.2
    nrelax: Sequence[int] = (4, 16, 48)
    zrelax: Sequence[float] = (0.8, 0.1, 0.05)
    # bound on D entries for LDL' (cholmod_core.h:420-430)
    dbound: float = 0.0

    # ----- AMD (reference amd.h:316-320 Control[]) -----
    amd_dense: float = 10.0          # rows with deg > dense*sqrt(n) postponed
    amd_aggressive: bool = True      # aggressive absorption

    # ----- COLAMD (reference colamd.h knobs) -----
    colamd_dense_row: float = 10.0
    colamd_dense_col: float = 10.0

    # ----- nested dissection (reference cholmod_core.h:702-731) -----
    nd_small: int = 200              # stop dissecting below this many nodes
    nd_oksep: float = 1.0            # accept separator if |S| <= oksep * n
    nd_components: bool = True       # split connected components

    # ----- LU / KLU (reference klu_defaults.c:20-32) -----
    lu_pivot_tol: float = 0.001      # diagonal-preference threshold (klu tol)
    lu_memgrow: float = 1.2
    lu_btf: bool = True
    # maxtrans work budget, multiples of nnz; <=0 = unlimited (klu maxwork /
    # reference btf.h:206)
    btf_work_limit: float = -1.0
    lu_scale: int = 2                # 0 none, 1 row-sum, 2 row-max (klu scale)
    halt_if_singular: bool = True

    # ----- UMFPACK-style multifrontal LU (reference umfpack.h:261-300) -----
    umf_pivot_tol: float = 0.1
    umf_sym_pivot_tol: float = 0.001
    umf_block_size: int = 32
    ir_steps: int = 2                # iterative-refinement sweeps (UMFPACK_IRSTEP)

    # ----- QR (reference spqr_tol.cpp:23) -----
    # rank-detection tolerance; <0 means 20*(m+n)*eps*max column 2-norm
    qr_tol: float = -1.0

    # ----- TPU execution -----
    panel_pad: int = 128             # pad supernode panels to multiples (MXU lanes)
    sublane_pad: int = 8             # second-to-last dim padding for f32
    leaf_batch: bool = True          # batch independent leaf supernodes
    use_pallas: bool = True          # custom kernels where beneficial; else pure XLA
    compute_dtype: str = "float32"   # numeric dtype on device
    accum_dtype: str = "float32"     # accumulation dtype
    # store child update matrices in bfloat16 (halves extend-add traffic,
    # doubles MXU rate for the placement matmuls; fronts/panels stay fp32,
    # accumulation is fp32). Pair with solve-side iterative refinement
    # (solve_refined) to recover fp32-class residuals.
    update_dtype: str = "float32"
    precision: str = "highest"       # jax.lax.Precision for MXU matmuls

    # ----- diagnostics -----
    check_inputs: bool = True        # run invariant checkers on API entry
    record_stats: bool = True

    # ----- failure handling (reference cholmod_core.h:565-573 error_handler) -----
    error_handler: Callable[[str], None] | None = None

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


DEFAULT = Config()
