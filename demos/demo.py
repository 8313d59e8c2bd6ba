"""Demo driver over the reference fixture set, reference-style output.

Analog of ``CSparse/Demo/cs_demo2.c`` + ``CHOLMOD/Demo/cholmod_demo.c``: for
each fixture, run the matching one-call solver and print the normalized
residual ``norm(Ax-b,inf)/(norm(A,1)*norm(x,inf)+norm(b,inf))``
(``cs_demo.c:52``) plus analysis stats (fl, lnz — ``cholmod_demo.c:209``).
The checked-in ``demo.out`` is the golden output (residual columns must stay
at/below the recorded magnitudes; see tests/test_demo.py).

Run: python demos/demo.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("SSTPU_DEMO_CPU"):
    # the axon sitecustomize pre-imports jax, so env vars are too late —
    # switch platform via config (tests run the demo on CPU)
    import jax
    jax.config.update("jax_platforms", "cpu")

import suitesparse_tpu as sst                                  # noqa: E402
from suitesparse_tpu.io import fixtures                        # noqa: E402


def run_one(name: str, A, kind: str) -> str:
    n = A.ncol
    b = 1.0 + np.arange(max(A.nrow, 1)) / max(A.nrow, 1)
    if kind == "chol":
        S = sst.analyze(A)
        F = sst.factorize(A, S)
        x = sst.solve(F, b[:n])
        resid = sst.residual_norm(A, x, b[:n])
        # fp64 iterative refinement (umfpack_solve.c:102 IRSTEP pattern):
        # the double-precision numerical contract — fp32 device factors
        # refine to cs_demo-class double residuals
        for _ in range(3):
            r = b[:n] - A.matvec(x)
            x = x + sst.solve(F, r)
        resid_ir = sst.residual_norm(A, x, b[:n])
        extra = (f"ir3={resid_ir:8.1e} lnz={S.lnz:<9d} fl={S.fl:.3e}")
    elif kind == "lu":
        x = sst.lusol(A, b[:n])
        resid = sst.residual_norm(A, x, b[:n])
        extra = ""
    else:
        x = sst.qrsol(A, b[:A.nrow])
        if A.nrow < A.ncol:
            # underdetermined: min-norm solution solves Ax = b exactly
            resid = sst.residual_norm(A, x, b[:A.nrow])
            extra = "(min-norm)"
        else:
            # overdetermined: least-squares gradient norm (A'r ~ 0)
            r = A.matvec(x) - b[:A.nrow]
            g = A.rmatvec(r)
            denom = A.norm1() * max(np.abs(r).max(), 1e-300)
            resid = float(np.abs(g).max() / denom)
            extra = "(lstsq: |A'r|/(|A||r|))"
    return (f"{name:<12} n={A.nrow:>5}x{A.ncol:<5} nnz={A.nnz:<7d} "
            f"{kind:<4} resid={resid:9.2e}  {extra}")


def main() -> None:
    print("suitesparse_tpu demo (cs_demo2 / cholmod_demo analog)")
    jobs = []
    for name in ("t1", "bcsstk01", "bcsstk16", "west0067", "ibm32a",
                 "lp_afiro"):
        try:
            A = fixtures.load_demo(name)
        except (FileNotFoundError, OSError):
            continue
        if A.sym == 1:
            jobs.append((name, A, "chol"))
        elif A.nrow == A.ncol:
            jobs.append((name, A, "lu"))
        else:
            jobs.append((name, A, "qr"))
    jobs.append(("lap3d(12)", fixtures.laplacian_3d(12), "chol"))
    jobs.append(("rand_spd", fixtures.random_spd(200, 0.05, seed=1), "chol"))
    for name, A, kind in jobs:
        print(run_one(name, A, kind))


if __name__ == "__main__":
    main()
