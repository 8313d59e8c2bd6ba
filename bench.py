"""Benchmark: supernodal Cholesky factorization throughput on the local device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Workload: 3-D Laplacian (the nd3k/nd24k-class model problem from the reference
paper's test set, BASELINE.md) — nested-dissection ordering, supernodal
analysis, then steady-state numeric factorization on device (the
analyze-once/factor-many regime the reference optimizes for). Metric is
factorization GFLOP/s from the exact symbolic flop count (S.fl, same
accounting as CHOLMOD's ``cm->fl``).

vs_baseline: ratio against the reference's CPU-only supernodal CHOLMOD peak
(~190 GFlop/s dp on 2x Xeon E5-2690v2 — BASELINE.md; its GPU-accelerated peak
is 783). Single v5e chip, fp32.

Timing methodology: the factorization call's success check performs a scalar
device reduction, which is the synchronization point (``block_until_ready`` is
unreliable on the axon platform).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_CPU_GFLOPS = 190.0


def main() -> None:
    size = int(os.environ.get("BENCH_SIZE", "30"))
    os.environ.setdefault("SSTPU_PLAN_CONSTS", "1")
    import jax
    import suitesparse_tpu as sst
    from suitesparse_tpu.io import fixtures
    from suitesparse_tpu.ordering import nested_dissection_order
    from suitesparse_tpu.symbolic.supernodes import analyze_supernodal
    from suitesparse_tpu.numeric import supernodal_device, supernodal_solve

    platform = jax.devices()[0].platform
    A = fixtures.laplacian_3d(size)
    n = A.ncol
    t0 = time.time()
    p = nested_dissection_order(A)
    t_ord = time.time() - t0
    t0 = time.time()
    S = analyze_supernodal(A, p)
    t_sym = time.time() - t0

    cfg = sst.DEFAULT
    t0 = time.time()
    F = supernodal_device.factorize_device(A, S, cfg)
    t_first = time.time() - t0
    assert F.ok, f"factorization failed at column {F.minor}"

    # steady state (amortized analyze-once/factor-many)
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        F = supernodal_device.factorize_device(A, S, cfg)
    t_factor = (time.time() - t0) / reps

    # correctness gate: device solve, reference residual norm
    b = 1.0 + np.arange(n) / n
    x = supernodal_solve.solve_device(F, b, cfg)
    resid = sst.residual_norm(A, x, b)
    assert resid < 1e-2, f"residual {resid} out of range"  # fp32 factor

    gflops = S.fl / t_factor / 1e9
    print(json.dumps({
        "metric": "supernodal_cholesky_fp32_gflops",
        "value": round(gflops, 3),
        "unit": "GFLOP/s",
        "vs_baseline": round(gflops / BASELINE_CPU_GFLOPS, 4),
        "n": n,
        "nnzA": A.nnz,
        "lnz_panels": S.lnz,
        "flops": S.fl,
        "nsuper": S.nsuper,
        "factor_s": round(t_factor, 4),
        "first_call_s": round(t_first, 2),
        "analyze_s": round(t_ord + t_sym, 2),
        "residual": float(resid),
        "platform": platform,
    }))


if __name__ == "__main__":
    sys.exit(main())
