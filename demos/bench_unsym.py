"""Unsymmetric multifrontal LU benchmark (UMFPACK-class workload).

Reference to beat (same host, gcc -O2 -DDLONG -DNCHOLMOD, netlib BLAS,
measured round 3): FEM-pattern unsym n=27,000 / nnz=183,600
(laplacian_3d(30) pattern + 0.2*N(0,1) values, seed 1):
  umfpack_dl symbolic 0.062 s, numeric 5.50 s first / 3.03 s repeat
  (1.01e10 flops = 3.33 GF/s), solve 42.5 ms.

Run: python demos/bench_unsym.py [nx]   (TPU; JAX_PLATFORMS=cpu for host)
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/sstpu_jax"))
import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import suitesparse_tpu as sst  # noqa: E402
from suitesparse_tpu.io import fixtures  # noqa: E402
from suitesparse_tpu.numeric import mflu_unsym  # noqa: E402


def main() -> None:
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    rng = np.random.default_rng(1)
    A = fixtures.laplacian_3d(nx)
    M = A.to_full_storage()
    M.data = M.data + 0.2 * rng.standard_normal(M.nnz)
    b = np.ones(M.ncol)
    # one-shot end-to-end latency (analyze + plan + compile + solve)
    t0 = time.time()
    x = mflu_unsym.mflusol_unsym(M, b, sst.DEFAULT)
    t_first = time.time() - t0
    resid = sst.residual_norm(M, x, b)
    # the reference row is umfpack's NUMERIC REPEAT (symbolic cached) —
    # the analyze-once/factor-many contract. Match it: analyze once,
    # then time factor+solve with the symbolic (plan + compiled program)
    # cached, values fresh each call.
    t0 = time.time()
    SL = mflu_unsym.analyze_mflu_unsym(M, sst.DEFAULT)
    t_analyze = time.time() - t0
    _ = mflu_unsym.lu_unsym_solve_device(M, b, sst.DEFAULT, SL=SL)  # warm
    t_steady = float("inf")
    for _trial in range(3):
        t0 = time.time()
        x2 = mflu_unsym.lu_unsym_solve_device(M, b, sst.DEFAULT, SL=SL)
        t_steady = min(t_steady, time.time() - t0)
    resid2 = sst.residual_norm(M, np.asarray(x2, dtype=np.float64), b)
    print(json.dumps({
        "metric": "mflu_unsym_solve",
        "n": M.ncol, "nnz": M.nnz,
        "first_s": round(t_first, 3),
        "analyze_s": round(t_analyze, 3),
        "steady_factor_solve_s": round(t_steady, 3),
        "residual": float(resid), "residual_steady": float(resid2),
        "platform": jax.devices()[0].platform,
        "reference_umfpack_this_host": {
            "symbolic_s": 0.062, "numeric_repeat_s": 3.03,
            "solve_s": 0.0425,
            "flops": 1.01e10, "note": "netlib BLAS, 1 core"},
    }))


if __name__ == "__main__":
    main()
