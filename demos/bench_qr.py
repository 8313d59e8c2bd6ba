"""Sparse least-squares QR benchmark (SPQR-class workload).

Reference row (same host, round 3, netlib BLAS, 1 core): SuiteSparseQR
on a 6k x 2k local-coupling least-squares fixture: qrsol 3.47 s first /
3.19 s repeat. Our CPU execution of the same class ran 3.8 s repeat
(pattern-cached). This demo measures the TPU device path under the
analyze-once/solve-many contract.

Fixture: m x n with each row coupling ``k`` consecutive columns at a
random offset (the local-coupling pattern of mesh/least-squares
collocation problems), plus n anchor rows so A has full column rank.

Run: python demos/bench_qr.py [m n]   (TPU; JAX_PLATFORMS=cpu for host)
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
from suitesparse_tpu.sparse import CSC  # noqa: E402


def local_coupling_ls(m: int, n: int, k: int = 6, seed: int = 3) -> CSC:
    rng = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    for i in range(m - n):
        j0 = rng.integers(0, n - k)
        rows.append(np.full(k, i))
        cols.append(j0 + np.arange(k))
        vals.append(rng.standard_normal(k))
    # anchor rows: unit diagonal block guarantees full column rank
    rows.append(m - n + np.arange(n))
    cols.append(np.arange(n))
    vals.append(np.ones(n))
    from suitesparse_tpu.sparse import from_triplets
    return from_triplets(m, n, np.concatenate(rows), np.concatenate(cols),
                         np.concatenate(vals), sym=0)


def main() -> None:
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    A = local_coupling_ls(m, n)
    rng = np.random.default_rng(7)
    b = rng.standard_normal(m)
    t0 = time.time()
    x = sst.qrsol(A, b)
    t_first = time.time() - t0
    # least-squares optimality: A' (b - A x) ~ 0
    r = b - A.matvec(x)
    atr = np.abs(A.rmatvec(r) if hasattr(A, "rmatvec")
                 else A.transpose().matvec(r)).max()
    scale = np.abs(A.data).max() * max(np.abs(r).max(), 1e-30)
    t_steady = float("inf")
    for _trial in range(3):
        t0 = time.time()
        x = sst.qrsol(A, b)
        t_steady = min(t_steady, time.time() - t0)
    print(json.dumps({
        "metric": "sparse_qr_lsq_solve",
        "m": m, "n": n, "nnz": A.nnz,
        "first_s": round(t_first, 3),
        "steady_s": round(t_steady, 3),
        "normal_eq_resid": float(atr / scale),
        "platform": jax.devices()[0].platform,
        "reference_spqr_this_host": {
            "first_s": 3.47, "repeat_s": 3.19,
            "note": "netlib BLAS, 1 core, same fixture class (round 3)"},
    }))


if __name__ == "__main__":
    main()
