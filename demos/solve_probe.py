"""Solve-latency decomposition probe (round-5 measurement tool).

Factors the bench model problem once, then times the single-RHS device
solve under a matrix of mode knobs — including the measurement-only
ablations (SSTPU_SOLVE_ABLATE=route drops the pair routing,
=panel drops the panel matvecs) that decompose the sweep into its two
cost halves. One process per config is NOT needed: the solve caches key
on the env knobs read at build time, so this script clears the caches
between configs in-process.

Usage:  python demos/solve_probe.py [size]     (default 50 = n=125k)
Writes one JSON line per config to stdout.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

CONFIGS = [
    # (name, env)
    ("inv_coarse", {"SSTPU_SOLVE_INV": "1", "SSTPU_SOLVE_COARSE": "1"}),
    ("inv_coarse_route0", {"SSTPU_SOLVE_INV": "1", "SSTPU_SOLVE_COARSE": "1",
                           "SSTPU_SOLVE_ABLATE": "route"}),
    ("inv_coarse_panel0", {"SSTPU_SOLVE_INV": "1", "SSTPU_SOLVE_COARSE": "1",
                           "SSTPU_SOLVE_ABLATE": "panel"}),
    ("w2_coarse", {"SSTPU_SOLVE_INV": "1", "SSTPU_SOLVE_COARSE": "1",
                   "SSTPU_SOLVE_W2": "1"}),
    ("inv_fine", {"SSTPU_SOLVE_INV": "1", "SSTPU_SOLVE_COARSE": "0"}),
    ("inv_fine_route0", {"SSTPU_SOLVE_INV": "1", "SSTPU_SOLVE_COARSE": "0",
                         "SSTPU_SOLVE_ABLATE": "route"}),
    ("inv_fine_panel0", {"SSTPU_SOLVE_INV": "1", "SSTPU_SOLVE_COARSE": "0",
                         "SSTPU_SOLVE_ABLATE": "panel"}),
    ("w2_fine", {"SSTPU_SOLVE_INV": "1", "SSTPU_SOLVE_COARSE": "0",
                 "SSTPU_SOLVE_W2": "1"}),
    ("w2_fine_bmv", {"SSTPU_SOLVE_INV": "1", "SSTPU_SOLVE_COARSE": "0",
                     "SSTPU_SOLVE_W2": "1", "SSTPU_SOLVE_BMV": "1"}),
    ("w2_coarse_bmv", {"SSTPU_SOLVE_INV": "1", "SSTPU_SOLVE_COARSE": "1",
                       "SSTPU_SOLVE_W2": "1", "SSTPU_SOLVE_BMV": "1"}),
    ("w2_fine_fuse", {"SSTPU_SOLVE_INV": "1", "SSTPU_SOLVE_COARSE": "0",
                      "SSTPU_SOLVE_W2": "1",
                      "SSTPU_SOLVE_FUSE_ROUTE": "1"}),
    ("w2_fine_fuse_bmv", {"SSTPU_SOLVE_INV": "1", "SSTPU_SOLVE_COARSE": "0",
                          "SSTPU_SOLVE_W2": "1", "SSTPU_SOLVE_BMV": "1",
                          "SSTPU_SOLVE_FUSE_ROUTE": "1"}),
    ("w2_coarse_fuse", {"SSTPU_SOLVE_INV": "1", "SSTPU_SOLVE_COARSE": "1",
                        "SSTPU_SOLVE_W2": "1",
                        "SSTPU_SOLVE_FUSE_ROUTE": "1"}),
    ("w2_fine_all", {"SSTPU_SOLVE_INV": "1", "SSTPU_SOLVE_COARSE": "0",
                     "SSTPU_SOLVE_W2": "1", "SSTPU_SOLVE_BMV": "1",
                     "SSTPU_SOLVE_PMV": "1",
                     "SSTPU_SOLVE_FUSE_ROUTE": "1"}),
    ("w2_fine_pmv", {"SSTPU_SOLVE_INV": "1", "SSTPU_SOLVE_COARSE": "0",
                     "SSTPU_SOLVE_W2": "1", "SSTPU_SOLVE_PMV": "1"}),
    ("w2_fine_route0", {"SSTPU_SOLVE_INV": "1", "SSTPU_SOLVE_COARSE": "0",
                        "SSTPU_SOLVE_W2": "1",
                        "SSTPU_SOLVE_ABLATE": "route"}),
    ("w2_fine_panel0", {"SSTPU_SOLVE_INV": "1", "SSTPU_SOLVE_COARSE": "0",
                        "SSTPU_SOLVE_W2": "1",
                        "SSTPU_SOLVE_ABLATE": "panel"}),
    ("w2_fine_sort", {"SSTPU_SOLVE_INV": "1", "SSTPU_SOLVE_COARSE": "0",
                      "SSTPU_SOLVE_W2": "1", "SSTPU_SOLVE_SORT": "1"}),
    ("inv_fine_sort", {"SSTPU_SOLVE_INV": "1", "SSTPU_SOLVE_COARSE": "0",
                       "SSTPU_SOLVE_SORT": "1"}),
    ("w2_pow2", {"SSTPU_SOLVE_INV": "1", "SSTPU_SOLVE_COARSE": "1",
                 "SSTPU_SOLVE_LADDER": "pow2", "SSTPU_SOLVE_W2": "1"}),
    ("w2_pow2_route0", {"SSTPU_SOLVE_INV": "1", "SSTPU_SOLVE_COARSE": "1",
                        "SSTPU_SOLVE_LADDER": "pow2", "SSTPU_SOLVE_W2": "1",
                        "SSTPU_SOLVE_ABLATE": "route"}),
    # NOTE: SSTPU_SOLVE_SORT defaults ON since the round-5 A/B; merge
    # configs must disable it (mutually exclusive paths)
    ("w2_fine_merge", {"SSTPU_SOLVE_INV": "1", "SSTPU_SOLVE_COARSE": "0",
                       "SSTPU_SOLVE_W2": "1", "SSTPU_SOLVE_MERGE": "1",
                       "SSTPU_SOLVE_SORT": "0"}),
    ("inv_fine_merge", {"SSTPU_SOLVE_INV": "1", "SSTPU_SOLVE_COARSE": "0",
                        "SSTPU_SOLVE_MERGE": "1", "SSTPU_SOLVE_SORT": "0"}),
    ("w2_fine_nosort", {"SSTPU_SOLVE_INV": "1", "SSTPU_SOLVE_COARSE": "0",
                        "SSTPU_SOLVE_W2": "1", "SSTPU_SOLVE_SORT": "0"}),
]

_KNOBS = ["SSTPU_SOLVE_INV", "SSTPU_SOLVE_COARSE", "SSTPU_SOLVE_W2",
          "SSTPU_SOLVE_BMV", "SSTPU_SOLVE_ABLATE", "SSTPU_BMV_BMIN",
          "SSTPU_SOLVE_FUSE_ROUTE", "SSTPU_SOLVE_PMV", "SSTPU_SOLVE_SORT",
          "SSTPU_SOLVE_LADDER", "SSTPU_SOLVE_MERGE"]


def main() -> None:
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    only = set(sys.argv[2:])
    os.environ.setdefault("SSTPU_PLAN_CONSTS", "1")
    import jax
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser("~/.cache/sstpu_jax"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import suitesparse_tpu as sst
    from suitesparse_tpu.io import fixtures
    from suitesparse_tpu.ordering import nested_dissection_order
    from suitesparse_tpu.symbolic.supernodes import analyze_supernodal
    from suitesparse_tpu.numeric import supernodal_device, supernodal_solve

    A = fixtures.laplacian_3d(size)
    n = A.ncol
    p = nested_dissection_order(A, sst.DEFAULT)
    S = analyze_supernodal(A, p)
    F = supernodal_device.factorize_device(A, S, sst.DEFAULT)
    assert F.ok
    nrhs = int(os.environ.get("PROBE_NRHS", "1"))
    b = 1.0 + np.arange(n) / n
    if nrhs > 1:
        b = np.tile(b.reshape(-1, 1), (1, nrhs)) \
            * (1.0 + np.arange(nrhs) / nrhs)
    K = 20

    for name, env in CONFIGS:
        if only and name not in only:
            continue
        for k in _KNOBS:
            os.environ.pop(k, None)
        os.environ.update(env)
        # clear every mode-keyed cache (env is read at build time)
        S._solve_cache = None
        F._winv = None
        F._lx_coarse = None
        t_compile = time.time()
        try:
            sfn, sargs = supernodal_solve.solve_dispatch(F, b, sst.DEFAULT)
            _ = float(jnp.sum(sfn(*sargs)))
        except Exception as e:  # record and continue
            print(json.dumps({"config": name, "error": repr(e)[:300]}),
                  flush=True)
            continue
        t_compile = time.time() - t_compile
        best = float("inf")
        for _t in range(3):
            t0 = time.time()
            outs = [sfn(*sargs) for _ in range(K)]
            _ = float(jnp.sum(sum(jnp.sum(o) for o in outs)))
            best = min(best, (time.time() - t0) / K)
        resid = None
        if "SSTPU_SOLVE_ABLATE" not in env:
            x = supernodal_solve.solve_device(F, b, sst.DEFAULT)
            if nrhs > 1:
                resid = float(sst.residual_norm(A, x[:, 0], b[:, 0]))
            else:
                resid = float(sst.residual_norm(A, x, b))
        print(json.dumps({"config": name, "n": n, "nrhs": nrhs,
                          "solve_ms": round(best * 1e3, 2),
                          "compile_s": round(t_compile, 1),
                          "residual": resid}), flush=True)


if __name__ == "__main__":
    main()
