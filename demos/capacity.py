"""Single-chip capacity benchmark: BASELINE-class model problem (n >= 500k).

Factors laplacian_3d(CAP_NX)^3 on one chip through the memory-bounded
segmented schedule (docs/MULTICHIP.md). The steady state is the
analyze-once/factor-many regime; the first call pays remote compiles and
plan-array H2D (environment tunnel costs, not device time).

Run: CAP_NX=80 python demos/capacity.py
Irregular fixtures: CAP_MATRIX=aniso|fem|regular (default regular) —
aniso = anisotropic_laplacian_3d with strength-of-connection dropping,
fem = random-geometric FEM mesh (the BASELINE acceptance set is irregular
FEM, BASELINE.md Table I).

The result is appended to CAPACITY.json at the repo root; bench.py merges
the latest record per matrix into its driver-facing JSON line, so capacity
numbers measured here are BENCH-visible without re-paying the cold
compile on every driver run.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/sstpu_jax"))
import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS"):
    # sitecustomize imports jax before env vars take effect (NOTES gotcha):
    # honor an explicit platform request via config
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402

import suitesparse_tpu as sst  # noqa: E402
from suitesparse_tpu.io import fixtures  # noqa: E402
from suitesparse_tpu.ordering import nested_dissection_order  # noqa: E402
from suitesparse_tpu.symbolic.supernodes import analyze_supernodal  # noqa: E402
from suitesparse_tpu.numeric import supernodal_device as sd  # noqa: E402
from suitesparse_tpu.numeric import supernodal_solve as ss  # noqa: E402


def _matrix():
    nx = int(os.environ.get("CAP_NX", "80"))
    kind = os.environ.get("CAP_MATRIX", "regular")
    if kind == "aniso":
        # the docs/IRREGULAR.md row: anisotropic VALUES on the full 7-point
        # pattern (fill ratio ~2x the regular problem; fl=3.0e11 at nx=60;
        # lnz/flops are eps-independent — the pattern is what stresses the
        # plan). eps spans 100x, not the default 1e4x: cond ~ nx^2/eps_min
        # = 3.6e7 at the default broke the fp32 factor (ok=False, measured
        # on TPU); 3.6e5 is fp32-safe. NOTE ALSO the graded/dropped variant
        # (grade=2.0, drop_tol=0.03) structurally decouples the mesh
        # (lnz ~5M at nx=60) — measured, rejected as a capacity fixture.
        A = fixtures.anisotropic_laplacian_3d(nx, eps=(1.0, 0.1, 0.01))
        return A, f"aniso3d_{nx}"
    if kind == "fem":
        return fixtures.fem_mesh_spd(nx ** 3, seed=1), f"fem_{nx**3}"
    if kind == "amp":
        A = fixtures.pattern_amplifier(fixtures.fem_mesh_spd(30000, seed=1),
                                       block=8)
        return A, "amp_fem30k_b8"
    return fixtures.laplacian_3d(nx), f"laplacian3d_{nx}"


def main() -> None:
    A, name = _matrix()
    t0 = time.time()
    S = analyze_supernodal(A, nested_dissection_order(A))
    t_analyze = time.time() - t0
    print(f"analyze {t_analyze:.1f}s n={A.ncol} "
          f"fl={S.fl/1e9:.0f}G lnz={S.lnz/1e6:.0f}M", flush=True)
    t0 = time.time()
    F = sd.factorize_device(A, S)
    t_first = time.time() - t0
    print(f"first factor {t_first:.1f}s ok={F.ok}", flush=True)
    b = 1.0 + np.arange(A.ncol) / A.ncol
    t0 = time.time()
    x = ss.solve_device(F, b)
    resid = float(sst.residual_norm(A, x, b))
    print(f"first solve {time.time()-t0:.1f}s "
          f"residual {resid:.3e}", flush=True)
    del F, x
    cfg = sst.DEFAULT
    # steady state: shallow pipeline (each in-flight factor holds lnz*4 B)
    budget = int(float(os.environ.get("SSTPU_SEG_CELLS", "3e8")))
    cdata = jnp.asarray(sd._clow_data(A, S))
    import jax.lax
    prec = jax.lax.Precision.HIGHEST
    args = (S._device_plan, S, cdata, jnp.float32, jnp.float32, prec, budget)
    out = sd._run_plan_segmented(*args)
    _ = float(jnp.sum(out))
    del out
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        o1 = sd._run_plan_segmented(*args)
        o2 = sd._run_plan_segmented(*args)
        _ = float(jnp.sum(o1) + jnp.sum(o2))
        best = min(best, (time.time() - t0) / 2)
        del o1, o2
    print(f"steady={best*1e3:.0f}ms -> {S.fl/best/1e9:.0f} GFLOP/s",
          flush=True)

    # BENCH-visible record (bench.py merges the latest entry per matrix)
    import json
    rec = {
        "matrix": name, "n": int(A.ncol), "nnzA": int(A.nnz),
        "flops": float(S.fl), "lnz_panels": int(S.lnz),
        "nsuper": int(S.nsuper), "analyze_s": round(t_analyze, 1),
        "first_call_s": round(t_first, 1),
        "factor_s": round(best, 3),
        "gflops": round(S.fl / best / 1e9, 1),
        "residual": resid,
        "segmented": S._device_fn is None,
        "platform": jax.devices()[0].platform,
        "when": time.strftime("%Y-%m-%d %H:%M"),
    }
    if jax.devices()[0].platform != "tpu" and \
            os.environ.get("CAP_RECORD", "") != "1":
        # CPU dry-runs must not leak into the driver-facing bench merge
        print("not a TPU run: skipping CAPACITY.json record "
              "(CAP_RECORD=1 to force)", flush=True)
        return
    path = os.path.join(os.path.dirname(__file__), "..", "CAPACITY.json")
    recs = []
    if os.path.exists(path):
        with open(path) as f:
            recs = json.load(f)
    recs = [r for r in recs if r.get("matrix") != name] + [rec]
    with open(path, "w") as f:
        json.dump(recs, f, indent=1)
    print(f"recorded -> CAPACITY.json ({name})", flush=True)


if __name__ == "__main__":
    main()
