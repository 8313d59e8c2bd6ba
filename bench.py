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

Timing methodology: the steady state is measured PIPELINED — K independent
factorizations dispatched back-to-back with ONE final device sync (a scalar
reduction; ``block_until_ready`` is unreliable on the axon platform). The
axon relay adds ~30 ms of round-trip latency to every host-visible sync,
which is tunnel plumbing, not device time; the pipelined regime is exactly
the production analyze-once/factor-many serving pattern. Per-call latency
including one sync is reported as ``latency_s``.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_CPU_GFLOPS = 190.0


def main() -> None:
    size = int(os.environ.get("BENCH_SIZE", "50"))
    os.environ.setdefault("SSTPU_PLAN_CONSTS", "1")
    import jax
    # persistent compilation cache: the first call compiles ~100 XLA stages
    # + Mosaic kernels (minutes through the remote-compile tunnel); repeat
    # runs on the same pattern then start in seconds
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser("~/.cache/sstpu_jax"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import suitesparse_tpu as sst
    from suitesparse_tpu.io import fixtures
    from suitesparse_tpu.ordering import nested_dissection_order
    from suitesparse_tpu.symbolic.supernodes import analyze_supernodal
    from suitesparse_tpu.numeric import supernodal_device, supernodal_solve

    platform = jax.devices()[0].platform
    A = fixtures.laplacian_3d(size)
    n = A.ncol
    # A/B knobs (tpu_ab.py): tree cutoff and update dtype via env
    cfg = sst.DEFAULT
    if os.environ.get("SSTPU_ND_SMALL"):
        cfg = cfg.replace(nd_small=int(os.environ["SSTPU_ND_SMALL"]))
    if os.environ.get("SSTPU_UPDATE_DTYPE"):
        cfg = cfg.replace(update_dtype=os.environ["SSTPU_UPDATE_DTYPE"])
    if os.environ.get("SSTPU_PRECISION"):
        cfg = cfg.replace(precision=os.environ["SSTPU_PRECISION"])
    t0 = time.time()
    p = nested_dissection_order(A, cfg)
    t_ord = time.time() - t0
    t0 = time.time()
    S = analyze_supernodal(A, p)
    t_sym = time.time() - t0
    t0 = time.time()
    F = supernodal_device.factorize_device(A, S, cfg)
    t_first = time.time() - t0
    assert F.ok, f"factorization failed at column {F.minor}"

    # steady state: K pipelined dispatches, one sync (see module docstring);
    # several trials, min taken (the relay's first pipelined burst pays
    # one-time queue/caching costs and run-to-run variance is high)
    import jax.numpy as jnp
    cdata = jnp.asarray(supernodal_device._clow_data(A, S))
    if S._device_fn is None:
        # segmented (memory-bounded) path engaged: steady state re-runs the
        # segment schedule (same compiled programs)
        budget = int(float(os.environ.get("SSTPU_SEG_CELLS", "3e8")))
        prec = jax.lax.Precision.HIGHEST
        fn = lambda cd: supernodal_device._run_plan_segmented(
            S._device_plan, S, cd, jnp.float32, jnp.float32, prec, budget)
    elif S._device_idx is not None:
        # args mode (SSTPU_PLAN_CONSTS=0): index arrays ride device-resident
        _fn, _idx = S._device_fn, S._device_idx
        fn = lambda cd: _fn(cd, _idx)
    else:
        fn = S._device_fn
    out = fn(cdata)
    _ = float(jnp.sum(out))            # warm sync
    K = int(os.environ.get("BENCH_PIPELINE", "20"))
    # each in-flight factorization holds a dev_size*4-byte output; cap the
    # pipeline so outstanding outputs stay under ~8 GB (BENCH_SIZE=80's
    # 2 GB factors would otherwise OOM the pipelined burst)
    out_bytes = S._device_plan.dev_size * 4
    K = max(2, min(K, int(8e9 // max(out_bytes, 1))))
    trials = int(os.environ.get("BENCH_TRIALS", "4"))
    t_factor = float("inf")
    for _trial in range(trials):
        t0 = time.time()
        outs = [fn(cdata) for _ in range(K)]
        _ = float(jnp.sum(sum(jnp.sum(o) for o in outs)))
        t_factor = min(t_factor, (time.time() - t0) / K)

    # per-call latency including one tunnel sync
    t0 = time.time()
    _ = float(jnp.sum(fn(cdata)))
    t_latency = time.time() - t0

    # correctness gate: device solve, reference residual norm
    b = 1.0 + np.arange(n) / n
    x = supernodal_solve.solve_device(F, b, cfg)
    resid = sst.residual_norm(A, x, b)
    assert resid < 1e-2, f"residual {resid} out of range"  # fp32 factor

    # solve throughput (multifrontal solve, same pipelined methodology):
    # solve_dispatch returns the EXACT jitted program + device args of the
    # active mode (classic / inverse-panel / coarse-plan layouts differ)
    sfn, sargs = supernodal_solve.solve_dispatch(F, b, cfg)
    _ = float(jnp.sum(sfn(*sargs)))
    t_solve = float("inf")
    for _trial in range(2):
        t0 = time.time()
        souts = [sfn(*sargs) for _ in range(K)]
        _ = float(jnp.sum(sum(jnp.sum(o) for o in souts)))
        t_solve = min(t_solve, (time.time() - t0) / K)

    # multi-RHS solve (the serving regime: nrhs is a free batch dimension)
    NR = 64
    B64 = np.tile(b.reshape(-1, 1), (1, NR)) * (1.0 + np.arange(NR) / NR)
    x64 = supernodal_solve.solve_device(F, B64, cfg)     # compile + gate
    resid64 = sst.residual_norm(A, x64[:, 0], B64[:, 0])
    # multi-RHS solves are REAL matmuls on TPU: the precision context
    # (config.precision, round-5 fix) must keep them fp32-true — the
    # bf16-default regression showed up only at nrhs>1 (1.6e-3)
    assert resid64 < 1e-4, f"solve64 residual {resid64}"
    sfn64, sargs64 = supernodal_solve.solve_dispatch(F, B64, cfg)
    _ = float(jnp.sum(sfn64(*sargs64)))
    t_solve64 = float("inf")
    for _trial in range(2):
        t0 = time.time()
        souts = [sfn64(*sargs64) for _ in range(K)]
        _ = float(jnp.sum(sum(jnp.sum(o) for o in souts)))
        t_solve64 = min(t_solve64, (time.time() - t0) / K)

    # MEASURED panel efficiency (BASELINE north star: >=50% of the
    # dense-gemm roofline at the plan's own shapes). Run the flop-dominant
    # groups' syrk-equivalent dense matmuls ALONE at the same (B, RU, C)
    # shapes and the same precision — that rate is the speed of light for
    # this shape mix; efficiency = end-to-end factor rate / that rate.
    panel_eff = None
    dense_gflops = None
    if os.environ.get("BENCH_PANEL", "1") == "1":
        shapes = []
        for glist in S._device_plan.groups:
            for g in glist:
                RU = g.R - g.C
                if RU > 0:
                    fl_g = 2.0 * g.B * RU * RU * g.C  # syrk-equivalent
                    shapes.append((fl_g, g.B, RU, g.C))
        shapes.sort(reverse=True)
        top = [s for s in shapes[:8] if s[0] > 0.01 * S.fl]
        if top:
            import jax as _jax

            def dense_mix(keys):
                outs = []
                for i, (_, Bg, RU, C) in enumerate(top):
                    a = keys[i]
                    outs.append(jnp.sum(jnp.matmul(
                        a, jnp.swapaxes(a, 1, 2),
                        preferred_element_type=jnp.float32,
                        precision=_jax.lax.Precision.HIGHEST)))
                return sum(outs)

            mats = [jnp.ones((Bg, RU, C), jnp.float32) * 0.5
                    for (_, Bg, RU, C) in top]
            dfn = _jax.jit(dense_mix)
            _ = float(dfn(mats))
            t_dense = float("inf")
            for _trial in range(3):
                t0 = time.time()
                douts = [dfn(mats) for _ in range(K)]
                _ = float(sum(float(o) for o in douts))
                t_dense = min(t_dense, (time.time() - t0) / K)
            fl_mix = sum(s[0] for s in top)
            dense_gflops = fl_mix / t_dense / 1e9
            panel_eff = (S.fl / t_factor / 1e9) / dense_gflops

    gflops = S.fl / t_factor / 1e9
    extra = {}
    if panel_eff is not None:
        extra = {"panel_dense_gflops": round(dense_gflops, 1),
                 "panel_efficiency": round(panel_eff, 3)}
    # active solve-mode fingerprint (the A/B knobs change the program)
    extra["solve_mode"] = "+".join(
        [m for m, on in (("inv", supernodal_solve._use_inv_solve(1)),
                         ("coarse", supernodal_solve._use_coarse_solve(1)),
                         ("w2", supernodal_solve._use_w2(1)),
                         ("bmv", os.environ.get("SSTPU_SOLVE_BMV", "0")
                          not in ("0",)))
         if on] or ["classic"])
    extra["place_mode"] = os.environ.get("SSTPU_PLACE", "auto")
    extra["solve_groups"] = sum(len(gl) for gl in S._device_plan.groups)
    # capacity records measured by demos/capacity.py (BASELINE-class sizes
    # whose cold compile is too slow to re-pay on every driver run)
    cap_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "CAPACITY.json")
    if os.path.exists(cap_path):
        try:
            with open(cap_path) as f:
                extra["capacity"] = json.load(f)
        except Exception:
            pass
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
        "solve_s": round(t_solve, 4),
        "solve64_s": round(t_solve64, 4),
        "solve64_gflops": round(4 * S.lnz * NR / t_solve64 / 1e9, 1),
        "residual64": float(resid64),
        "latency_s": round(t_latency, 4),
        "pipeline_depth": K,
        "first_call_s": round(t_first, 2),
        "analyze_s": round(t_ord + t_sym, 2),
        "residual": float(resid),
        "platform": platform,
        **extra,
    }))


if __name__ == "__main__":
    sys.exit(main())
