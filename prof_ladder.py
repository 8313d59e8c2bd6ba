"""Shape-ladder coarsening study (VERDICT r2 weak #4: first-call compile
86.9 s at n=125k; fewer unique group shapes = fewer XLA programs).

For each candidate (R, C) ladder, rebuild the device plan at BENCH_SIZE and
report: unique (R, C) group shapes (~ compile units), total groups, padded
cells (HBM traffic proxy), padded syrk flops (MXU proxy). Pure host run —
the compile/runtime tradeoff point is then measured on TPU by forcing the
ladder via SSTPU_LADDER.

Usage: JAX_PLATFORMS=cpu python prof_ladder.py [nx]
"""
import sys
import time

import numpy as np

import suitesparse_tpu.numeric.supernodal_device as sd
from suitesparse_tpu.io import fixtures
from suitesparse_tpu.ordering.amd import amd_order
from suitesparse_tpu.symbolic.supernodes import analyze_supernodal

LADDERS = {
    "current": (sd._R_LADDER, sd._C_LADDER),
    # pow2-ish, no 1.5x rungs: ~half the rungs
    "coarse2x": ([8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192],
                 [8, 16, 32, 64, 128, 256, 512]),
    # keep 1.5x rungs only below 128 where cell waste matters most
    "hybrid": ([8, 16, 24, 32, 48, 64, 96, 128, 256, 512, 1024, 2048,
                4096, 8192],
               [8, 16, 24, 32, 48, 64, 128, 256, 512]),
}


def study(nx: int):
    A = fixtures.laplacian_3d(nx)
    S = analyze_supernodal(A, amd_order(A))
    C_low = A.symperm(S.perm).transpose()
    base_R, base_C = list(sd._R_LADDER), list(sd._C_LADDER)
    for name, (RL, CL) in LADDERS.items():
        # lists are module-level: swap contents in place
        sd._R_LADDER[:] = RL
        sd._C_LADDER[:] = CL
        t = time.perf_counter()
        plan = sd.build_plan(S, C_low)
        dt = time.perf_counter() - t
        shapes = set()
        groups = cells = 0
        syrk = 0.0
        for gl in plan.groups:
            for g in gl:
                shapes.add((g.R, g.C))
                groups += 1
                cells += g.B * g.R * g.C
                syrk += 2.0 * g.B * g.R * g.R * g.C
        print(f"{name:9s} shapes={len(shapes):4d} groups={groups:4d} "
              f"cells={cells/1e6:8.1f}M syrkMF={syrk/1e9:9.2f}G "
              f"plan_s={dt:.2f}")
    sd._R_LADDER[:] = base_R
    sd._C_LADDER[:] = base_C


if __name__ == "__main__":
    study(int(sys.argv[1]) if len(sys.argv) > 1 else 50)
