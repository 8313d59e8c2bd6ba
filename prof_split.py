"""Profile the factor-time split: big-pair placement vs small vs none.

Builds jit programs where extend-add pair classes are FILTERED by front size
(numerically wrong, timing-valid) and times them pipelined. The differences
give the placement-time shares that decide the round-3 kernel design.
"""
import os, sys, time
import numpy as np

os.environ.setdefault("SSTPU_PLAN_CONSTS", "1")
import jax
import jax.numpy as jnp

if os.environ.get("JAX_PLATFORMS"):
    # sitecustomize pre-imports jax: honor an explicit platform request
    # via config (env alone is too late; NOTES gotcha)
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
cache_dir = os.path.expanduser("~/.cache/sstpu_jax")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import suitesparse_tpu as sst
from suitesparse_tpu.io import fixtures
from suitesparse_tpu.ordering import nested_dissection_order
from suitesparse_tpu.symbolic.supernodes import analyze_supernodal
from suitesparse_tpu.numeric import supernodal_device as sd

size = int(os.environ.get("BENCH_SIZE", "50"))
A = fixtures.laplacian_3d(size)
p = nested_dissection_order(A)
S = analyze_supernodal(A, p)
C_low = A.symperm(S.perm).transpose()
plan = sd.build_plan(S, C_low)
S._device_plan = plan

cfg = sst.DEFAULT
prec = jax.lax.Precision.HIGHEST
dtype = jnp.float32
cdata = jnp.asarray(sd._clow_data(A, S))

orig_gc = sd._group_compute

class _Shim:
    def __init__(self, g, keep):
        self.R, self.C, self.B = g.R, g.C, g.B
        self.snodes = g.snodes
        self.asrc, self.adst, self.nc = g.asrc, g.adst, g.nc
        self.panel_base = g.panel_base
        self.pairs = [pc for pc, k in zip(g.pairs, keep) if k]
        self._pair_arrays = [pa for pa, k in zip(g._pair_arrays, keep) if k]

def make_fn(pred):
    """pred(g) -> keep pairs bool (per group)."""
    def gc(g, ix, Cdata, updates, dt, cstr=None, udtype=None,
           precision=None, token=None, f0=None):
        if not pred(g):
            keep = [False] * len(g.pairs)
            gs = _Shim(g, keep)
            ix2 = dict(ix); ix2["pairs"] = []
            return orig_gc(gs, ix2, Cdata, updates, dt, cstr, udtype,
                           precision, token=token, f0=f0)
        return orig_gc(g, ix, Cdata, updates, dt, cstr, udtype,
                       precision, token=token, f0=f0)
    def fn(cd):
        sd._group_compute = gc
        try:
            np_idx = sd.plan_arrays(plan)
            return sd._run_plan(plan, cd, np_idx, dtype, udtype=dtype,
                                precision=prec)
        finally:
            sd._group_compute = orig_gc
    return jax.jit(fn)

def timeit(fn, label):
    t0 = time.time()
    out = fn(cdata)
    s = float(jnp.sum(out[:8]))
    t_first = time.time() - t0
    K = 10
    best = 1e9
    for trial in range(3):
        t0 = time.time()
        for _ in range(K):
            out = fn(cdata)
        s = float(jnp.sum(out[:8]))
        dt = (time.time() - t0) / K
        best = min(best, dt)
    print(f"{label}: {best*1e3:.1f} ms  (first {t_first:.1f}s)", flush=True)
    return best

R_CUT = int(os.environ.get("PROF_RCUT", "1024"))
ONLY = os.environ.get("PROF_ONLY", "").split(",") if \
    os.environ.get("PROF_ONLY") else None
CONFIGS = {
    "full": lambda g: True,
    "nobig": lambda g: g.R < R_CUT,
    "nosmall": lambda g: g.R >= R_CUT,
    "none": lambda g: False,
}
res = {}
for name, pred in CONFIGS.items():
    if ONLY is not None and name not in ONLY:
        continue
    res[name] = timeit(make_fn(pred), name)
if ONLY is None:
    t_full, t_nobig = res["full"], res["nobig"]
    t_nosmall, t_none = res["nosmall"], res["none"]
    print(f"=> big placement ~{(t_full-t_nobig)*1e3:.1f} ms, "
          f"small ~{(t_full-t_nosmall)*1e3:.1f} ms, "
          f"all-pairs ~{(t_full-t_none)*1e3:.1f} ms, "
          f"base (syrk/potrf/scatter) ~{t_none*1e3:.1f} ms", flush=True)
