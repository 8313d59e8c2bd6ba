"""Sharded multifrontal factorization over a jax.sharding.Mesh.

Parallel axes (the solver's analogs of the ML-vocabulary axes, mapping the
reference's parallelism inventory per SURVEY §2.10):

  * ``tree``  — independent supernodes of one elimination-tree level are
    batch-sharded across devices (the reference's TBB task-tree / subtree
    parallelism, ``spqr_parallel.cpp``-style, reborn as data parallelism over
    fronts).
  * ``panel`` — large separator fronts near the root have their ROWS sharded
    across devices (the reference's multithreaded-BLAS / GPU panel parallelism
    reborn as tensor parallelism; XLA inserts the collectives around the
    batched cholesky/trsm/syrk).

The numeric dataflow is exactly :func:`..numeric.supernodal_device._run_plan`;
this module only injects sharding constraints through its ``cstr`` hook.
GSPMD propagates shardings through the gathers and scatter-adds (extend-add =
the halo exchange of contribution blocks — SURVEY §5.8's "(i)").
"""

from __future__ import annotations

import numpy as np

from ..config import Config, DEFAULT
from ..sparse import CSC
from ..symbolic.supernodes import SupernodalSymbolic
from ..numeric.supernodal import SupernodalFactor
from ..numeric import supernodal_device as sd

__all__ = ["make_solver_mesh", "dist_factorize_device"]


def make_solver_mesh(devices=None, tree: int | None = None,
                     panel: int | None = None):
    """2-D ('tree', 'panel') mesh over the given (or all) devices."""
    import jax
    from jax.sharding import Mesh

    devices = devices if devices is not None else jax.devices()
    nd = len(devices)
    if tree is None or panel is None:
        panel = 2 if nd % 2 == 0 and nd >= 2 else 1
        tree = nd // panel
    dev_array = np.asarray(devices).reshape(tree, panel)
    return Mesh(dev_array, axis_names=("tree", "panel"))


def _make_cstr(mesh, panel_row_threshold: int = 256):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    def cstr(g, F):
        # many small fronts → shard the batch ("tree");
        # few huge fronts → shard front rows ("panel")
        if g.B > 1:
            spec = P("tree", None, None)
        elif g.R >= panel_row_threshold:
            spec = P(None, "panel", None)
        else:
            return F
        return jax.lax.with_sharding_constraint(F, NamedSharding(mesh, spec))

    return cstr


def dist_factorize_device(A: CSC, S: SupernodalSymbolic, mesh,
                          config: Config = DEFAULT) -> SupernodalFactor:
    """Sharded factorization; numerically identical to the single-device path."""
    import jax
    import jax.numpy as jnp

    plan = getattr(S, "_device_plan", None)
    if plan is None:
        C_low = A.symperm(S.perm).transpose()
        plan = sd.build_plan(S, C_low)
        S._device_plan = plan
        S._clow_cache = C_low
    dtype = jnp.float64 if (config.compute_dtype == "float64"
                            and jax.config.jax_enable_x64) else jnp.float32
    key = ("dist", id(mesh), str(dtype))
    cache = getattr(S, "_dist_cache", None)
    if cache is None or cache[0] != key:
        cstr = _make_cstr(mesh)
        np_idx = sd.plan_arrays(plan)
        prec = {"highest": jax.lax.Precision.HIGHEST,
                "high": jax.lax.Precision.HIGH,
                "default": jax.lax.Precision.DEFAULT}[config.precision]
        fn = jax.jit(lambda cd: sd._run_plan(plan, cd, np_idx, dtype, cstr,
                                             precision=prec))
        S._dist_cache = (key, fn)
    _, fn = S._dist_cache
    # replicated device_put is multi-process legal (multihost.py recipe);
    # single-process it is equivalent to a plain transfer
    from jax.sharding import NamedSharding, PartitionSpec
    cdev = jax.device_put(sd._clow_data(A, S),
                          NamedSharding(mesh, PartitionSpec()))
    Lx = np.asarray(fn(cdev), dtype=np.float64)
    minor = S.n
    if not np.all(np.isfinite(Lx)):
        px = np.zeros(plan.lnz)
        px[plan.px_dst] = Lx[plan.px_src]
        for s in range(S.nsuper):
            if not np.all(np.isfinite(px[S.Lpx[s]:S.Lpx[s + 1]])):
                minor = int(S.super_first[s])
                break
    return SupernodalFactor(S=S, Lx=Lx, minor=minor, layout="device")
