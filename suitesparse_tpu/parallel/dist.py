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

The numeric dataflow is identical to :mod:`..numeric.supernodal_device`; only
sharding constraints differ. GSPMD propagates shardings through the gathers
and scatter-adds (extend-add = the halo exchange of contribution blocks —
SURVEY §5.8's "(i)").
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


def _run_plan_sharded(plan, Cdata, flat_idx, dtype, mesh,
                      panel_row_threshold: int = 256):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    def cstr(x, spec):
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    Lx = jnp.zeros(plan.lnz, dtype=dtype)
    heap = jnp.zeros(max(plan.heap_size, 1), dtype=dtype)
    Cdata = Cdata.astype(dtype)
    it = iter(flat_idx)

    for glist in plan.groups:
        writes = []
        for g in glist:
            ix = {f: next(it) for f in sd._IDX_FIELDS}
            B, R, C = g.B, g.R, g.C
            RU = R - C
            # sharding policy: many small fronts → shard the batch ("tree");
            # few huge fronts → shard front rows ("panel")
            if B > 1:
                pspec = P("tree", None, None)
                uspec = P("tree", None, None)
            elif R >= panel_row_threshold:
                pspec = P(None, "panel", None)
                uspec = P(None, "panel", None)
            else:
                pspec = P(None, None, None)
                uspec = P(None, None, None)
            panel = jnp.zeros(B * R * C, dtype=dtype)
            panel = panel.at[ix["asm_dst"]].add(Cdata[ix["asm_src"]])
            if g.extp_src.size:
                panel = panel.at[ix["extp_dst"]].add(heap[ix["extp_src"]])
            f22 = jnp.zeros(B * max(RU, 1) * max(RU, 1), dtype=dtype)
            if g.extu_src.size:
                f22 = f22.at[ix["extu_dst"]].add(heap[ix["extu_src"]])
            panel = cstr(panel.reshape(B, R, C), pspec)
            f22 = cstr(f22.reshape(B, max(RU, 1), max(RU, 1)), uspec)

            F11 = panel[:, :C, :]
            low = jnp.tril(F11)
            F11s = low + jnp.swapaxes(jnp.tril(F11, -1), 1, 2)
            ridx = jax.lax.broadcasted_iota(jnp.int32, (B, C, C), 1)
            cidx = jax.lax.broadcasted_iota(jnp.int32, (B, C, C), 2)
            ncb = ix["nc"].reshape(B, 1, 1)
            live = (ridx < ncb) & (cidx < ncb)
            eye = jnp.where(ridx == cidx, jnp.asarray(1.0, dtype), 0.0)
            F11m = jnp.where(live, F11s, eye)
            L11 = jnp.linalg.cholesky(F11m)
            L11 = jnp.where(live, L11, 0.0)
            if RU > 0:
                F21 = panel[:, C:, :]
                L11solve = jnp.where(live, L11, eye)
                L21 = jax.lax.linalg.triangular_solve(
                    L11solve, F21, left_side=False, lower=True,
                    transpose_a=True)
                L21 = cstr(L21, pspec if B > 1 else P(None, "panel", None)
                           if R >= panel_row_threshold else P(None, None, None))
                U = f22 - jnp.matmul(L21, jnp.swapaxes(L21, 1, 2),
                                     preferred_element_type=dtype)
                panel_out = jnp.concatenate([L11, L21], axis=1)
            else:
                U = f22
                panel_out = L11
            writes.append((g, ix, panel_out.reshape(-1), U.reshape(-1)))
        for g, ix, pflat, uflat in writes:
            Lx = Lx.at[ix["store_dst"]].set(pflat[ix["store_src"]])
            if g.ustore_src.size:
                heap = heap.at[ix["ustore_dst"]].set(uflat[ix["ustore_src"]])
    return Lx


def dist_factorize_device(A: CSC, S: SupernodalSymbolic, mesh,
                          config: Config = DEFAULT) -> SupernodalFactor:
    """Sharded factorization; numerically identical to the single-device path."""
    import jax
    import jax.numpy as jnp

    C = A.symperm(S.perm)
    C_low = C.transpose()
    plan = getattr(S, "_device_plan", None)
    if plan is None:
        plan = sd.build_plan(S, C_low)
        S._device_plan = plan
    dtype = jnp.float64 if (config.compute_dtype == "float64"
                            and jax.config.jax_enable_x64) else jnp.float32
    key = ("dist", id(mesh), str(dtype))
    cache = getattr(S, "_dist_cache", None)
    if cache is None or cache[0] != key:
        fn = jax.jit(lambda cd, idx: _run_plan_sharded(plan, cd, idx, dtype,
                                                       mesh))
        idx = [jnp.asarray(a) for a in sd.plan_arrays(plan)]
        S._dist_cache = (key, fn, idx)
    _, fn, idx = S._dist_cache
    Lx = np.asarray(fn(jnp.asarray(C_low.data), idx), dtype=np.float64)
    minor = S.n
    if not np.all(np.isfinite(Lx)):
        for s in range(S.nsuper):
            if not np.all(np.isfinite(Lx[S.Lpx[s]:S.Lpx[s + 1]])):
                minor = int(S.super_first[s])
                break
    return SupernodalFactor(S=S, Lx=Lx, minor=minor)
