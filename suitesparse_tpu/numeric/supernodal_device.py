"""Device (XLA/TPU) execution of the supernodal multifrontal factorization.

Consumes the static plan from :mod:`suitesparse_tpu.symbolic.supernodes` and
runs the numeric phase as a sequence of BATCHED dense ops per elimination-tree
level and shape bucket:

  level d, bucket (R, C):  [B fronts] →
      scatter-assemble A entries            (precomputed index plan)
      extend-add child update matrices      (gather from update heap)
      batched cholesky (C×C diag blocks)    → MXU
      batched triangular solve (R-C × C)    → MXU
      batched syrk for the update matrices  → MXU
      scatter panels into flat L, updates into the heap

All irregularity lives in host-precomputed int32 index arrays; the device
program is static and fully batched (SURVEY §7: "supernodal panels padded /
bucketed to MXU-friendly shapes; scatter/gather assembly as index maps").

Normalized front layout (the trick that makes one bucket serve many sizes):
within a bucket with col pad C, a front with nc ≤ C actual columns stores its
diagonal block at rows [0, nc) and its below-diagonal rows starting at row C.
Rows [nc, C) are zero padding whose diagonal is forced to 1 before the batched
cholesky. The panel buffer is [B, R, C]; the update buffer [B, R-C, R-C].

Reference analog for the compute per front: dpotrf/dtrsm/dsyrk-dgemm of
``t_cholmod_super_numeric.c:682-997``, assembled per front instead of
left-looking.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from ..config import Config, DEFAULT
from ..sparse import CSC
from ..symbolic.supernodes import SupernodalSymbolic
from .supernodal import SupernodalFactor

__all__ = ["factorize_device", "build_plan", "Plan"]

_R_LADDER = [8, 16, 24, 32, 48, 64, 96, 128, 192, 256, 384, 512, 768, 1024,
             1536, 2048, 3072, 4096, 6144, 8192]
_C_LADDER = [4, 8, 16, 24, 32, 48, 64, 96, 128, 192, 256, 384, 512]


def _pad_to(x: int, ladder) -> int:
    for v in ladder:
        if x <= v:
            return v
    step = ladder[-1]
    return ((x + step - 1) // step) * step


@dataclasses.dataclass
class GroupPlan:
    """One (level, shape-bucket) batched step."""

    R: int
    C: int
    B: int
    snodes: np.ndarray
    # scatter-assembly of A entries: panelflat[asm_dst] += Cdata[asm_src]
    asm_src: np.ndarray
    asm_dst: np.ndarray
    # extend-add: panelflat[extp_dst] += heap[extp_src]; f22flat[extu_dst] += ...
    extp_src: np.ndarray
    extp_dst: np.ndarray
    extu_src: np.ndarray
    extu_dst: np.ndarray
    # panel store: Lx[store_dst] = panelflat[store_src]
    store_src: np.ndarray
    store_dst: np.ndarray
    # update store: heap[ustore_dst] = f22flat[ustore_src]
    ustore_src: np.ndarray
    ustore_dst: np.ndarray
    # per-slot actual sizes
    nc: np.ndarray
    nr: np.ndarray


@dataclasses.dataclass
class Plan:
    groups: list          # list of lists: groups[level] = [GroupPlan, ...]
    heap_size: int
    lnz: int
    csrc_perm: np.ndarray  # maps C_low data order (structure) — identity here


def build_plan(S: SupernodalSymbolic, C_low: CSC) -> Plan:
    """Precompute every index array for the device factorization."""
    n = S.n
    # update heap offsets
    Uoff = np.zeros(S.nsuper + 1, dtype=np.int64)
    for s in range(S.nsuper):
        mu = S.nrows(s) - S.ncols(s)
        Uoff[s + 1] = Uoff[s] + mu * mu
    heap_size = int(Uoff[-1])

    children: list = [[] for _ in range(S.nsuper)]
    for s in range(S.nsuper):
        if S.sparent[s] != -1:
            children[S.sparent[s]].append(s)

    groups_all = []
    for level_nodes in S.levels:
        buckets: dict = {}
        for s in level_nodes:
            nr, nc = S.nrows(s), S.ncols(s)
            key = (_pad_to(nr - nc, _R_LADDER) + _pad_to(nc, _C_LADDER),
                   _pad_to(nc, _C_LADDER))
            buckets.setdefault(key, []).append(int(s))
        glist = []
        for (R, C), ss in sorted(buckets.items()):
            glist.append(_build_group(S, C_low, ss, R, C, Uoff, children))
        groups_all.append(glist)
    return Plan(groups=groups_all, heap_size=heap_size, lnz=S.lnz,
                csrc_perm=np.arange(C_low.nnz, dtype=np.int64))


def _build_group(S: SupernodalSymbolic, C_low: CSC, ss, R, C, Uoff,
                 children) -> GroupPlan:
    B = len(ss)
    RU = R - C
    asm_src, asm_dst = [], []
    extp_src, extp_dst, extu_src, extu_dst = [], [], [], []
    store_src, store_dst = [], []
    ustore_src, ustore_dst = [], []
    nc_arr = np.zeros(B, dtype=np.int32)
    nr_arr = np.zeros(B, dtype=np.int32)

    for b, s in enumerate(ss):
        rows = S.rows[s]
        nr = len(rows)
        f, l = int(S.super_first[s]), int(S.super_first[s + 1])
        nc = l - f
        nc_arr[b] = nc
        nr_arr[b] = nr
        base = b * R * C

        def local_row(r_pos: int) -> int:
            # normalized layout: below-diag rows shifted to start at C
            return r_pos if r_pos < nc else C + (r_pos - nc)

        pos_of = {int(r): i for i, r in enumerate(rows)}
        # assembly
        for k, j in enumerate(range(f, l)):
            lo, hi = int(C_low.indptr[j]), int(C_low.indptr[j + 1])
            for t in range(lo, hi):
                rp = pos_of[int(C_low.indices[t])]
                asm_src.append(t)
                asm_dst.append(base + local_row(rp) * C + k)
        # extend-add from children
        for ch in children[s]:
            mu = S.nrows(ch) - S.ncols(ch)
            if mu == 0:
                continue
            rows_c = S.rows[ch][S.ncols(ch):]
            idx = np.searchsorted(rows, rows_c)
            ho = int(Uoff[ch])
            for i in range(mu):
                ri = int(idx[i])
                for jj in range(mu):
                    cj = int(idx[jj])
                    src = ho + i * mu + jj
                    if cj < nc:
                        if ri >= cj:  # lower triangle of the panel only
                            extp_src.append(src)
                            extp_dst.append(base + local_row(ri) * C + cj)
                    elif ri >= nc:
                        extu_src.append(src)
                        extu_dst.append(b * RU * RU + (ri - nc) * RU
                                        + (cj - nc))
        # panel store (column-major flat L, CHOLMOD px layout)
        Lbase = int(S.Lpx[s])
        for k in range(nc):
            for rp in range(k, nr):  # lower triangle incl. diagonal
                store_src.append(base + local_row(rp) * C + k)
                store_dst.append(Lbase + k * nr + rp)
        # update store
        mu = nr - nc
        ho = int(Uoff[s])
        for i in range(mu):
            for jj in range(mu):
                ustore_src.append(b * RU * RU + i * RU + jj)
                ustore_dst.append(ho + i * mu + jj)

    def arr(x):
        return np.asarray(x, dtype=np.int64)

    return GroupPlan(R=R, C=C, B=B, snodes=np.asarray(ss, dtype=np.int64),
                     asm_src=arr(asm_src), asm_dst=arr(asm_dst),
                     extp_src=arr(extp_src), extp_dst=arr(extp_dst),
                     extu_src=arr(extu_src), extu_dst=arr(extu_dst),
                     store_src=arr(store_src), store_dst=arr(store_dst),
                     ustore_src=arr(ustore_src), ustore_dst=arr(ustore_dst),
                     nc=nc_arr, nr=nr_arr)


_IDX_FIELDS = ["asm_src", "asm_dst", "extp_src", "extp_dst", "extu_src",
               "extu_dst", "store_src", "store_dst", "ustore_src",
               "ustore_dst", "nc"]


def plan_arrays(plan: Plan):
    """Flatten every index array of the plan, in deterministic order, so they
    can be passed as jit ARGUMENTS (baking them in as HLO constants makes
    XLA compile times explode)."""
    flat = []
    for glist in plan.groups:
        for g in glist:
            for f in _IDX_FIELDS:
                flat.append(np.asarray(getattr(g, f)))
    return flat


def _run_plan(plan: Plan, Cdata, flat_idx, dtype):
    """The jitted numeric phase. Pure function of (Cdata, index arrays)."""
    import jax
    import jax.numpy as jnp

    Lx = jnp.zeros(plan.lnz, dtype=dtype)
    heap = jnp.zeros(max(plan.heap_size, 1), dtype=dtype)
    Cdata = Cdata.astype(dtype)
    it = iter(flat_idx)

    for glist in plan.groups:
        # all groups in a level are independent; their heap reads precede
        # their heap writes (children are strictly in earlier levels)
        writes = []
        for g in glist:
            ix = {f: next(it) for f in _IDX_FIELDS}
            B, R, C = g.B, g.R, g.C
            RU = R - C
            panel = jnp.zeros(B * R * C, dtype=dtype)
            panel = panel.at[ix["asm_dst"]].add(Cdata[ix["asm_src"]])
            if g.extp_src.size:
                panel = panel.at[ix["extp_dst"]].add(heap[ix["extp_src"]])
            f22 = jnp.zeros(B * max(RU, 1) * max(RU, 1), dtype=dtype)
            if g.extu_src.size:
                f22 = f22.at[ix["extu_dst"]].add(heap[ix["extu_src"]])
            panel = panel.reshape(B, R, C)
            f22 = f22.reshape(B, max(RU, 1), max(RU, 1))

            # diag block: symmetrize lower, identity on padding
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
                # restore identity diag for the solve on padded columns
                L11solve = jnp.where(live, L11, eye)
                L21 = jax.lax.linalg.triangular_solve(
                    L11solve, F21, left_side=False, lower=True,
                    transpose_a=True)
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


def factorize_device(A: CSC, S: SupernodalSymbolic,
                     config: Config = DEFAULT) -> SupernodalFactor:
    import jax
    import jax.numpy as jnp

    C = A.symperm(S.perm)
    C_low = C.transpose()
    plan = getattr(S, "_device_plan", None)
    if plan is None:
        plan = build_plan(S, C_low)
        S._device_plan = plan
        S._device_fn = None
    dtype = jnp.float64 if (config.compute_dtype == "float64"
                            and jax.config.jax_enable_x64) else jnp.float32
    fn = getattr(S, "_device_fn", None)
    if fn is None or getattr(S, "_device_dtype", None) != dtype:
        import os
        if os.environ.get("SSTPU_PLAN_CONSTS", "0") == "1":
            # embed index plans as HLO constants (can compile faster under
            # the remote-compile TPU path; args are the default)
            np_idx = plan_arrays(plan)
            fn = jax.jit(lambda cd: _run_plan(plan, cd, np_idx, dtype))
            S._device_idx = None
        else:
            fn = jax.jit(lambda cd, idx: _run_plan(plan, cd, idx, dtype))
            S._device_idx = [jnp.asarray(a) for a in plan_arrays(plan)]
        S._device_fn = fn
        S._device_dtype = dtype
    if S._device_idx is None:
        Lx = np.asarray(fn(jnp.asarray(C_low.data)), dtype=np.float64)
    else:
        Lx = np.asarray(fn(jnp.asarray(C_low.data), S._device_idx),
                        dtype=np.float64)

    minor = S.n
    if not np.all(np.isfinite(Lx)):
        # locate the first failing supernode for the reference minor contract
        for s in range(S.nsuper):
            if not np.all(np.isfinite(Lx[S.Lpx[s]:S.Lpx[s + 1]])):
                minor = int(S.super_first[s])
                break
    return SupernodalFactor(S=S, Lx=Lx, minor=minor)
