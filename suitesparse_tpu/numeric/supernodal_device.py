"""Device (XLA/TPU) execution of the supernodal multifrontal factorization.

Consumes the static plan from :mod:`suitesparse_tpu.symbolic.supernodes` and
runs the numeric phase as a sequence of BATCHED dense ops per elimination-tree
level and shape bucket:

  level d, bucket (R, C):  [B fronts] →
      scatter-assemble A entries            (precomputed index plan)
      extend-add child update matrices      (gathers from earlier levels'
                                             update buffers)
      batched cholesky (C×C diag blocks)    → MXU
      batched triangular solve (R-C × C)    → MXU
      batched syrk for the update matrices  → MXU

All irregularity lives in host-precomputed index arrays; the device program is
static and fully batched (SURVEY §7: "supernodal panels padded / bucketed to
MXU-friendly shapes; scatter/gather assembly as index maps").

Dataflow design (deliberately different from the reference's left-looking
``t_cholmod_super_numeric.c``): child update matrices stay in their PADDED
per-level buffers and parents GATHER from them (one gather + small scatter-add
per group); L panels are stitched together with ONE scatter at the end. No
global buffer is read-modify-written per stage — the naive per-stage
``heap.at[..].set`` formulation costs a full HBM copy of the heap per stage
and dominated runtime.

Normalized front layout (one bucket serves many sizes): within a bucket with
col pad C, a front with nc ≤ C actual columns stores its diagonal block at
rows [0, nc) and its below-diagonal rows starting at row C. Rows [nc, C) are
zero padding whose diagonal is forced to 1 before the batched cholesky.
"""

from __future__ import annotations

import dataclasses
import os

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
    asm_src: np.ndarray    # panelflat[asm_dst] += Cdata[asm_src]
    asm_dst: np.ndarray
    # extend-add, per child level: panelflat[dst] += level_buf[lev][src]
    ext_panel: list        # [(lev, src, dst), ...]
    ext_upd: list          # [(lev, src, dst), ...] into the f22 buffer
    store_src: np.ndarray  # Lx[store_dst] = panelflat[store_src] (final stitch)
    store_dst: np.ndarray
    nc: np.ndarray         # per-slot actual column counts


@dataclasses.dataclass
class Plan:
    groups: list           # groups[level] = [GroupPlan, ...]
    lnz: int


def build_plan(S: SupernodalSymbolic, C_low: CSC) -> Plan:
    """Precompute every index array for the device factorization."""
    children: list = [[] for _ in range(S.nsuper)]
    for s in range(S.nsuper):
        if S.sparent[s] != -1:
            children[S.sparent[s]].append(s)

    # first pass: bucketize every level, record each supernode's placement in
    # its level's (padded) update-buffer space
    level_layouts = []   # per level: list of (R, C, ss)
    place = {}           # snode -> (level, ubase, RU) in that level's buffer
    for d, level_nodes in enumerate(S.levels):
        buckets: dict = {}
        for s in level_nodes:
            nr, nc = S.nrows(s), S.ncols(s)
            key = (_pad_to(nr - nc, _R_LADDER) + _pad_to(nc, _C_LADDER),
                   _pad_to(nc, _C_LADDER))
            buckets.setdefault(key, []).append(int(s))
        glist = sorted(buckets.items())
        level_layouts.append(glist)
        ubase = 0
        for (R, C), ss in glist:
            RU = R - C
            for b, s in enumerate(ss):
                place[s] = (d, ubase + b * RU * RU, RU)
            ubase += len(ss) * RU * RU

    groups_all = []
    for d, glist in enumerate(level_layouts):
        gplans = []
        for (R, C), ss in glist:
            gplans.append(_build_group(S, C_low, ss, R, C, place, children))
        groups_all.append(gplans)
    return Plan(groups=groups_all, lnz=S.lnz)


def _build_group(S: SupernodalSymbolic, C_low: CSC, ss, R, C, place,
                 children) -> GroupPlan:
    B = len(ss)
    RU = R - C
    asm_src, asm_dst = [], []
    ext_panel: dict = {}   # child level -> ([src...], [dst...])
    ext_upd: dict = {}
    store_src, store_dst = [], []
    nc_arr = np.zeros(B, dtype=np.int32)

    for b, s in enumerate(ss):
        rows = S.rows[s]
        nr = len(rows)
        f, l = int(S.super_first[s]), int(S.super_first[s + 1])
        nc = l - f
        nc_arr[b] = nc
        base = b * R * C

        def lrow(pos):
            # normalized layout: below-diag rows shifted to start at C
            return np.where(pos < nc, pos, C + (pos - nc))

        # assembly: all lower-triangle entries of columns f..l-1
        lo, hi = int(C_low.indptr[f]), int(C_low.indptr[l])
        src = np.arange(lo, hi, dtype=np.int64)
        ents_per_col = np.diff(C_low.indptr[f:l + 1])
        colk = np.repeat(np.arange(nc, dtype=np.int64), ents_per_col)
        pos = np.searchsorted(rows, C_low.indices[lo:hi])
        asm_src.append(src)
        asm_dst.append(base + lrow(pos) * C + colk)

        # extend-add from children (gather from their padded level buffers)
        for ch in children[s]:
            mu = S.nrows(ch) - S.ncols(ch)
            if mu == 0:
                continue
            lev, ubase_c, RU_c = place[ch]
            rows_c = S.rows[ch][S.ncols(ch):]
            idx = np.searchsorted(rows, rows_c)
            ri = np.broadcast_to(idx[:, None], (mu, mu))
            cj = np.broadcast_to(idx[None, :], (mu, mu))
            srcm = ubase_c + np.arange(mu)[:, None] * RU_c + np.arange(mu)
            mp = (cj < nc) & (ri >= cj)        # lower triangle of the panel
            mum = (cj >= nc) & (ri >= nc)      # trailing update block
            if mp.any():
                sp, dp = ext_panel.setdefault(lev, ([], []))
                sp.append(srcm[mp])
                dp.append(base + lrow(ri[mp]) * C + cj[mp])
            if mum.any():
                su, du = ext_upd.setdefault(lev, ([], []))
                su.append(srcm[mum])
                du.append(b * RU * RU + (ri[mum] - nc) * RU + (cj[mum] - nc))

        # panel store (column-major flat L, CHOLMOD px layout): lower trapezoid
        Lbase = int(S.Lpx[s])
        kk = np.repeat(np.arange(nc, dtype=np.int64), nr - np.arange(nc))
        rp = _ranges(np.arange(nc, dtype=np.int64), np.full(nc, nr, np.int64))
        store_src.append(base + lrow(rp) * C + kk)
        store_dst.append(Lbase + kk * nr + rp)

    def cat(parts):
        return (np.concatenate(parts).astype(np.int64) if parts
                else np.empty(0, dtype=np.int64))

    return GroupPlan(
        R=R, C=C, B=B, snodes=np.asarray(ss, dtype=np.int64),
        asm_src=cat(asm_src), asm_dst=cat(asm_dst),
        ext_panel=[(lev, cat(sp), cat(dp))
                   for lev, (sp, dp) in sorted(ext_panel.items())],
        ext_upd=[(lev, cat(su), cat(du))
                 for lev, (su, du) in sorted(ext_upd.items())],
        store_src=cat(store_src), store_dst=cat(store_dst), nc=nc_arr)


def _ranges(starts: np.ndarray, stops: np.ndarray) -> np.ndarray:
    """Concatenated [starts[i], stops[i]) ranges (vectorized)."""
    lens = stops - starts
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    out = np.ones(total, dtype=np.int64)
    nz = lens > 0
    srt, lns = starts[nz], lens[nz]
    e = np.cumsum(lns)
    out[0] = srt[0]
    out[e[:-1]] = srt[1:] - (srt[:-1] + lns[:-1] - 1)
    return np.cumsum(out)


def _group_compute(g: GroupPlan, ix, Cdata, level_bufs, dtype, cstr=None):
    """Assemble + factor one group; returns (panel_flat, update_flat)."""
    import jax
    import jax.numpy as jnp

    B, R, C = g.B, g.R, g.C
    RU = R - C
    panel = jnp.zeros(B * R * C, dtype=dtype)
    panel = panel.at[ix["asm_dst"]].add(Cdata[ix["asm_src"]],
                                        unique_indices=True)
    for lev, src, dst in zip(ix["extp_lev"], ix["extp_src"], ix["extp_dst"]):
        panel = panel.at[dst].add(level_bufs[lev][src])
    f22 = jnp.zeros(B * max(RU, 1) * max(RU, 1), dtype=dtype)
    for lev, src, dst in zip(ix["extu_lev"], ix["extu_src"], ix["extu_dst"]):
        f22 = f22.at[dst].add(level_bufs[lev][src])
    panel = panel.reshape(B, R, C)
    f22 = f22.reshape(B, max(RU, 1), max(RU, 1))
    if cstr is not None:
        panel, f22 = cstr(g, panel, f22)

    F11 = panel[:, :C, :]
    F11s = jnp.tril(F11) + jnp.swapaxes(jnp.tril(F11, -1), 1, 2)
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
            L11solve, F21, left_side=False, lower=True, transpose_a=True)
        U = f22 - jnp.matmul(L21, jnp.swapaxes(L21, 1, 2),
                             preferred_element_type=dtype)
        panel_out = jnp.concatenate([L11, L21], axis=1)
    else:
        # no below-diagonal rows: no update matrix; contribute NOTHING to the
        # level buffer so the host-side offset accounting (RU*RU = 0) matches
        U = jnp.zeros(0, dtype=dtype)
        panel_out = L11
    return panel_out.reshape(-1), U.reshape(-1)


_IDX_SIMPLE = ["asm_src", "asm_dst", "store_src", "store_dst", "nc"]


def plan_arrays(plan: Plan):
    """Flatten index arrays (deterministic order) to pass as jit arguments."""
    flat = []
    for glist in plan.groups:
        for g in glist:
            for f in _IDX_SIMPLE:
                flat.append(np.asarray(getattr(g, f)))
            for _, src, dst in g.ext_panel:
                flat.append(src)
                flat.append(dst)
            for _, src, dst in g.ext_upd:
                flat.append(src)
                flat.append(dst)
    return flat


def _unpack_idx(plan: Plan, flat):
    it = iter(flat)
    out = []
    for glist in plan.groups:
        level = []
        for g in glist:
            ix = {f: next(it) for f in _IDX_SIMPLE}
            ix["extp_lev"] = [lev for lev, _, _ in g.ext_panel]
            ix["extp_src"] = []
            ix["extp_dst"] = []
            for _ in g.ext_panel:
                ix["extp_src"].append(next(it))
                ix["extp_dst"].append(next(it))
            ix["extu_lev"] = [lev for lev, _, _ in g.ext_upd]
            ix["extu_src"] = []
            ix["extu_dst"] = []
            for _ in g.ext_upd:
                ix["extu_src"].append(next(it))
                ix["extu_dst"].append(next(it))
            level.append(ix)
        out.append(level)
    return out


def _run_plan(plan: Plan, Cdata, flat_idx, dtype, cstr=None):
    """The jitted numeric phase: level buffers + one final L stitch."""
    import jax.numpy as jnp

    Cdata = Cdata.astype(dtype)
    idx = _unpack_idx(plan, flat_idx)
    level_bufs = []
    store_vals = []
    store_dsts = []
    for d, glist in enumerate(plan.groups):
        bufs = []
        for g, ix in zip(glist, idx[d]):
            pflat, uflat = _group_compute(g, ix, Cdata, level_bufs, dtype,
                                          cstr)
            bufs.append(uflat)
            store_vals.append(pflat[ix["store_src"]])
            store_dsts.append(ix["store_dst"])
        level_bufs.append(jnp.concatenate(bufs) if bufs
                          else jnp.zeros(0, dtype=dtype))
    Lx = jnp.zeros(plan.lnz, dtype=dtype)
    Lx = Lx.at[jnp.concatenate(store_dsts)].set(
        jnp.concatenate(store_vals), unique_indices=True)
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
        if os.environ.get("SSTPU_PLAN_CONSTS", "1") == "1":
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
