"""Device (XLA/TPU) execution of the supernodal multifrontal factorization.

Consumes the static plan from :mod:`suitesparse_tpu.symbolic.supernodes` and
runs the numeric phase as a sequence of BATCHED dense ops per elimination-tree
level and shape bucket (potrf/trsm/syrk of ``t_cholmod_super_numeric.c`` per
front, assembled multifrontally).

GATHER-FIRST dataflow (v3 — driven by on-chip ablation): TPU scatters are
~element-serialized (~10× slower than gathers), and the naive formulation
spent >90% of runtime in two scatters. Here:

  * assembly and the FIRST extend-add contributor of every front cell are
    dense GATHERS through sentinel-padded index maps (contributor
    multiplicity is ~1.03 on ND-ordered meshes, so one map covers ~97%),
  * only the rare rank≥2 contributors use scatter-add (a few % of elements),
  * there is NO final stitch scatter: the factor's device representation IS
    the concatenation of the padded per-group panel buffers; the
    level-scheduled solves consume it natively, and a host-side index map
    materializes the CHOLMOD ``px`` layout on demand.

The update heap grows by one concatenation per level (bandwidth-cheap) with
heap[0] permanently zero as the gather sentinel; Cdata is likewise
sentinel-padded at index 0.
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
    pmap: np.ndarray       # [B*R*C] gather into the unified source pool
                           # [0 | Cdata | level buffers...] (0 = sentinel);
                           # covers BOTH assembly and first ext contributor
    umap: np.ndarray       # [B*RU*RU] same, for the trailing update block
    pleft_src: np.ndarray  # rank>=2 contributors: panel.at[dst].add(heap[src])
    pleft_dst: np.ndarray
    uleft_src: np.ndarray
    uleft_dst: np.ndarray
    nc: np.ndarray         # per-slot actual column counts
    panel_base: int        # offset of this group's pflat in the device factor
    heap_base: int         # offset of this group's uflat in the heap (+1 shift)


@dataclasses.dataclass
class Plan:
    groups: list           # groups[level] = [GroupPlan, ...]
    lnz: int               # CHOLMOD px-layout size (host materialization)
    dev_size: int          # total device factor size (sum of B*R*C)
    heap_size: int         # total heap size incl. sentinel slot
    # host-side materialization map: Lx_px[px_dst] = Lx_dev[px_src]
    px_src: np.ndarray
    px_dst: np.ndarray


def build_plan(S: SupernodalSymbolic, C_low: CSC) -> Plan:
    """Precompute every index array for the device factorization."""
    children: list = [[] for _ in range(S.nsuper)]
    for s in range(S.nsuper):
        if S.sparent[s] != -1:
            children[S.sparent[s]].append(s)

    # bucketize every level; assign global panel/heap offsets
    level_layouts = []
    place = {}             # snode -> (heap slot base [incl +1 shift], RU)
    panel_place = {}       # snode -> (panel_base + b*R*C, R, C)
    panel_off = 0
    heap_off = 1 + C_low.nnz  # pool = [sentinel | Cdata | level buffers...]
    for level_nodes in S.levels:
        buckets: dict = {}
        for s in level_nodes:
            nr, nc = S.nrows(s), S.ncols(s)
            key = (_pad_to(nr - nc, _R_LADDER) + _pad_to(nc, _C_LADDER),
                   _pad_to(nc, _C_LADDER))
            buckets.setdefault(key, []).append(int(s))
        glist = sorted(buckets.items())
        placed = []
        for (R, C), ss in glist:
            # tighten: within the ladder bucket, size panels to the group's
            # actual max dims (rounded to sublane multiples) — less padding,
            # same number of compiled stages
            maxnc = max(S.ncols(s) for s in ss)
            maxru = max(S.nrows(s) - S.ncols(s) for s in ss)
            C = max(8 * ((maxnc + 7) // 8), 4)
            R = C + 8 * ((maxru + 7) // 8)
            RU = R - C
            for b, s in enumerate(ss):
                place[s] = (heap_off + b * RU * RU, RU)
                panel_place[s] = (panel_off + b * R * C, R, C)
            placed.append((R, C, ss, panel_off, heap_off))
            panel_off += len(ss) * R * C
            heap_off += len(ss) * RU * RU
        level_layouts.append(placed)

    groups_all = []
    px_src_parts, px_dst_parts = [], []
    for placed in level_layouts:
        gplans = []
        for (R, C, ss, pbase, hbase) in placed:
            g = _build_group(S, C_low, ss, R, C, place, children, pbase, hbase)
            gplans.append(g)
            # px materialization map
            for b, s in enumerate(ss):
                nr, nc = S.nrows(s), S.ncols(s)
                kk = np.repeat(np.arange(nc, dtype=np.int64),
                               nr - np.arange(nc))
                rp = _ranges(np.arange(nc, dtype=np.int64),
                             np.full(nc, nr, np.int64))
                rloc = np.where(rp < nc, rp, C + (rp - nc))
                px_src_parts.append(pbase + b * R * C + rloc * C + kk)
                px_dst_parts.append(S.Lpx[s] + kk * nr + rp)
        groups_all.append(gplans)
    cat = (lambda p: np.concatenate(p).astype(np.int64) if p
           else np.empty(0, np.int64))
    return Plan(groups=groups_all, lnz=S.lnz, dev_size=panel_off,
                heap_size=heap_off, px_src=cat(px_src_parts),
                px_dst=cat(px_dst_parts))


def _build_group(S: SupernodalSymbolic, C_low: CSC, ss, R, C, place,
                 children, panel_base, heap_base) -> GroupPlan:
    B = len(ss)
    RU = R - C
    ext_p_pairs_src, ext_p_pairs_dst = [], []
    ext_u_pairs_src, ext_u_pairs_dst = [], []
    nc_arr = np.zeros(B, dtype=np.int32)

    for b, s in enumerate(ss):
        rows = S.rows[s]
        nr = len(rows)
        f, l = int(S.super_first[s]), int(S.super_first[s + 1])
        nc = l - f
        nc_arr[b] = nc
        base = b * R * C

        def lrow(pos):
            return np.where(pos < nc, pos, C + (pos - nc))

        # assembly entries join the same pair lists as the extend-add
        # (source pool offsets 1..nnz are the Cdata region)
        lo, hi = int(C_low.indptr[f]), int(C_low.indptr[l])
        ents_per_col = np.diff(C_low.indptr[f:l + 1])
        colk = np.repeat(np.arange(nc, dtype=np.int64), ents_per_col)
        pos = np.searchsorted(rows, C_low.indices[lo:hi])
        ext_p_pairs_src.append(np.arange(lo, hi, dtype=np.int64) + 1)
        ext_p_pairs_dst.append(base + lrow(pos) * C + colk)

        # extend-add pairs from children (global heap offsets)
        for ch in children[s]:
            mu = S.nrows(ch) - S.ncols(ch)
            if mu == 0:
                continue
            ho, RU_c = place[ch]
            rows_c = S.rows[ch][S.ncols(ch):]
            idx = np.searchsorted(rows, rows_c)
            ri = np.broadcast_to(idx[:, None], (mu, mu))
            cj = np.broadcast_to(idx[None, :], (mu, mu))
            srcm = ho + np.arange(mu)[:, None] * RU_c + np.arange(mu)
            mp = (cj < nc) & (ri >= cj)
            mum = (cj >= nc) & (ri >= nc)
            if mp.any():
                ext_p_pairs_src.append(srcm[mp])
                ext_p_pairs_dst.append(base + lrow(ri[mp]) * C + cj[mp])
            if mum.any():
                ext_u_pairs_src.append(srcm[mum])
                ext_u_pairs_dst.append(b * RU * RU + (ri[mum] - nc) * RU
                                       + (cj[mum] - nc))

    def rank_split(srcs, dsts, ncells):
        """First contributor per cell -> dense map; rest -> scatter pairs."""
        dense = np.zeros(ncells, dtype=np.int64)
        if not srcs:
            return dense, np.empty(0, np.int64), np.empty(0, np.int64)
        src = np.concatenate(srcs)
        dst = np.concatenate(dsts)
        order = np.argsort(dst, kind="stable")
        src, dst = src[order], dst[order]
        first = np.ones(dst.size, dtype=bool)
        first[1:] = dst[1:] != dst[:-1]
        dense[dst[first]] = src[first]
        rest = ~first
        return dense, src[rest], dst[rest]

    pmap, pleft_src, pleft_dst = rank_split(ext_p_pairs_src, ext_p_pairs_dst,
                                            B * R * C)
    umap, uleft_src, uleft_dst = rank_split(ext_u_pairs_src, ext_u_pairs_dst,
                                            B * max(RU, 1) * max(RU, 1))
    return GroupPlan(R=R, C=C, B=B, snodes=np.asarray(ss, dtype=np.int64),
                     pmap=pmap, umap=umap,
                     pleft_src=pleft_src, pleft_dst=pleft_dst,
                     uleft_src=uleft_src, uleft_dst=uleft_dst,
                     nc=nc_arr, panel_base=panel_base, heap_base=heap_base)


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


_IDX_FIELDS = ["pmap", "umap", "pleft_src", "pleft_dst", "uleft_src",
               "uleft_dst", "nc"]


def plan_arrays(plan: Plan):
    """Flatten index arrays (deterministic order) for passing as jit args."""
    flat = []
    for glist in plan.groups:
        for g in glist:
            for f in _IDX_FIELDS:
                flat.append(np.asarray(getattr(g, f)))
    return flat


def _unpack_idx(plan: Plan, flat):
    it = iter(flat)
    return [[{f: next(it) for f in _IDX_FIELDS} for _ in glist]
            for glist in plan.groups]


def _group_compute(g: GroupPlan, ix, heap, dtype, cstr=None):
    """Assemble + factor one group; returns (panel_flat, update_flat).

    ``heap`` is the unified source pool [0 | Cdata | earlier level buffers]."""
    import jax
    import jax.numpy as jnp

    B, R, C = g.B, g.R, g.C
    RU = R - C
    panel = heap[ix["pmap"]]
    if g.pleft_src.size:
        panel = panel.at[ix["pleft_dst"]].add(heap[ix["pleft_src"]])
    if RU > 0:
        f22 = heap[ix["umap"]]
        if g.uleft_src.size:
            f22 = f22.at[ix["uleft_dst"]].add(heap[ix["uleft_src"]])
        f22 = f22.reshape(B, RU, RU)
    else:
        f22 = jnp.zeros((B, 1, 1), dtype=dtype)
    panel = panel.reshape(B, R, C)
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
        uflat = U.reshape(-1)
    else:
        uflat = jnp.zeros(0, dtype=dtype)
        panel_out = L11
    return panel_out.reshape(-1), uflat


def _run_plan(plan: Plan, Cdata, flat_idx, dtype, cstr=None):
    """The jitted numeric phase: returns the PADDED device factor buffer."""
    import jax.numpy as jnp

    idx = _unpack_idx(plan, flat_idx)
    # unified source pool: [sentinel | Cdata | level buffers...]
    heap = jnp.concatenate([jnp.zeros(1, dtype=dtype), Cdata.astype(dtype)])
    panels = []
    for d, glist in enumerate(plan.groups):
        level_updates = []
        for g, ix in zip(glist, idx[d]):
            pflat, uflat = _group_compute(g, ix, heap, dtype, cstr)
            panels.append(pflat)
            level_updates.append(uflat)
        if level_updates:
            heap = jnp.concatenate([heap] + level_updates)
    return jnp.concatenate(panels) if panels else jnp.zeros(0, dtype=dtype)


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
        Lxdev = fn(jnp.asarray(C_low.data))
    else:
        Lxdev = fn(jnp.asarray(C_low.data), S._device_idx)

    # factor stays ON DEVICE in the padded group layout; success check is a
    # scalar reduction (also the synchronization point)
    minor = S.n
    if not bool(jnp.isfinite(Lxdev).all()):
        Lh = np.asarray(Lxdev, dtype=np.float64)
        Lpx_h = np.zeros(plan.lnz)
        Lpx_h[plan.px_dst] = Lh[plan.px_src]
        for s in range(S.nsuper):
            if not np.all(np.isfinite(Lpx_h[S.Lpx[s]:S.Lpx[s + 1]])):
                minor = int(S.super_first[s])
                break
    return SupernodalFactor(S=S, Lx=Lxdev, minor=minor, layout="device")


def roofline_report(S: SupernodalSymbolic, bytes_per_elt: int = 4) -> str:
    """Per-(level, bucket) flop/byte accounting from the static plan — the
    analog of the reference's per-BLAS-call counters (cholmod_core.h:1002-1022)
    computed AHEAD of time (the plan knows both sides of the roofline).

    Returns a table: level, shape, batch, MFLOP, MB moved (gathers + panel
    traffic), arithmetic intensity."""
    plan = getattr(S, "_device_plan", None)
    assert plan is not None, "run factorize_device (or build_plan) first"
    lines = ["level  bucket(RxC)  batch    MFLOP     MB   flop/byte"]
    tot_f = tot_b = 0.0
    for d, glist in enumerate(plan.groups):
        for g in glist:
            fl = 0.0
            for s in g.snodes:
                nr, nc = S.nrows(int(s)), S.ncols(int(s))
                fl += nc ** 3 / 3 + (nr - nc) * nc * nc + (nr - nc) ** 2 * nc
            RU = g.R - g.C
            cells = g.B * g.R * g.C + g.B * RU * RU
            # traffic: map gathers (idx + data), panel/update write-out
            byt = bytes_per_elt * (3 * cells + g.pleft_src.size * 2
                                   + g.uleft_src.size * 2)
            tot_f += fl
            tot_b += byt
            lines.append(f"{d:5d}  {g.R:5d}x{g.C:<5d} {g.B:6d} "
                         f"{fl / 1e6:8.1f} {byt / 1e6:7.1f} "
                         f"{fl / max(byt, 1):9.2f}")
    lines.append(f"TOTAL  {'':12s} {'':6s} {tot_f / 1e6:8.1f} "
                 f"{tot_b / 1e6:7.1f} {tot_f / max(tot_b, 1):9.2f}")
    return "\n".join(lines)
