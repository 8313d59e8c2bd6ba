"""Device (XLA/TPU) execution of the supernodal multifrontal factorization.

Consumes the static plan from :mod:`suitesparse_tpu.symbolic.supernodes` and
runs the numeric phase as a sequence of BATCHED dense ops per elimination-tree
level and shape bucket (potrf/trsm/syrk of ``t_cholmod_super_numeric.c`` per
front, assembled multifrontally).

ONE-HOT MATMUL assembly (v4 — driven by on-chip ablation): TPU gathers cost
~5 ns/element and scatters ~55 ns/element, so the earlier gather-first design
(dense sentinel maps over every padded front cell) was bandwidth-bound on the
index maps themselves (~3 words per padded cell). Here the extend-add is
re-expressed as MXU work, the TPU-native idiom for irregular placement:

  * each child update block U_c (RU_c x RU_c, dense, padded) lands in its
    parent's full front F (R x R) as  F += P @ U_c @ P^T  where P is the
    one-hot placement matrix built ON DEVICE from a tiny row-position vector
    (``iota == idx``) — no index-map HBM traffic at all, and arbitrary
    contributor multiplicity is handled by plain accumulation (the reference's
    scatter-assembly loop ``t_cholmod_super_numeric.c:724`` becomes two
    batched matmuls);
  * original-matrix entries are assembled by ONE sorted unique scatter of
    nnz(A) values (elementwise, but tiny compared to front cells);
  * per-(parent-group, child-group) pair classes batch the placement matmuls;
    contributions are accumulated into parent slots by a block-granular
    scatter-add (R*R contiguous elements per index — bandwidth-bound, not
    index-bound).

The plan's index arrays total O(nnz(A) + sum RU_c) int32 words instead of
O(padded cells) int64 — small enough to bake into the program as constants
without hitting HLO size limits, and the compile is much faster.

The factor's device representation is the concatenation of the padded
per-group panel buffers; the level-scheduled solves consume it natively, and a
host-side index map materializes the CHOLMOD ``px`` layout on demand.
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

# SSTPU_LADDER=coarse swaps in a pow2 ladder with ~half the rungs: fewer
# unique group shapes = fewer XLA programs (first-call compile), at the cost
# of more padded cells/flops (prof_ladder.py quantifies the inflation)
if __import__("os").environ.get("SSTPU_LADDER", "") == "coarse":
    _R_LADDER = [8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192]
    _C_LADDER = [8, 16, 32, 64, 128, 256, 512]


def _pad_to(x: int, ladder) -> int:
    for v in ladder:
        if x <= v:
            return v
    step = ladder[-1]
    return ((x + step - 1) // step) * step


@dataclasses.dataclass
class PairClass:
    """All (child of group src -> parent slot of this group) extend-adds."""

    src_level: int
    src_gi: int
    RU_c: int              # child update block size (padded, = source group RU)
    npairs: int
    strategy: str = "mm"   # placement strategy: mm | gather | scan
    T: int = 0             # scan tile size (strategy == "scan")
    B_c: int = 1           # source group batch (working-set estimates)


@dataclasses.dataclass
class GroupPlan:
    """One (level, shape-bucket) batched step."""

    R: int
    C: int
    B: int
    snodes: np.ndarray
    asrc: np.ndarray       # [nnz_g] gather into Cdata (original entries)
    adst: np.ndarray       # [nnz_g] flat dst into (B*R*R), sorted, unique
    nc: np.ndarray         # per-slot actual column counts
    pairs: list            # [PairClass]; per-class arrays live in the idx dict
    panel_base: int        # offset of this group's panels in the device factor


@dataclasses.dataclass
class Plan:
    groups: list           # groups[level] = [GroupPlan, ...]
    lnz: int               # CHOLMOD px-layout size (host materialization)
    dev_size: int          # total device factor size (sum of B*R*C)
    _S: object = None      # symbolic handle for lazy map construction
    _px: tuple | None = None

    # host-side materialization map Lx_px[px_dst] = Lx_dev[px_src] — built
    # LAZILY (it is lnz-sized; only host materialization needs it, and
    # building it eagerly dominated plan time on big problems)
    def px_maps(self):
        if self._px is None:
            self._px = _build_px_maps(self._S, self)
        return self._px

    @property
    def px_src(self):
        return self.px_maps()[0]

    @property
    def px_dst(self):
        return self.px_maps()[1]


def _build_px_maps(S, plan):
    """px-layout materialization maps, fully vectorized over all lnz entries
    (per-supernode Python loops took minutes at audikw-class sizes)."""
    # per-supernode metadata in group order
    s_all, base_all, C_all = [], [], []
    for glist in plan.groups:
        for g in glist:
            s_all.append(g.snodes)
            base_all.append(g.panel_base
                            + np.arange(g.B, dtype=np.int64) * g.R * g.C)
            C_all.append(np.full(g.B, g.C, dtype=np.int64))
    if not s_all:
        e = np.empty(0, np.int64)
        return e, e
    s_all = np.concatenate(s_all)
    base_all = np.concatenate(base_all)
    C_all = np.concatenate(C_all)
    nr_s = np.array([S.nrows(int(s)) for s in s_all], dtype=np.int64)
    nc_s = S.super_first[s_all + 1] - S.super_first[s_all]
    Lpx_s = S.Lpx[s_all]

    # per-column vectors (total ncols = n): local col index k, owner supernode
    k_col = _ranges(np.zeros(s_all.size, np.int64), nc_s)     # 0..nc_s-1 runs
    owner = np.repeat(np.arange(s_all.size, dtype=np.int64), nc_s)
    len_col = nr_s[owner] - k_col                              # entries per col
    # per-entry vectors (total = sum of panel triangles)
    rp = _ranges(k_col, nr_s[owner])                           # k..nr-1 runs
    kk = np.repeat(k_col, len_col)
    own_e = np.repeat(owner, len_col)
    nc_e = nc_s[own_e]
    rloc = np.where(rp < nc_e, rp, C_all[own_e] + (rp - nc_e))
    src = base_all[own_e] + rloc * C_all[own_e] + kk
    dst = Lpx_s[own_e] + kk * nr_s[own_e] + rp
    return src, dst


def build_plan(S: SupernodalSymbolic, C_low: CSC,
               split_mask: np.ndarray | None = None,
               ladders: tuple | None = None) -> Plan:
    """Precompute every index array for the device factorization.

    ``split_mask`` (optional bool or int per snode) forces snodes with
    different mask values into different groups — the distributed planner
    uses it to keep TOP (separator-crown) supernodes out of the
    subtree-owned groups, and the 2-level topology planner to additionally
    separate host-local MID supernodes (parallel/schedule.py).

    ``ladders`` (optional (R_ladder, C_ladder)) overrides the shape-bucket
    rungs — the coarse SOLVE plan buckets with pow4 rungs to cut the
    sequential step count ~3.6x (latency-bound 1-RHS solves); panels are
    tightened to group-actual maxima either way."""
    R_lad, C_lad = ladders if ladders is not None else (_R_LADDER, _C_LADDER)
    children: list = [[] for _ in range(S.nsuper)]
    for s in range(S.nsuper):
        if S.sparent[s] != -1:
            children[S.sparent[s]].append(s)

    # bucketize every level; assign global panel offsets and per-group slots
    level_layouts = []
    place = {}             # snode -> (level, gi, slot, RU of its group)
    panel_off = 0
    for d, level_nodes in enumerate(S.levels):
        buckets: dict = {}
        for s in level_nodes:
            nr, nc = S.nrows(s), S.ncols(s)
            key = (_pad_to(nr - nc, R_lad) + _pad_to(nc, C_lad),
                   _pad_to(nc, C_lad),
                   int(split_mask[s]) if split_mask is not None else 0)
            buckets.setdefault(key, []).append(int(s))
        glist = sorted(buckets.items())
        placed = []
        for gi, ((R, C, _msk), ss) in enumerate(glist):
            # tighten: within the ladder bucket, size panels to the group's
            # actual max dims (rounded to sublane multiples) — less padding,
            # same number of compiled stages
            maxnc = max(S.ncols(s) for s in ss)
            maxru = max(S.nrows(s) - S.ncols(s) for s in ss)
            C = max(8 * ((maxnc + 7) // 8), 4)
            R = C + 8 * ((maxru + 7) // 8)
            for b, s in enumerate(ss):
                place[s] = (d, gi, b, R - C)
            placed.append((R, C, ss, panel_off))
            panel_off += len(ss) * R * C
        level_layouts.append(placed)

    import os
    if os.environ.get("SSTPU_PLAN_LOOPS", "0") == "1":
        # legacy per-supernode loop builder (oracle for the vectorized path)
        groups_all = []
        for placed in level_layouts:
            gplans = []
            for (R, C, ss, pbase) in placed:
                gplans.append(_build_group(S, C_low, ss, R, C, place,
                                           children, pbase))
            groups_all.append(gplans)
        plan = Plan(groups=groups_all, lnz=S.lnz, dev_size=panel_off, _S=S)
        _augment_pairs(plan)
        return plan
    groups_all = _build_groups_vectorized(S, C_low, level_layouts, place)
    plan = Plan(groups=groups_all, lnz=S.lnz, dev_size=panel_off, _S=S)
    _augment_pairs(plan)
    return plan


def _build_groups_vectorized(S: SupernodalSymbolic, C_low: CSC,
                             level_layouts, place):
    """All GroupPlans in one sweep: one global searchsorted over
    (snode, row) keys replaces the per-supernode/per-child Python loops
    (which cost ~1.4 s at n=125k, VERDICT r1 item 4)."""
    n = S.n
    nsuper = S.nsuper
    nc_of = (S.super_first[1:] - S.super_first[:-1]).astype(np.int64)
    nr_of = np.array([len(S.rows[s]) for s in range(nsuper)], dtype=np.int64)
    rows_ptr = np.zeros(nsuper + 1, dtype=np.int64)
    np.cumsum(nr_of, out=rows_ptr[1:])
    rows_cat = (np.concatenate(S.rows) if nsuper
                else np.empty(0, np.int64))

    # per-snode placement -> flat arrays; gid = global group index
    slot_of = np.zeros(nsuper, dtype=np.int64)
    gid_of = np.zeros(nsuper, dtype=np.int64)
    R_of = np.zeros(nsuper, dtype=np.int64)
    C_of = np.zeros(nsuper, dtype=np.int64)
    gid_meta = []              # (level, gi, R, C, ss, pbase)
    gid_key = {}               # (level, gi) -> gid
    gid = 0
    for d, placed in enumerate(level_layouts):
        for gi, (R, C, ss, pbase) in enumerate(placed):
            arr = np.asarray(ss, dtype=np.int64)
            slot_of[arr] = np.arange(len(ss), dtype=np.int64)
            gid_of[arr] = gid
            R_of[arr] = R
            C_of[arr] = C
            gid_key[(d, gi)] = gid
            gid_meta.append((d, gi, R, C, arr, pbase))
            gid += 1
    ngid = gid
    RU_of_gid = np.array([m[2] - m[3] for m in gid_meta], dtype=np.int64)

    # sorted global row-list key: snode blocks ascending, rows sorted within
    stride = n + 1
    rowkey = np.repeat(np.arange(nsuper, dtype=np.int64), nr_of) * stride \
        + rows_cat

    # ---- A entries: position of each C_low entry within its snode panel ----
    ecols = np.repeat(np.arange(n, dtype=np.int64), np.diff(C_low.indptr))
    esn = S.snode_of_col[ecols]
    colk = ecols - S.super_first[esn]
    pos = np.searchsorted(rowkey, esn * stride + C_low.indices) \
        - rows_ptr[esn]
    fc = np.where(pos < nc_of[esn], pos, C_of[esn] + (pos - nc_of[esn]))
    adst_all = slot_of[esn] * R_of[esn] * R_of[esn] + fc * R_of[esn] + colk
    egid = gid_of[esn]
    order = np.lexsort((adst_all, egid))
    asrc_all = order.astype(np.int32)            # source = entry index
    adst_all = adst_all[order]
    egid_sorted = egid[order]
    e_counts = np.bincount(egid_sorted, minlength=ngid)
    e_splits = np.zeros(ngid + 1, dtype=np.int64)
    np.cumsum(e_counts, out=e_splits[1:])

    # ---- extend-add pairs: child update rows -> parent front coords ----
    ch = np.flatnonzero((S.sparent >= 0) & (nr_of > nc_of))
    par = S.sparent[ch]
    mu = nr_of[ch] - nc_of[ch]
    seg = _ranges(rows_ptr[ch] + nc_of[ch], rows_ptr[ch + 1])
    rows_c = rows_cat[seg] if seg.size else np.empty(0, np.int64)
    par_rep = np.repeat(par, mu)
    posp = np.searchsorted(rowkey, par_rep * stride + rows_c) \
        - rows_ptr[par_rep]
    fcp = np.where(posp < nc_of[par_rep], posp,
                   C_of[par_rep] + (posp - nc_of[par_rep])).astype(np.int32)
    # order children by (parent gid, child gid, parent slot) — matches the
    # legacy builder's iteration + stable dst sort
    pgid, cgid = gid_of[par], gid_of[ch]
    ch_order = np.lexsort((slot_of[par], cgid, pgid))
    mu_o = mu[ch_order]
    # class boundaries over the sorted (pgid, cgid) pairs
    pk = pgid[ch_order] * ngid + cgid[ch_order]
    if pk.size:
        cls_start = np.flatnonzero(np.concatenate([[True], pk[1:] != pk[:-1]]))
        cls_end = np.concatenate([cls_start[1:], [pk.size]])
    else:
        cls_start = cls_end = np.empty(0, np.int64)
    # fcp re-gathered into ch_order (one flat gather, no per-child slices)
    seg_off = np.zeros(ch.size + 1, dtype=np.int64)
    np.cumsum(mu, out=seg_off[1:])
    if ch.size:
        gidx = _ranges(seg_off[ch_order], seg_off[ch_order] + mu[ch_order])
        fcp_sorted_flat = fcp[gidx]
    else:
        fcp_sorted_flat = np.empty(0, np.int32)
    flat_off = np.zeros(ch.size + 1, dtype=np.int64)
    np.cumsum(mu[ch_order] if ch.size else mu, out=flat_off[1:])

    src_sorted = slot_of[ch][ch_order]
    dst_sorted = slot_of[par][ch_order]
    cgid_sorted = cgid[ch_order]
    pgid_sorted = pgid[ch_order]

    # assemble GroupPlans
    groups_all = [[] for _ in level_layouts]
    cls_by_pgid: dict = {}
    for a, b in zip(cls_start, cls_end):
        cls_by_pgid.setdefault(int(pgid_sorted[a]), []).append((int(a),
                                                                int(b)))
    cap_cells = 16 << 20
    for g_id, (d, gi, R, C, ss, pbase) in enumerate(gid_meta):
        B = len(ss)
        lo, hi = int(e_splits[g_id]), int(e_splits[g_id + 1])
        nc_arr = nc_of[ss].astype(np.int32)
        pairs, pair_arrays = [], []
        chunk = max(1, cap_cells // max(R * R, 1))
        for (a, b) in cls_by_pgid.get(g_id, []):
            c_gid = int(cgid_sorted[a])
            dc, gic = gid_meta[c_gid][0], gid_meta[c_gid][1]
            RU_c = int(RU_of_gid[c_gid])
            npc = b - a
            idx = np.full((npc, RU_c), -1, dtype=np.int32)
            mus = mu_o[a:b]
            rows_flat = np.repeat(np.arange(npc, dtype=np.int64), mus) * RU_c \
                + _ranges(np.zeros(npc, np.int64), mus)
            idx.ravel()[rows_flat] = \
                fcp_sorted_flat[flat_off[a]:flat_off[b]]
            src = src_sorted[a:b].astype(np.int32)
            dst = dst_sorted[a:b].astype(np.int32)
            for clo in range(0, npc, chunk):
                chi = min(clo + chunk, npc)
                pairs.append(PairClass(src_level=dc, src_gi=gic,
                                       RU_c=RU_c, npairs=chi - clo))
                pair_arrays.append((src[clo:chi], dst[clo:chi],
                                    idx[clo:chi]))
        g = GroupPlan(R=R, C=C, B=B, snodes=ss,
                      asrc=asrc_all[lo:hi], adst=adst_all[lo:hi],
                      nc=nc_arr, pairs=pairs, panel_base=pbase)
        g._pair_arrays = pair_arrays
        groups_all[d].append(g)
    return groups_all


def _build_group(S: SupernodalSymbolic, C_low: CSC, ss, R, C, place,
                 children, panel_base) -> GroupPlan:
    B = len(ss)
    nc_arr = np.zeros(B, dtype=np.int32)
    a_src_parts, a_dst_parts = [], []
    # pair classes keyed by source (level, gi): stacked idx rows + slot ids
    pair_cls: dict = {}

    for b, s in enumerate(ss):
        rows = S.rows[s]
        f, l = int(S.super_first[s]), int(S.super_first[s + 1])
        nc = l - f
        nc_arr[b] = nc

        def fcoord(pos):
            # row-list position -> full-front coordinate (cols first, pad gap,
            # then below-diagonal rows)
            return np.where(pos < nc, pos, C + (pos - nc))

        # original entries: C_low columns f..l are contiguous runs in Cdata
        lo, hi = int(C_low.indptr[f]), int(C_low.indptr[l])
        ents_per_col = np.diff(C_low.indptr[f:l + 1])
        colk = np.repeat(np.arange(nc, dtype=np.int64), ents_per_col)
        pos = np.searchsorted(rows, C_low.indices[lo:hi])
        a_src_parts.append(np.arange(lo, hi, dtype=np.int64))
        a_dst_parts.append(b * R * R + fcoord(pos) * R + colk)

        # extend-add pairs: child update rows -> parent front coordinates
        for ch in children[s]:
            mu = S.nrows(ch) - S.ncols(ch)
            if mu == 0:
                continue
            dc, gc, slot_c, RU_c = place[ch]
            rows_c = S.rows[ch][S.ncols(ch):]
            idx = fcoord(np.searchsorted(rows, rows_c)).astype(np.int32)
            row = np.full(RU_c, -1, dtype=np.int32)
            row[:mu] = idx
            cls = pair_cls.setdefault((dc, gc), {"RU_c": RU_c, "src": [],
                                                 "dst": [], "idx": []})
            cls["src"].append(slot_c)
            cls["dst"].append(b)
            cls["idx"].append(row)

    # sorted-unique A scatter
    asrc = np.concatenate(a_src_parts) if a_src_parts else np.empty(0, np.int64)
    adst = np.concatenate(a_dst_parts) if a_dst_parts else np.empty(0, np.int64)
    order = np.argsort(adst, kind="stable")
    asrc, adst = asrc[order].astype(np.int32), adst[order]

    pairs, pair_arrays = [], []
    # chunk big classes so each placement materializes a bounded contrib
    # buffer (npairs * R^2 cells); peak memory otherwise scales with the
    # largest class (audikw-scale OOM)
    cap_cells = 16 << 20
    chunk = max(1, cap_cells // max(R * R, 1))
    for (dc, gc), cls in sorted(pair_cls.items()):
        dst = np.asarray(cls["dst"], dtype=np.int32)
        order = np.argsort(dst, kind="stable")  # block-scatter likes sorted
        src = np.asarray(cls["src"], dtype=np.int32)[order]
        dst = dst[order]
        idx = np.stack(cls["idx"], axis=0)[order]
        for lo in range(0, dst.size, chunk):
            hi = min(lo + chunk, dst.size)
            pairs.append(PairClass(src_level=dc, src_gi=gc,
                                   RU_c=cls["RU_c"], npairs=hi - lo))
            pair_arrays.append((src[lo:hi], dst[lo:hi], idx[lo:hi]))
    g = GroupPlan(R=R, C=C, B=B, snodes=np.asarray(ss, dtype=np.int64),
                  asrc=asrc, adst=adst, nc=nc_arr, pairs=pairs,
                  panel_base=panel_base)
    g._pair_arrays = pair_arrays
    return g


# measured device constants for the placement cost model (axon v5e-class
# chip, round-3 profile: big one-hot placements ran at ~46 TF/s effective
# HIGHEST / ~170 GB/s, tiny-op dispatch ~2.5 us)
_PLACE_BW = 1.7e11      # bytes/s effective HBM
_PLACE_OP = 2.5e-6      # seconds per XLA op dispatch
_PLACE_MM = 4.6e13      # one-hot matmul effective flop rate (HIGHEST)


def _runs_of(fc: np.ndarray):
    """Contiguous increasing runs of sorted front coords: (front_start,
    child_start, length) triples."""
    if fc.size == 0:
        return []
    br = np.flatnonzero(np.diff(fc) != 1)
    starts = np.concatenate([[0], br + 1])
    ends = np.concatenate([br + 1, [fc.size]])
    return [(int(fc[s]), int(s), int(e - s)) for s, e in zip(starts, ends)]


def _scan_pieces(R: int, T: int, src, dst, idx):
    """Build the (NPP, 10) int32 piece-pair array for the scan strategy:
    each row (src_slot, dst_slot, wfs, wft, cs, ct, o_r, o_c, Lr, Lc)
    describes one masked (T, T) window add F[ds, wfs:, wft:] += U[ss, cs:,
    ct:]. Child windows index the (T, T)-edge-padded update buffer."""
    rows = []
    for p in range(dst.size):
        fc = idx[p][idx[p] >= 0]
        pieces = []
        for (fs, a0, L) in _runs_of(fc):
            for k in range(0, L, T):
                Lk = min(T, L - k)
                wfs = min(fs + k, R - T)
                o = fs + k - wfs
                cs = T + a0 + k - o
                pieces.append((wfs, cs, o, Lk))
        for (wa, ca, oa, La) in pieces:
            for (wb, cb, ob, Lb) in pieces:
                rows.append((int(src[p]), int(dst[p]), wa, wb, ca, cb,
                             oa, ob, La, Lb))
    return np.asarray(rows, dtype=np.int32).reshape(-1, 10)


def _augment_pairs(plan: "Plan") -> None:
    """Choose a placement strategy per pair class (VERDICT r3 item 1: the
    one-hot P @ U @ P' matmuls were 66% of factor time at n=125k) and attach
    the strategy's index arrays as ``g._place_extra`` (aligned with pairs):

      * mm      — the one-hot matmul formulation (kept as oracle/fallback;
                  the only GSPMD-safe one, used on the sharded dist2 path);
      * gather  — two-stage row gather: half = rowplace(U) via a flat row
                  gather, contrib = rowplace(half^T) (equal to P U P' because
                  U is symmetric).  Exact at ANY precision, no P buffers, no
                  MXU passes;
      * scan    — for few-run classes (separator-crown chains whose child
                  rows are long contiguous runs of the parent): a lax.scan of
                  masked (T, T) dynamic-slice adds touching only the child's
                  own cells (RU^2) instead of R^2 buffers.

    Selection is by a measured-constant cost model; SSTPU_PLACE forces one
    (auto | mm | gather | scan | tile).

    ``tile`` additionally builds the Pallas tiled extend-add manifest
    (kernels/extend_add_tiles.py) for groups with R >= 256; classes the
    manifest cannot fold (small RU relative to the group's padded child
    size) fall back to the cost-model choice."""
    # DEFAULT auto since the round-4 TPU A/B (AB_RESULTS.jsonl place_auto
    # vs base, v5e n=125k): factor 101.1 -> 97.2 ms, residual equal; mm
    # remains the GSPMD-safe form the sharded path forces.
    # On a TPU backend, auto ALSO builds the tiled extend-add manifests
    # (round-4 controlled A/B: 97.2 -> 91.7 ms at n=125k, residual equal);
    # off-TPU the kernel only runs in interpret mode (tests force it via
    # SSTPU_PLACE=tile + SSTPU_PALLAS=1), so auto skips the manifest cost.
    mode = os.environ.get("SSTPU_PLACE", "auto")
    tile_mode = mode == "tile"
    if mode == "auto":
        import jax
        tile_mode = jax.default_backend() == "tpu"
    if tile_mode:
        mode = "auto"      # non-folded classes use the cost model
    gid_B = {}
    for d, glist in enumerate(plan.groups):
        for gi, g in enumerate(glist):
            gid_B[(d, gi)] = g.B
    for glist in plan.groups:
        for g in glist:
            extras = []
            R = g.R
            for pc, (src, dst, idx) in zip(g.pairs, g._pair_arrays):
                RU = pc.RU_c
                np_ = pc.npairs
                B_c = gid_B[(pc.src_level, pc.src_gi)]
                t_mm = max(np_ * (5.0 * R * RU + 3.0 * R * R + RU * RU)
                           * 4 / _PLACE_BW,
                           np_ * (2.0 * R * RU * RU + 2.0 * R * R * RU)
                           / _PLACE_MM) + 2 * _PLACE_OP
                t_ga = np_ * (RU * RU + 4.0 * R * RU + 3.0 * R * R) * 4 \
                    / _PLACE_BW + 3 * _PLACE_OP
                best_scan = None
                scan_ts = [T for T in (128, 256, 512)
                           if T <= R and T <= RU + 1]
                if scan_ts:
                    # vectorized per-pair run decomposition (the per-pair
                    # Python loop here cost ~1 s of analyze at n=125k):
                    # every valid cell belongs to the most recent run start
                    # in its row, so bincount(run id over valid cells) is
                    # exactly the run-length list
                    m = idx >= 0
                    newrun = m.copy()
                    newrun[:, 1:] &= ~(m[:, :-1]
                                       & (idx[:, 1:] == idx[:, :-1] + 1))
                    pr, _pj = np.nonzero(newrun)
                    runid = np.cumsum(newrun.ravel()) - 1
                    lens = np.bincount(runid[m.ravel()],
                                       minlength=pr.size) if pr.size else \
                        np.zeros(0, dtype=np.int64)
                    for T in scan_ts:
                        kr = -(-lens // T)
                        kp = np.bincount(pr, weights=kr, minlength=np_)
                        npp = float((kp * kp).sum())
                        pad = 2.0 * B_c * (RU + 2 * T) ** 2 * 4 / _PLACE_BW
                        t = npp * max(_PLACE_OP, 3.0 * T * T * 4 / _PLACE_BW) \
                            + pad + 2 * _PLACE_OP
                        if best_scan is None or t < best_scan[0]:
                            best_scan = (t, T)
                choice = "mm"
                if mode == "mm":
                    choice = "mm"
                elif mode == "gather":
                    choice = "gather" if t_ga < t_mm else "mm"
                elif mode == "scan" and best_scan is not None:
                    choice = "scan"
                else:  # auto
                    t_best = t_mm
                    choice = "mm"
                    if t_ga < t_best:
                        t_best, choice = t_ga, "gather"
                    if best_scan is not None and best_scan[0] < t_best:
                        t_best, choice = best_scan[0], "scan"
                pc.strategy = choice
                pc.B_c = B_c
                if choice == "gather":
                    inv = np.full((np_, R), RU, dtype=np.int64)
                    mk = idx >= 0
                    rank = np.cumsum(mk, axis=1) - 1
                    pr2, pj2 = np.nonzero(mk)
                    inv[pr2, idx[pr2, pj2]] = rank[pr2, pj2]
                    valid = inv < RU
                    g1 = np.where(valid, src.astype(np.int64)[:, None] * RU
                                  + inv, 0).astype(np.int32)
                    g2 = np.where(valid, np.arange(np_, dtype=np.int64)
                                  [:, None] * RU + inv, 0).astype(np.int32)
                    extras.append((g1, g2, valid))
                elif choice == "scan":
                    pc.T = best_scan[1]
                    extras.append((_scan_pieces(R, pc.T, src, dst, idx),))
                else:
                    extras.append(())
            g._place_extra = extras
            g._tile = None
            if tile_mode and g.R >= int(os.environ.get("SSTPU_TILE_RMIN",
                                                       "256")):
                from ..kernels.extend_add_tiles import build_group_manifest
                # SSTPU_TILE_BIG: R threshold for 256x256 tiles. MEASURED
                # OFF by default: the grid is step-bound (~1.7 us/step) and
                # at T=128 the in-tile one-hot dots (T^3 MXU work) hide
                # under that floor, but at T=256 they are 8x and dominate —
                # T=256 at R>=2048 benched 97.4 vs 91.7 ms at n=125k.
                Tbig = int(os.environ.get("SSTPU_TILE_BIG", "0") or 0)
                # SSTPU_TILE_PAIR: two pieces per grid step (12 branch-free
                # dots, dead tail piece = all-(-1) maps -> exact-zero
                # one-hots). Cuts the step-bound grid ~40% at n=125k
                # (pieces-per-tile histogram {1: 3.9k, 2: 7.8k, 3: 210}).
                npiece = 2 if os.environ.get("SSTPU_TILE_PAIR",
                                             "0") == "1" else 1
                # SSTPU_TILE_FRAC: fold a class iff RU_c >= frac * RUp.
                # frac=0 folds EVERY class of every R>=256 group into the
                # kernel for +1% steps / +1% Ucat cells (the per-class XLA
                # strategies each touch R^2 on big fronts). DEFAULT per the
                # round-4 A/B (AB_RESULTS.jsonl, n=125k): tile_frac0
                # 89.5 ms / 1097 GF/s vs tile 91-101, tile_pair 91.8,
                # tile_pair_frac0 92.7 — fold-all wins alone; two-piece
                # steps (SSTPU_TILE_PAIR=1) stay opt-in.
                frac = float(os.environ.get("SSTPU_TILE_FRAC", "0"))
                g._tile = build_group_manifest(
                    g, T=256 if (Tbig and g.R >= Tbig) else 128,
                    ru_min_frac=frac, npiece=npiece)
    if tile_mode:
        _mark_symmetrize(plan)


def _mark_symmetrize(plan: "Plan") -> None:
    """Flag tile-assembled groups whose update block is read FULL by some
    consumer (a non-tile parent, or a class the parent's manifest did not
    fold): such groups must symmetrize their update from its valid lower
    triangle before handing it up (lower-only assembly leaves the upper
    tiles of F22 — hence of U — unspecified)."""
    gmap = {}
    for d, glist in enumerate(plan.groups):
        for gi, g in enumerate(glist):
            gmap[(d, gi)] = g
            g._symm_u = False
    for glist in plan.groups:
        for g in glist:
            folded = set(g._tile.folded) if getattr(g, "_tile", None) else ()
            for i, pc in enumerate(g.pairs):
                if i not in folded:
                    src = gmap[(pc.src_level, pc.src_gi)]
                    if getattr(src, "_tile", None) is not None:
                        src._symm_u = True


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


def _class_arrays(g: GroupPlan):
    """Per pair class: (src, dst, idx, *strategy_extras) tuples."""
    extra = getattr(g, "_place_extra", None)
    out = []
    for i, (src, dst, idx) in enumerate(g._pair_arrays):
        e = extra[i] if extra is not None else ()
        out.append((src, dst, idx) + tuple(e))
    return out


def plan_arrays(plan: Plan):
    """Flatten index arrays (deterministic order) for passing as jit args."""
    flat = []
    for glist in plan.groups:
        for g in glist:
            flat += [g.asrc, g.adst, g.nc]
            for arrs in _class_arrays(g):
                flat += list(arrs)
            tm = getattr(g, "_tile", None)
            if tm is not None:
                flat += [tm.man, tm.rowmap, tm.colmap]
    return flat


def _n_class_arrays(pc: PairClass) -> int:
    return 3 + {"mm": 0, "gather": 3, "scan": 1}[pc.strategy]


def _unpack_idx(plan: Plan, flat):
    it = iter(flat)
    out = []
    for glist in plan.groups:
        lvl = []
        for g in glist:
            ix = {"asrc": next(it), "adst": next(it), "nc": next(it),
                  "pairs": []}
            for pc in g.pairs:
                ix["pairs"].append(tuple(
                    next(it) for _ in range(_n_class_arrays(pc))))
            if getattr(g, "_tile", None) is not None:
                ix["tile"] = (next(it), next(it), next(it))
            lvl.append(ix)
        out.append(lvl)
    return out


def _use_potrf_kernel(dtype, B: int, C: int, RU: int = 0) -> bool:
    """Pallas potrf+trsm policy: wins when the batch fills lanes and the
    column loop is short; XLA's blocked algorithm wins for few big tiles,
    and fronts whose tiles exceed the VMEM budget must stay on XLA.
    SSTPU_PALLAS=0 disables, =1 forces (interpret off-TPU is test-only)."""
    import jax
    import jax.numpy as jnp

    mode = os.environ.get("SSTPU_PALLAS", "auto")
    if mode == "0":
        return False
    from ..kernels.potrf import kernel_fits
    good_shape = (B >= 32 and C <= 96 and dtype == jnp.float32
                  and kernel_fits(C, RU, B=B))
    if mode == "1":
        return good_shape
    return good_shape and jax.devices()[0].platform == "tpu"


def _tile_runtime(dtype, udtype) -> tuple[bool, bool]:
    """(use_tile, interpret) runtime policy for the tiled extend-add kernel.

    Mirrors _use_potrf_kernel: real TPU runs compiled; SSTPU_PALLAS=1 forces
    interpret mode off-TPU (tests). fp32 fronts/updates only — the manifest
    encodes fp32 (8,128) block alignment."""
    import jax
    import jax.numpy as jnp

    if dtype != jnp.float32 or udtype != jnp.float32:
        return False, False
    mode = os.environ.get("SSTPU_PALLAS", "auto")
    if mode == "0":
        return False, False
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        return True, False
    return (mode == "1"), True


def _onehot_place(P, X, dtype, precision):
    """P @ X for one-hot P. bf16 X (update_dtype option) runs a single
    native MXU pass; fp32 keeps the configured precision (HIGHEST is
    bit-faithful for one-hot selection).

    A 3-term bf16 split (exact for one-hot P, half of HIGHEST's MXU passes)
    was measured SLOWER end-to-end: the per-term converts/subtracts plus the
    optimization barriers needed to stop XLA's excess-precision round-trip
    folding cost more than the saved passes at these shapes."""
    import jax
    import jax.numpy as jnp

    if X.dtype == jnp.bfloat16:
        if jax.default_backend() == "tpu":
            return jnp.matmul(P.astype(jnp.bfloat16), X,
                              preferred_element_type=dtype,
                              precision=precision)
        # CPU dot thunks reject BF16xBF16=F32 in fused programs — upcast
        # (numerically identical; only the MXU-rate benefit is TPU-side)
        return jnp.matmul(P, X.astype(dtype), preferred_element_type=dtype,
                          precision=precision)
    return jnp.matmul(P, X, preferred_element_type=dtype,
                      precision=precision)


def _group_compute(g: GroupPlan, ix, Cdata, updates, dtype, cstr=None,
                   udtype=None, precision=None, token=None, f0=None):
    """Assemble + factor one group; returns (panel_flat, update or None).

    ``precision``: jax matmul precision. TPU fp32 matmuls default to ONE
    bf16 pass (~2^-8 relative error) — 'highest' (3-pass) makes the one-hot
    PLACEMENT matmuls bit-faithful pass-throughs and the syrk fp32-accurate;
    it triples only the MXU pass count, not the memory traffic."""
    import jax
    import jax.numpy as jnp

    if udtype is None:
        udtype = dtype
    B, R, C = g.B, g.R, g.C
    RU = R - C
    if token is not None:
        # serialize group execution: without this dependency XLA hoists and
        # co-materializes every group's placement buffers (GBs at scale);
        # the TPU core runs ops serially anyway, so nothing is lost
        Cdata, _ = jax.lax.optimization_barrier((Cdata, token))
    # original entries: one sorted unique scatter of this group's nnz(A);
    # f0 (distributed path) carries the psum-assembled cut contributions.
    # scatter-SET on the zero base (not add): scatter-add read-modify-writes
    # every touched cell and measured ~8 ms slower at n=125k
    F = jnp.zeros(B * R * R, dtype=dtype) if f0 is None else f0.reshape(-1)
    if g.asrc.size:
        vals = Cdata[ix["asrc"]].astype(dtype)
        if f0 is None:
            F = F.at[ix["adst"]].set(vals, indices_are_sorted=True,
                                     unique_indices=True)
        else:
            F = F.at[ix["adst"]].add(vals, indices_are_sorted=True,
                                     unique_indices=True)
    F = F.reshape(B, R, R)

    # tiled extend-add kernel (kernels/extend_add_tiles.py): child updates
    # concatenated into one padded Ucat, parent tiles assembled in VMEM via
    # the manifest built at plan time. Classes the manifest did not fold
    # (and every class when the kernel cannot run) use the per-class XLA
    # strategies below.
    tm = getattr(g, "_tile", None)
    skip = ()
    # SSTPU_EA_MODE: timing-ablation knob (numerically wrong except "full"):
    # "off" = no extend-add at all (the syrk/potrf/scatter base),
    # "tileonly" = tile kernel only, every XLA pair class skipped — the
    # difference against "full" prices the non-folded classes.
    ea_mode = os.environ.get("SSTPU_EA_MODE", "full")
    if ea_mode == "off":
        tm = None
        skip = set(range(len(g.pairs)))
    if tm is not None and cstr is None and "tile" in ix:
        use_tile, interp = _tile_runtime(dtype, udtype)
        if use_tile:
            man, rmp, cmp_ = ix["tile"]
            Ucat = jnp.zeros((max(tm.nslots, 1), tm.RUp, tm.RUp),
                             dtype=dtype)
            for (_ci, k0, key, RU_c, src) in tm.uslices:
                Ucat = Ucat.at[k0:k0 + src.size, :RU_c, :RU_c].set(
                    updates[key][src])
            from ..kernels.extend_add_tiles import extend_add_tiles
            F = extend_add_tiles(F, Ucat, man, rmp, cmp_,
                                 interpret=interp)
            skip = set(tm.folded)
    if ea_mode == "tileonly":
        skip = set(range(len(g.pairs)))

    # extend-add: child update blocks placed by the per-class strategy
    # chosen at plan time (_augment_pairs): exact row gathers / masked
    # tile-window scans replace the round-2 one-hot matmuls (which were 66%
    # of factor time at n=125k — VERDICT r3 item 1); the matmul form remains
    # the GSPMD-safe fallback used on the sharded (cstr) path. The barrier
    # ties each class's inputs to the running F so XLA cannot hoist and
    # co-materialize every class's buffers (12.8 GB at audikw-class sizes).
    for ci, (pc, arrs) in enumerate(zip(g.pairs, ix["pairs"])):
        if ci in skip:
            continue
        src, dst, idx = arrs[0], arrs[1], arrs[2]
        RU_c = pc.RU_c
        Usrc = updates[(pc.src_level, pc.src_gi)]        # (B_c, RU_c, RU_c)
        if len(g.pairs) > 1:
            F, Usrc = jax.lax.optimization_barrier((F, Usrc))
        strat = pc.strategy if cstr is None else "mm"
        if strat == "gather":
            g1, g2, vld = arrs[3], arrs[4], arrs[5]
            Uflat = Usrc.reshape(-1, RU_c)
            half = jnp.where(vld[:, :, None], Uflat[g1], 0)   # (np, R, RU_c)
            halfT = jnp.swapaxes(half, 1, 2).reshape(-1, R)
            # U symmetric => rowplace(half^T) == P U P^T exactly
            contrib = jnp.where(vld[:, :, None], halfT[g2], 0)
            F = F.at[dst].add(contrib.astype(dtype),
                              indices_are_sorted=True)
        elif strat == "scan":
            (pieces,) = arrs[3:4]
            T = pc.T
            Up = jnp.pad(Usrc, ((0, 0), (T, T), (T, T)))
            ir = jax.lax.broadcasted_iota(jnp.int32, (1, T, T), 1)
            ic = jax.lax.broadcasted_iota(jnp.int32, (1, T, T), 2)

            def step(Fc, pp):
                ss, ds, wfs, wft, cs, ct, oa, ob, La, Lb = [
                    pp[i] for i in range(10)]
                cw = jax.lax.dynamic_slice(Up, (ss, cs, ct), (1, T, T))
                fw = jax.lax.dynamic_slice(Fc, (ds, wfs, wft), (1, T, T))
                m = ((ir >= oa) & (ir < oa + La)
                     & (ic >= ob) & (ic < ob + Lb))
                fw = fw + jnp.where(m, cw.astype(dtype), 0)
                return jax.lax.dynamic_update_slice(
                    Fc, fw, (ds, wfs, wft)), None

            F, _ = jax.lax.scan(step, F, pieces)
        else:
            child = Usrc[src]                            # contiguous rows
            iota = jax.lax.broadcasted_iota(jnp.int32, (1, R, RU_c), 1)
            P = (iota == idx[:, None, :]).astype(dtype)  # (np, R, RU_c)
            half = _onehot_place(P, child, dtype, precision)
            # contrib = half @ P^T as a contracting einsum (transpose-free;
            # the swapaxes route materialized the transpose, measured ~1.7x)
            contrib = jnp.einsum('bik,bjk->bij', half, P,
                                 preferred_element_type=dtype,
                                 precision=precision)
            F = F.at[dst].add(contrib, indices_are_sorted=True)

    if cstr is not None:
        F = cstr(g, F)

    F11 = F[:, :C, :C]
    F11s = jnp.tril(F11) + jnp.swapaxes(jnp.tril(F11, -1), 1, 2)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (B, C, C), 1)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (B, C, C), 2)
    ncb = ix["nc"].reshape(B, 1, 1)
    live = (ridx < ncb) & (cidx < ncb)
    eye = jnp.where(ridx == cidx, jnp.asarray(1.0, dtype), 0.0)
    F11m = jnp.where(live, F11s, eye)
    F21 = F[:, C:, :C] if RU > 0 else None
    if cstr is None and _use_potrf_kernel(dtype, B, C, RU):
        # fused Pallas potrf+trsm, batch on the 128-lane minor dim — measured
        # 7-13x over XLA's blocked-While cholesky/triangular_solve at these
        # shapes (see kernels/potrf.py). Skipped on the sharded (cstr) path:
        # pallas_call is not GSPMD-partitionable without shard_map.
        from ..kernels.potrf import batched_potrf_trsm
        L11, L21 = batched_potrf_trsm(F11m, F21)
        L11 = jnp.where(live, L11, 0.0)
    else:
        L11 = jnp.linalg.cholesky(F11m)
        L11 = jnp.where(live, L11, 0.0)
        if RU > 0:
            L11solve = jnp.where(live, L11, eye)
            L21 = jax.lax.linalg.triangular_solve(
                L11solve, F21, left_side=False, lower=True, transpose_a=True)
        else:
            L21 = None
    if RU > 0:
        # syrk as a CONTRACTING einsum: matmul(L21, swapaxes(L21)) costs
        # ~1.7x more on TPU (measured 6.3 vs 3.7 ms at (8,640,640) HIGHEST
        # - the transpose is materialized); dot_general contracts the last
        # dims directly
        U = F[:, C:, C:] - jnp.einsum('bik,bjk->bij', L21, L21,
                                      preferred_element_type=dtype,
                                      precision=precision)
        if skip and getattr(g, "_symm_u", False):
            # this group assembled lower-only (tile kernel) but some
            # consumer reads its update FULL: rebuild the upper triangle
            # from the valid lower before handing the block up
            U = jnp.tril(U) + jnp.swapaxes(jnp.tril(U, -1), 1, 2)
        U = U.astype(udtype)
        panel_out = jnp.concatenate([L11, L21], axis=1)
    else:
        U = None
        panel_out = L11
    return panel_out.reshape(-1), U


def _run_plan(plan: Plan, Cdata, flat_idx, dtype, cstr=None, udtype=None,
              precision=None):
    """The jitted numeric phase: returns the PADDED device factor buffer."""
    import jax.numpy as jnp

    idx = _unpack_idx(plan, flat_idx)
    updates = {}   # (level, gi) -> (B, RU, RU) child update blocks
    panels = []
    token = None
    for d, glist in enumerate(plan.groups):
        for gi, (g, ix) in enumerate(zip(glist, idx[d])):
            pflat, U = _group_compute(g, ix, Cdata, updates, dtype, cstr,
                                      udtype, precision, token=token)
            panels.append(pflat)
            token = pflat[:1]
            if U is not None:
                updates[(d, gi)] = U
    return jnp.concatenate(panels) if panels else jnp.zeros(0, dtype=dtype)


def _estimate_group_cells(g: GroupPlan) -> int:
    """Peak working-set estimate (fp32 cells) for one group's program step:
    full front + produced update + per-class P/contrib buffers (chunk-capped
    at plan time)."""
    RU = g.R - g.C
    cells = g.B * g.R * g.R + g.B * RU * RU
    tm = getattr(g, "_tile", None)
    if tm is not None:
        # kernel output front + padded Ucat live alongside the input front
        cells += g.B * g.R * g.R + max(tm.nslots, 1) * tm.RUp * tm.RUp
        folded = set(tm.folded)
        for i, pc in enumerate(g.pairs):
            if i not in folded:
                cells += 2 * pc.npairs * g.R * pc.RU_c
        return cells
    for pc in g.pairs:
        if pc.strategy == "scan":
            # padded child copy only (WHOLE child batch; windows never
            # materialize buffers) — under-counting B_c packed segments
            # past their budget (review r3)
            cells += pc.B_c * (pc.RU_c + 2 * pc.T) ** 2
        elif pc.strategy == "gather":
            # half + half^T + contrib
            cells += pc.npairs * (2 * g.R * pc.RU_c + g.R * g.R)
        else:
            cells += 2 * pc.npairs * g.R * pc.RU_c
    return cells


def _segment_schedule(plan: Plan, budget_cells: int):
    """Split the group sequence into contiguous segments whose estimated
    working set stays under ``budget_cells``. The postorder-stack analog
    (SPQR's Stack plan, ``spqr_analyze.cpp:28``): each segment is its own
    XLA program, so buffer assignment never co-materializes the whole tree;
    child update buffers are freed (donated) as soon as their last consumer
    segment finishes."""
    segs, cur, cur_cells = [], [], 0
    for d, glist in enumerate(plan.groups):
        for gi, g in enumerate(glist):
            cells = _estimate_group_cells(g)
            if cur and cur_cells + cells > budget_cells:
                segs.append(cur)
                cur, cur_cells = [], 0
            cur.append((d, gi))
            cur_cells += cells
    if cur:
        segs.append(cur)
    return segs


def _update_consumers(plan: Plan):
    """last_seg_consumer[(d,gi)] = index of the LAST group (in schedule
    order) whose pairs read update (d,gi)."""
    order = {}
    pos = 0
    last = {}
    for d, glist in enumerate(plan.groups):
        for gi, g in enumerate(glist):
            order[(d, gi)] = pos
            for pc in g.pairs:
                last[(pc.src_level, pc.src_gi)] = pos
            pos += 1
    return order, last


def _precompile_segments(fns, plan: Plan, cdata, udtype, nworkers: int):
    """Compile segment programs CONCURRENTLY (SSTPU_SEG_PRECOMPILE=N).

    The lazy path compiles each segment at its first call — serially, which
    is the n=512k cold-start tax (~2,000 s through the remote compiler).
    XLA compilation releases the GIL (on the axon backend it is an RPC the
    server handles), so AOT-compiling segments from a thread pool overlaps
    them. Tracing (``lower``) stays on the calling thread — it is Python —
    then ``compile`` fans out. The compiled executables replace the jit
    wrappers in ``fns`` (same call signature, donation preserved)."""
    import concurrent.futures

    import jax

    order_all, last_consumer = _update_consumers(plan)

    def upd_spec(k):
        g = plan.groups[k[0]][k[1]]
        ru = g.R - g.C
        return jax.ShapeDtypeStruct((g.B, ru, ru), udtype)

    import warnings as _w

    cd_spec = jax.ShapeDtypeStruct(cdata.shape, cdata.dtype)
    lowered = []
    with _w.catch_warnings():
        # donation of carried updates that have no same-shape output in a
        # given segment is reported at LOWERING time; same benign condition
        # the lazy path filters at call time
        _w.filterwarnings("ignore", message=".*donated buffers.*")
        for ent in fns:
            fn, in_keys, dev_args = ent
            upd_in = {k: upd_spec(k) for k in in_keys}
            if dev_args is not None:
                args_spec = jax.tree_util.tree_map(
                    lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                    dev_args)
                lowered.append(fn.lower(cd_spec, upd_in, args_spec))
            else:
                lowered.append(fn.lower(cd_spec, upd_in))
    with concurrent.futures.ThreadPoolExecutor(max_workers=nworkers) as ex:
        exes = list(ex.map(lambda lw: lw.compile(), lowered))
    for ent, exe in zip(fns, exes):
        ent[0] = exe


def _run_plan_segmented(plan: Plan, S, cdata, dtype, udtype, precision,
                        budget_cells: int):
    """Factor via a SEQUENCE of device programs with bounded working sets.

    Role of the reference's beyond-fast-memory machinery (SURVEY §5.7):
    SPQR's stack-disciplined task tree / UMFPACK's arena+GC — re-designed
    for XLA as segment programs over the level schedule. Updates that cross
    a segment boundary are carried as donated pytree state; everything else
    is freed when its segment's program exits. Dispatch pipelining hides the
    per-segment call latency."""
    import jax
    import jax.numpy as jnp

    segs = _segment_schedule(plan, budget_cells)
    order, last_consumer = _update_consumers(plan)
    # args mode (default): index arrays ride as device-resident jit
    # arguments instead of baked HLO constants — giant embedded constants
    # made remote compiles of audikw-class segments pathologically slow
    args_mode = os.environ.get("SSTPU_SEG_ARGS", "1") == "1"
    key = (id(plan), plan.dev_size,
           sum(len(gl) for gl in plan.groups),
           str(dtype), str(udtype), str(precision),
           budget_cells, args_mode)
    cache = getattr(S, "_seg_cache", None)
    if cache is None or cache[0] != key:
        fns = []
        for si, seg in enumerate(segs):
            seg_positions = [order[k] for k in seg]
            first_pos, last_pos = seg_positions[0], seg_positions[-1]
            # updates needed as INPUT: produced before this segment and
            # consumed here or later
            in_keys = sorted(k for k, lp in last_consumer.items()
                             if order[k] < first_pos and lp >= first_pos)
            # updates to EMIT: produced here (or passed through) and
            # consumed after this segment
            def _ix_of(k2):
                g2 = plan.groups[k2[0]][k2[1]]
                d2 = {"asrc": g2.asrc, "adst": g2.adst, "nc": g2.nc,
                      "pairs": _class_arrays(g2)}
                tm2 = getattr(g2, "_tile", None)
                if tm2 is not None:
                    d2["tile"] = (tm2.man, tm2.rowmap, tm2.colmap)
                return d2

            np_idx = {k: _ix_of(k) for k in seg}
            if args_mode:
                seg_args = [np_idx[k2] for k2 in seg]

                def seg_fn(cd, upd_in, idx_list, _seg=seg, _last=last_pos):
                    updates = dict(upd_in)
                    panels = []
                    token = None
                    for (d, gi), ix in zip(_seg, idx_list):
                        g = plan.groups[d][gi]
                        pflat, U = _group_compute(g, ix, cd, updates,
                                                  dtype, None, udtype,
                                                  precision, token=token)
                        panels.append(pflat)
                        token = pflat[:1]
                        if U is not None:
                            updates[(d, gi)] = U
                    out = {k2: v for k2, v in updates.items()
                           if last_consumer.get(k2, -1) > _last}
                    pcat = (jnp.concatenate(panels) if panels
                            else jnp.zeros(0, dtype=dtype))
                    return pcat, out

                dev_args = jax.device_put(seg_args)
                fns.append([jax.jit(seg_fn, donate_argnums=(1,)), in_keys,
                            dev_args])
            else:
                def seg_fn(cd, upd_in, _seg=seg, _idx=np_idx,
                           _last=last_pos):
                    updates = dict(upd_in)
                    panels = []
                    token = None
                    for (d, gi) in _seg:
                        g = plan.groups[d][gi]
                        pflat, U = _group_compute(g, _idx[(d, gi)], cd,
                                                  updates, dtype, None,
                                                  udtype, precision,
                                                  token=token)
                        panels.append(pflat)
                        token = pflat[:1]
                        if U is not None:
                            updates[(d, gi)] = U
                    out = {k2: v for k2, v in updates.items()
                           if last_consumer.get(k2, -1) > _last}
                    pcat = (jnp.concatenate(panels) if panels
                            else jnp.zeros(0, dtype=dtype))
                    return pcat, out

                fns.append([jax.jit(seg_fn, donate_argnums=(1,)), in_keys,
                            None])
        nworkers = int(os.environ.get("SSTPU_SEG_PRECOMPILE", "0"))
        if nworkers > 0:
            _precompile_segments(fns, plan, cdata, udtype, nworkers)
        S._seg_cache = (key, fns, segs)
    _, fns, segs = S._seg_cache

    upd_state = {}
    panel_parts = []
    import warnings as _w
    with _w.catch_warnings():
        # consumed update buffers are donated; XLA reports the ones it
        # cannot alias into same-shaped outputs (they are still freed when
        # the host drops its reference after the last consumer segment)
        _w.filterwarnings("ignore", message=".*donated buffers.*")
        for (fn, in_keys, dev_args) in fns:
            upd_in = {k: upd_state.pop(k) for k in in_keys}
            if dev_args is not None:
                pcat, upd_out = fn(cdata, upd_in, dev_args)
            else:
                pcat, upd_out = fn(cdata, upd_in)
            panel_parts.append(pcat)
            upd_state.update(upd_out)
    return jnp.concatenate(panel_parts) if panel_parts else \
        jnp.zeros(0, dtype=dtype)


def _clow_data(A: CSC, S: SupernodalSymbolic) -> np.ndarray:
    """Values of symperm(A, perm).transpose() via a cached position map —
    the steady-state factor-many path does NO per-call symbolic work."""
    key = A.pattern_key()
    cache = getattr(S, "_clow_map", None)
    if cache is None or cache[0] != key:
        trace = CSC(A.nrow, A.ncol, A.indptr, A.indices,
                    np.arange(A.nnz, dtype=np.float64), A.sym)
        C_low = trace.symperm(S.perm).transpose()
        S._clow_map = (key, C_low.data.astype(np.int64))
    return A.data[S._clow_map[1]]


def factorize_device(A: CSC, S: SupernodalSymbolic,
                     config: Config = DEFAULT) -> SupernodalFactor:
    import jax
    import jax.numpy as jnp

    plan = getattr(S, "_device_plan", None)
    if plan is None:
        C_low = A.symperm(S.perm).transpose()
        plan = build_plan(S, C_low)
        S._device_plan = plan
        S._clow_cache = C_low      # pattern reuse (coarse solve plan)
        S._device_fn = None
    dtype = jnp.float64 if (config.compute_dtype == "float64"
                            and jax.config.jax_enable_x64) else jnp.float32
    udtype = (jnp.bfloat16 if config.update_dtype == "bfloat16" else dtype)

    # memory-bounded segmented execution for big problems: one XLA program
    # per bounded-working-set segment instead of one program for the whole
    # tree (whose buffer assignment holds ~2-3x the live set and OOMs HBM
    # between n=125k and n=166k — VERDICT r1 item 1)
    seg_mode = os.environ.get("SSTPU_SEGMENT", "auto")
    total_cells = sum(_estimate_group_cells(g)
                      for gl in plan.groups for g in gl)
    # round-1 measurement: 1.69e9 cells (n=125k) fit in one program,
    # 2.47e9 (n=166k) OOMed — the threshold sits between
    seg_threshold = int(float(os.environ.get("SSTPU_SEG_THRESHOLD", "2.0e9")))
    use_seg = (seg_mode == "1"
               or (seg_mode == "auto" and total_cells > seg_threshold))
    if use_seg:
        prec = {"highest": jax.lax.Precision.HIGHEST,
                "high": jax.lax.Precision.HIGH,
                "default": jax.lax.Precision.DEFAULT}[config.precision]
        budget = int(float(os.environ.get("SSTPU_SEG_CELLS", "3e8")))
        cdata = jnp.asarray(_clow_data(A, S))
        Lxdev = _run_plan_segmented(plan, S, cdata, dtype, udtype, prec,
                                    budget)
        minor = S.n
        if not bool(jnp.isfinite(Lxdev).all()):
            minor = _find_minor(S, plan, Lxdev)
        return SupernodalFactor(S=S, Lx=Lxdev, minor=minor, layout="device")

    fn = getattr(S, "_device_fn", None)
    if fn is None or getattr(S, "_device_dtype", None) != (dtype, udtype):
        prec = {"highest": jax.lax.Precision.HIGHEST,
                "high": jax.lax.Precision.HIGH,
                "default": jax.lax.Precision.DEFAULT}[config.precision]
        if os.environ.get("SSTPU_PLAN_CONSTS", "1") == "1":
            np_idx = plan_arrays(plan)
            fn = jax.jit(lambda cd: _run_plan(plan, cd, np_idx, dtype,
                                              udtype=udtype, precision=prec))
            S._device_idx = None
        else:
            fn = jax.jit(lambda cd, idx: _run_plan(plan, cd, idx, dtype,
                                                   udtype=udtype,
                                                   precision=prec))
            S._device_idx = [jnp.asarray(a) for a in plan_arrays(plan)]
        S._device_fn = fn
        S._device_dtype = (dtype, udtype)
    cdata = _clow_data(A, S)
    if S._device_idx is None:
        Lxdev = fn(jnp.asarray(cdata))
    else:
        Lxdev = fn(jnp.asarray(cdata), S._device_idx)

    # factor stays ON DEVICE in the padded group layout; success check is a
    # scalar reduction (also the synchronization point)
    minor = S.n
    if not bool(jnp.isfinite(Lxdev).all()):
        minor = _find_minor(S, plan, Lxdev)
    return SupernodalFactor(S=S, Lx=Lxdev, minor=minor, layout="device")


def _find_minor(S, plan, Lxdev) -> int:
    """First non-finite column (cholmod L->minor contract) from the device
    factor buffer."""
    Lh = np.asarray(Lxdev, dtype=np.float64)
    Lpx_h = np.zeros(plan.lnz)
    Lpx_h[plan.px_dst] = Lh[plan.px_src]
    for s in range(S.nsuper):
        if not np.all(np.isfinite(Lpx_h[S.Lpx[s]:S.Lpx[s + 1]])):
            return int(S.super_first[s])
    return S.n


def roofline_report(S: SupernodalSymbolic, bytes_per_elt: int = 4) -> str:
    """Per-(level, bucket) flop/byte accounting from the static plan — the
    analog of the reference's per-BLAS-call counters (cholmod_core.h:1002-1022)
    computed AHEAD of time (the plan knows both sides of the roofline).

    Returns a table: level, shape, batch, MFLOP (factor + placement matmuls),
    MB moved (front buffers + A scatter + update blocks), intensity."""
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
            pair_cells = 0
            for pc in g.pairs:
                # P @ U @ P^T placement matmuls on the MXU
                fl += pc.npairs * (2.0 * g.R * pc.RU_c * pc.RU_c
                                   + 2.0 * g.R * g.R * pc.RU_c)
                pair_cells += pc.npairs * (pc.RU_c * pc.RU_c + g.R * g.R)
            cells = g.B * g.R * g.R + g.B * RU * RU
            byt = bytes_per_elt * (2 * cells + pair_cells) \
                + g.asrc.size * (4 + 8 + bytes_per_elt)
            tot_f += fl
            tot_b += byt
            lines.append(f"{d:5d}  {g.R:5d}x{g.C:<5d} {g.B:6d} "
                         f"{fl / 1e6:8.1f} {byt / 1e6:7.1f} "
                         f"{fl / max(byt, 1):9.2f}")
    lines.append(f"TOTAL  {'':12s} {'':6s} {tot_f / 1e6:8.1f} "
                 f"{tot_b / 1e6:7.1f} {tot_f / max(tot_b, 1):9.2f}")
    return "\n".join(lines)
