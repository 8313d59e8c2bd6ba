"""Distributed multifrontal factorization v2: subtree-per-device shard_map
leaf phase with an explicit psum halo exchange, panel-sharded top phase.

Design (VERDICT r1 item 2; SURVEY §5.8 / §7 S6):

  * :func:`..parallel.schedule.partition_tree` cuts the supernode tree into
    flop-balanced subtrees (SPQR task-tree analog) and a TOP separator
    crown.
  * The plan is rebuilt with the top mask splitting groups, so every group
    is either LEAF (all snodes owned by subtree devices) or TOP.
  * LEAF phase runs under ``shard_map`` over the flattened device axis:
    every device executes the same group schedule on its OWN slots
    (per-device index arrays are sharded jit arguments; batches padded to
    the per-class device maximum — dummy slots factor identity fronts and
    contribute zero updates). Extend-adds below the cut are device-local by
    construction (child and parent live in the same subtree) — ZERO
    communication.
  * Contributions that cross the cut are placed into a flat buffer of all
    TOP fronts and combined with ONE ``jax.lax.psum`` — the explicit halo
    exchange of child contribution blocks (the reference's
    ``t_cholmod_gpu.c`` assembly, reborn as a collective).
  * The TOP phase (the sequential separator chain) factors with front rows
    sharded over the 'panel' mesh axis via consistent sharding constraints
    (no tree/panel conflicts -> no involuntary GSPMD rematerialization).
  * The factor never leaves the device: leaf panels are remapped into the
    canonical single-chip device layout with two on-device gathers (via the
    CHOLMOD px intermediate), so the existing solves consume it unchanged.
"""

from __future__ import annotations

import numpy as np

from ..config import Config, DEFAULT
from ..sparse import CSC
from ..symbolic.supernodes import SupernodalSymbolic
from ..numeric.supernodal import SupernodalFactor
from ..numeric import supernodal_device as sd
from .schedule import partition_tree, partition_tree_topology

__all__ = ["dist_factorize_v2", "dist_solve_v2", "build_dist_plan"]


def _dist_dtype(config: Config):
    """Compute dtype for the distributed paths — honors
    config.compute_dtype exactly as the single-chip factorize_device does
    (ADVICE r2: the hardcoded fp32 silently downgraded fp64 opt-ins)."""
    import jax
    import jax.numpy as jnp

    return jnp.float64 if (config.compute_dtype == "float64"
                           and jax.config.jax_enable_x64) else jnp.float32


class _Shim:
    """GroupPlan-shaped view with a per-device batch (for _group_compute)."""

    def __init__(self, R, C, B, npairs_list, asrc_size):
        self.R, self.C, self.B = R, C, B
        self.pairs = npairs_list      # list[PairClass]
        self.asrc = np.empty(asrc_size, dtype=np.int32)  # size only
        self.panel_base = 0


def build_dist_plan(S: SupernodalSymbolic, C_low: CSC, ndev: int,
                    topo: tuple | None = None):
    """Returns (plan, part, dist) where dist holds the per-device leaf
    schedule, cut routing, and canonical remap arrays.

    With ``topo=(nhost, nchip)`` the partition is the 2-level DCN/ICI cut
    (schedule.partition_tree_topology) and ``dist["v3"]`` additionally holds
    the host-local MID phase structures: per-HOST mid group schedules (the
    leaf machinery one level up), leaf->mid halo routing (summed over the
    intra-host 'chip' axis only — never DCN), and mid->top routing into the
    one global psum.  The dist2-compatible structures (top = MID + global
    TOP, replicated) are still built — the distributed solve consumes them
    unchanged."""
    if topo is not None:
        nhost, nchip = topo
        assert nhost * nchip == ndev
        part = partition_tree_topology(S, nhost, nchip)
        split = part.split_key
    else:
        part = partition_tree(S, ndev)
        split = part.top
    plan = sd.build_plan(S, C_low, split_mask=split)

    # classify groups; global order
    leaf_groups, top_groups = [], []
    for d, glist in enumerate(plan.groups):
        for gi, g in enumerate(glist):
            if part.top[g.snodes[0]]:
                top_groups.append((d, gi))
            else:
                leaf_groups.append((d, gi))
    leaf_index = {k: i for i, k in enumerate(leaf_groups)}
    top_index = {k: i for i, k in enumerate(top_groups)}

    # top-front flat buffer layout
    top_base = {}
    off = 0
    for k in top_groups:
        g = plan.groups[k[0]][k[1]]
        top_base[k] = off
        off += g.B * g.R * g.R
    f0_cells = off

    # ---- per-device slot maps for leaf groups ----
    # slot (global b) -> (device, local slot); batches padded to Bd
    leaf_meta = []
    for k in leaf_groups:
        g = plan.groups[k[0]][k[1]]
        devs = part.own[g.snodes]
        assert np.all(devs >= 0)
        order = np.argsort(devs, kind="stable")
        counts = np.bincount(devs, minlength=ndev)
        Bd = int(counts.max()) if g.B else 1
        lslot = np.empty(g.B, dtype=np.int64)
        cur = np.zeros(ndev, dtype=np.int64)
        for b in order:
            d0 = devs[b]
            lslot[b] = cur[d0]
            cur[d0] += 1
        leaf_meta.append((devs, lslot, Bd))

    # ---- per-device index arrays ----
    # A-entry scatter: split g.adst by device, renumber slots, pad
    dist_groups = []     # per leaf group: dict of stacked (D, ...) arrays
    for li, k in enumerate(leaf_groups):
        g = plan.groups[k[0]][k[1]]
        devs, lslot, Bd = leaf_meta[li]
        R, C = g.R, g.C
        slot_of_entry = g.adst // (R * R)
        coord = g.adst % (R * R)
        edev = devs[slot_of_entry]
        eadst = lslot[slot_of_entry] * R * R + coord
        # per-device counts, pad to max
        ecnt = np.bincount(edev, minlength=ndev)
        emax = int(ecnt.max()) if g.adst.size else 0
        asrc_d = np.zeros((ndev, emax), dtype=np.int32)
        # distinct OOB pad indices keep the sorted+unique scatter contract
        adst_d = (Bd * R * R
                  + np.tile(np.arange(emax, dtype=np.int64), (ndev, 1)))
        for d0 in range(ndev):
            sel = edev == d0
            m = int(sel.sum())
            # keep sorted adst within device (stable selection preserves it)
            asrc_d[d0, :m] = g.asrc[sel]
            adst_d[d0, :m] = eadst[sel]
        nc_d = np.zeros((ndev, Bd), dtype=np.int32)
        for b in range(g.B):
            nc_d[devs[b], lslot[b]] = g.nc[b]
        # pairs: all children are leaf groups on the SAME device
        pair_sets = []
        for pc, (src, dst, idx) in zip(g.pairs, g._pair_arrays):
            ck = (pc.src_level, pc.src_gi)
            cli = leaf_index[ck]
            cdevs, clslot, cBd = leaf_meta[cli]
            pdev = devs[dst]
            assert np.array_equal(pdev, cdevs[src]), "cross-device leaf pair"
            pcnt = np.bincount(pdev, minlength=ndev)
            pmax = max(int(pcnt.max()), 1)
            # pads are OUT OF BOUNDS (dropped by the scatter) — a slot-0
            # pad would CLOBBER real data in the solve's .set push-down
            src_d = np.full((ndev, pmax), cBd, dtype=np.int32)
            dst_d = np.full((ndev, pmax), Bd, dtype=np.int32)
            idx_d = np.full((ndev, pmax, pc.RU_c), -1, dtype=np.int32)
            for d0 in range(ndev):
                sel = pdev == d0
                m = int(sel.sum())
                src_d[d0, :m] = clslot[src[sel]]
                dst_d[d0, :m] = lslot[dst[sel]]
                idx_d[d0, :m] = idx[sel]
            pair_sets.append((cli, pc.RU_c, pmax, src_d, dst_d, idx_d))
        dist_groups.append({
            "k": k, "R": R, "C": C, "Bd": Bd, "emax": emax,
            "asrc": asrc_d, "adst": adst_d, "nc": nc_d,
            "pairs": pair_sets,
        })

    # ---- cut routing: leaf-group updates -> top-front flat buffer ----
    # for each TOP group, its pairs whose child is a LEAF group move into
    # the cut set (placed + psummed before the top phase)
    cut_sets = []       # (leaf li, RU_c, pmax, src_d, base_d, idx_d)
    top_plan = []       # per top group: ix dict with only top-child pairs
    for k in top_groups:
        g = plan.groups[k[0]][k[1]]
        R = g.R
        keep_pairs, keep_arrays = [], []
        for pc, (src, dst, idx) in zip(g.pairs, g._pair_arrays):
            ck = (pc.src_level, pc.src_gi)
            if ck in top_index:
                keep_pairs.append(pc)
                keep_arrays.append((src, dst, idx))
                continue
            cli = leaf_index[ck]
            cdevs, clslot, cBd = leaf_meta[cli]
            pdev = cdevs[src]           # device owning the child
            pcnt = np.bincount(pdev, minlength=ndev)
            pmax = max(int(pcnt.max()), 1)
            # OOB pads (see leaf pair_sets note)
            src_d = np.full((ndev, pmax), cBd, dtype=np.int32)
            dst_d = np.full((ndev, pmax), g.B, dtype=np.int32)
            idx_d = np.full((ndev, pmax, pc.RU_c), -1, dtype=np.int32)
            for d0 in range(ndev):
                sel = pdev == d0
                m = int(sel.sum())
                src_d[d0, :m] = clslot[src[sel]]
                dst_d[d0, :m] = dst[sel]
                idx_d[d0, :m] = idx[sel]
            cut_sets.append((cli, pc.RU_c, pmax, R, top_index[k],
                             src_d, dst_d, idx_d))
        top_plan.append((k, keep_pairs, keep_arrays))

    # ---- canonical remap (dist leaf layout -> canonical plan layout) ----
    # leaf panel cell (li, dev, lslot, r, c) <-> plan panel cell; built via
    # per-group vectorized index arithmetic
    leaf_cells = 0
    leaf_base = []
    for dg in dist_groups:
        leaf_base.append(leaf_cells)
        leaf_cells += dg["Bd"] * dg["R"] * dg["C"]
    # map: canonical dev-layout index <- (device, leaf-local index)
    can_src_dev = []
    can_src_pos = []
    can_dst = []
    for li, k in enumerate(leaf_groups):
        g = plan.groups[k[0]][k[1]]
        devs, lslot, Bd = leaf_meta[li]
        R, C = g.R, g.C
        cells = R * C
        cell = np.arange(cells, dtype=np.int64)
        for b in range(g.B):
            can_dst.append(g.panel_base + b * cells + cell)
            can_src_dev.append(np.full(cells, devs[b], dtype=np.int64))
            can_src_pos.append(leaf_base[li] + lslot[b] * cells + cell)
    dist = {
        "ndev": ndev, "leaf_groups": leaf_groups, "top_groups": top_groups,
        "dist_groups": dist_groups, "cut_sets": cut_sets,
        "top_plan": top_plan, "f0_cells": f0_cells,
        "leaf_cells": leaf_cells, "leaf_base": leaf_base,
        "can_dst": (np.concatenate(can_dst) if can_dst
                    else np.empty(0, np.int64)),
        "can_src_dev": (np.concatenate(can_src_dev) if can_src_dev
                        else np.empty(0, np.int64)),
        "can_src_pos": (np.concatenate(can_src_pos) if can_src_pos
                        else np.empty(0, np.int64)),
    }

    # ---- distributed-solve arrays (consumed by dist_solve_v2) ----
    # per leaf group: per-device global column ids (pad -> n) and per-device
    # canonical-panel gather maps (slot panels from the canonical Lx)
    n = S.n
    solve_leaf = []
    for li, k in enumerate(leaf_groups):
        g = plan.groups[k[0]][k[1]]
        devs, lslot, Bd = leaf_meta[li]
        R, C = g.R, g.C
        col_d = np.full((ndev, Bd * C), n, dtype=np.int64)
        pan_d = np.full((ndev, Bd * R * C), plan.dev_size, dtype=np.int64)
        cell = np.arange(R * C, dtype=np.int64)
        for b, s in enumerate(g.snodes):
            d0, ls = devs[b], lslot[b]
            f = int(S.super_first[s])
            nc = int(S.super_first[s + 1]) - f
            col_d[d0, ls * C:ls * C + nc] = np.arange(f, f + nc)
            pan_d[d0, ls * R * C:(ls + 1) * R * C] = \
                g.panel_base + b * R * C + cell
        solve_leaf.append({"col": col_d, "pan": pan_d})
    # x assembly: canonical x row for each (device, leaf group, slot, k)
    # laid out as the concat of per-device per-group xc buffers
    xrow_parts_dev = []
    xoff = 0
    xmap_dst, xmap_dev, xmap_pos = [], [], []
    for li, k in enumerate(leaf_groups):
        g = plan.groups[k[0]][k[1]]
        devs, lslot, Bd = leaf_meta[li]
        C = g.C
        for b, s in enumerate(g.snodes):
            f = int(S.super_first[s])
            nc = int(S.super_first[s + 1]) - f
            xmap_dst.append(np.arange(f, f + nc))
            xmap_dev.append(np.full(nc, devs[b], dtype=np.int64))
            xmap_pos.append(xoff + lslot[b] * C + np.arange(nc))
        xoff += Bd * C
    dist["solve_leaf"] = solve_leaf
    dist["x_cells_dev"] = xoff          # per-device xc concat length
    dist["xmap_dst"] = (np.concatenate(xmap_dst) if xmap_dst
                        else np.empty(0, np.int64))
    dist["xmap_dev"] = (np.concatenate(xmap_dev) if xmap_dev
                        else np.empty(0, np.int64))
    dist["xmap_pos"] = (np.concatenate(xmap_pos) if xmap_pos
                        else np.empty(0, np.int64))
    if topo is not None:
        dist["v3"] = _build_v3(S, plan, part, dist, leaf_meta, leaf_index,
                               topo)
    return plan, part, dist


def _build_v3(S, plan, part, dist, leaf_meta, leaf_index, topo):
    """Host-local MID phase structures for the (host, chip) topology."""
    nhost, nchip = topo
    ndev = nhost * nchip
    key_of = part.split_key

    mid_groups, gtop_groups = [], []
    for k in dist["top_groups"]:
        g = plan.groups[k[0]][k[1]]
        (mid_groups if key_of[g.snodes[0]] == 1 else gtop_groups).append(k)
    mid_index = {k: i for i, k in enumerate(mid_groups)}
    gtop_index = {k: i for i, k in enumerate(gtop_groups)}

    # MID front/panel buffer layouts (per-host, slots padded to Bh)
    mid_meta = []           # (hof, lslot, Bh)
    f1_base, pan_base = [], []
    f1_cells = pan_cells = 0
    for k in mid_groups:
        g = plan.groups[k[0]][k[1]]
        hof = part.mid_host[g.snodes]
        assert np.all(hof >= 0)
        counts = np.bincount(hof, minlength=nhost)
        Bh = max(int(counts.max()), 1)
        lslot = np.empty(g.B, dtype=np.int64)
        cur = np.zeros(nhost, dtype=np.int64)
        for b in np.argsort(hof, kind="stable"):
            lslot[b] = cur[hof[b]]
            cur[hof[b]] += 1
        mid_meta.append((hof, lslot, Bh))
        f1_base.append(f1_cells)
        f1_cells += Bh * g.R * g.R
        pan_base.append(pan_cells)
        pan_cells += Bh * g.R * g.C

    # GTOP front buffer layout (global; psummed over the whole fleet = DCN)
    f0_base = []
    f0_cells = 0
    for k in gtop_groups:
        g = plan.groups[k[0]][k[1]]
        f0_base.append(f0_cells)
        f0_cells += g.B * g.R * g.R

    # ---- per-host MID group schedules (leaf machinery, one level up) ----
    mid_dist = []
    leafmid_cut = []    # leaf child -> mid parent (devices place; chip psum)
    for mi, k in enumerate(mid_groups):
        g = plan.groups[k[0]][k[1]]
        hof, lslot, Bh = mid_meta[mi]
        R, C = g.R, g.C
        slot_of_entry = g.adst // (R * R)
        coord = g.adst % (R * R)
        ehost = hof[slot_of_entry]
        eadst = lslot[slot_of_entry] * R * R + coord
        ecnt = np.bincount(ehost, minlength=nhost)
        emax = int(ecnt.max()) if g.adst.size else 0
        asrc_h = np.zeros((nhost, emax), dtype=np.int32)
        adst_h = (Bh * R * R
                  + np.tile(np.arange(emax, dtype=np.int64), (nhost, 1)))
        for h in range(nhost):
            sel = ehost == h
            m = int(sel.sum())
            asrc_h[h, :m] = g.asrc[sel]
            adst_h[h, :m] = eadst[sel]
        nc_h = np.zeros((nhost, Bh), dtype=np.int32)
        for b in range(g.B):
            nc_h[hof[b], lslot[b]] = g.nc[b]
        pair_sets = []      # mid child -> this mid parent (host-local)
        for pc, (src, dst, idx) in zip(g.pairs, g._pair_arrays):
            ck = (pc.src_level, pc.src_gi)
            if ck not in mid_index:
                # leaf child: routed through the F1 halo (chip psum)
                cli = leaf_index[ck]
                cdevs, clslot, cBd = leaf_meta[cli]
                pdev = cdevs[src]               # device owning the child
                assert np.array_equal(pdev // nchip, hof[dst]), \
                    "leaf->mid pair crosses hosts"
                pcnt = np.bincount(pdev, minlength=ndev)
                pmax = max(int(pcnt.max()), 1)
                src_d = np.full((ndev, pmax), cBd, dtype=np.int32)
                dst_d = np.full((ndev, pmax), Bh, dtype=np.int32)
                idx_d = np.full((ndev, pmax, pc.RU_c), -1, dtype=np.int32)
                for d0 in range(ndev):
                    sel = pdev == d0
                    m = int(sel.sum())
                    src_d[d0, :m] = clslot[src[sel]]
                    dst_d[d0, :m] = lslot[dst[sel]]
                    idx_d[d0, :m] = idx[sel]
                leafmid_cut.append((cli, mi, pc.RU_c, pmax, R,
                                    src_d, dst_d, idx_d))
                continue
            cmi = mid_index[ck]
            chof, clslot, cBh = mid_meta[cmi]
            phost = hof[dst]
            assert np.array_equal(phost, chof[src]), "mid pair crosses hosts"
            pcnt = np.bincount(phost, minlength=nhost)
            pmax = max(int(pcnt.max()), 1)
            src_h = np.full((nhost, pmax), cBh, dtype=np.int32)
            dst_h = np.full((nhost, pmax), Bh, dtype=np.int32)
            idx_h = np.full((nhost, pmax, pc.RU_c), -1, dtype=np.int32)
            for h in range(nhost):
                sel = phost == h
                m = int(sel.sum())
                src_h[h, :m] = clslot[src[sel]]
                dst_h[h, :m] = lslot[dst[sel]]
                idx_h[h, :m] = idx[sel]
            pair_sets.append((cmi, pc.RU_c, pmax, src_h, dst_h, idx_h))
        mid_dist.append({
            "k": k, "R": R, "C": C, "Bh": Bh, "emax": emax,
            "asrc": asrc_h, "adst": adst_h, "nc": nc_h, "pairs": pair_sets,
        })

    # ---- GTOP routing ----
    gtop_cut = []       # leaf child -> gtop parent: devices place into F0
    midtop_cut = []     # mid child -> gtop parent: chip-0 places into F0
    gtop_plan = []      # per gtop group: only gtop-child pairs stay direct
    for gt, k in enumerate(gtop_groups):
        g = plan.groups[k[0]][k[1]]
        R = g.R
        keep_pairs, keep_arrays = [], []
        for pc, (src, dst, idx) in zip(g.pairs, g._pair_arrays):
            ck = (pc.src_level, pc.src_gi)
            if ck in gtop_index:
                keep_pairs.append(pc)
                keep_arrays.append((src, dst, idx))
            elif ck in mid_index:
                cmi = mid_index[ck]
                chof, clslot, cBh = mid_meta[cmi]
                phost = chof[src]               # host owning the child
                pcnt = np.bincount(phost, minlength=nhost)
                pmax = max(int(pcnt.max()), 1)
                src_h = np.full((nhost, pmax), cBh, dtype=np.int32)
                dst_h = np.full((nhost, pmax), g.B, dtype=np.int32)
                idx_h = np.full((nhost, pmax, pc.RU_c), -1, dtype=np.int32)
                for h in range(nhost):
                    sel = phost == h
                    m = int(sel.sum())
                    src_h[h, :m] = clslot[src[sel]]
                    dst_h[h, :m] = dst[sel]
                    idx_h[h, :m] = idx[sel]
                midtop_cut.append((cmi, pc.RU_c, pmax, R, gt,
                                   src_h, dst_h, idx_h))
            else:
                cli = leaf_index[ck]
                cdevs, clslot, cBd = leaf_meta[cli]
                pdev = cdevs[src]
                pcnt = np.bincount(pdev, minlength=ndev)
                pmax = max(int(pcnt.max()), 1)
                src_d = np.full((ndev, pmax), cBd, dtype=np.int32)
                dst_d = np.full((ndev, pmax), g.B, dtype=np.int32)
                idx_d = np.full((ndev, pmax, pc.RU_c), -1, dtype=np.int32)
                for d0 in range(ndev):
                    sel = pdev == d0
                    m = int(sel.sum())
                    src_d[d0, :m] = clslot[src[sel]]
                    dst_d[d0, :m] = dst[sel]
                    idx_d[d0, :m] = idx[sel]
                gtop_cut.append((cli, pc.RU_c, pmax, R, gt,
                                 src_d, dst_d, idx_d))
        gtop_plan.append((k, keep_pairs, keep_arrays))

    # ---- mid canonical remap: (host, per-host panel pos) -> canonical ----
    midcan_dst, midcan_host, midcan_pos = [], [], []
    for mi, k in enumerate(mid_groups):
        g = plan.groups[k[0]][k[1]]
        hof, lslot, Bh = mid_meta[mi]
        cells = g.R * g.C
        cell = np.arange(cells, dtype=np.int64)
        for b in range(g.B):
            midcan_dst.append(g.panel_base + b * cells + cell)
            midcan_host.append(np.full(cells, hof[b], dtype=np.int64))
            midcan_pos.append(pan_base[mi] + lslot[b] * cells + cell)
    e = np.empty(0, np.int64)
    return {
        "nhost": nhost, "nchip": nchip,
        "mid_groups": mid_groups, "gtop_groups": gtop_groups,
        "mid_dist": mid_dist, "mid_meta": mid_meta,
        "f1_base": f1_base, "f1_cells": f1_cells,
        "pan_base": pan_base, "pan_cells": pan_cells,
        "f0_base": f0_base, "f0_cells": f0_cells,
        "leafmid_cut": leafmid_cut, "gtop_cut": gtop_cut,
        "midtop_cut": midtop_cut, "gtop_plan": gtop_plan,
        "midcan_dst": (np.concatenate(midcan_dst) if midcan_dst else e),
        "midcan_host": (np.concatenate(midcan_host) if midcan_host else e),
        "midcan_pos": (np.concatenate(midcan_pos) if midcan_pos else e),
    }


def _make_v3_fn(plan, dist, mesh, axes, dtype, prec, shard_leading):
    """Jitted 2-level (host, chip) factorization program.

    Three phases inside ONE shard_map over the full mesh:
      leaf  — per-chip subtree groups (device-local extend-adds, zero comm);
      mid   — per-HOST subtree-crown groups: leaf->mid halos are placed
              device-locally and summed with ``psum`` over the intra-host
              'chip' axis only (ICI); each chip of a host then factors its
              host's mid fronts redundantly (chip-replicated compute — the
              mid slots are host-sharded, so hosts do disjoint work);
      gtop  — contributions into the global separator crown (leaf's from
              every device; mid's from chip 0 of each host) combine in ONE
              global psum — the only DCN-crossing collective.
    The separator crown itself then factors outside the shard_map with
    front rows panel-sharded over the fleet (as the flat v2 top phase)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    v3 = dist["v3"]
    dist_groups = dist["dist_groups"]
    mid_dist = v3["mid_dist"]
    mid_groups, gtop_groups = v3["mid_groups"], v3["gtop_groups"]
    leafmid_cut, gtop_cut = v3["leafmid_cut"], v3["gtop_cut"]
    midtop_cut, gtop_plan = v3["midtop_cut"], v3["gtop_plan"]
    hax = (axes[0],)
    cax = axes[1]

    def shard_host(x):
        return jax.device_put(x, NamedSharding(mesh, P(hax)))

    lm_args = [(shard_leading(s), shard_leading(d0), shard_leading(ix))
               for (_, _, _, _, _, s, d0, ix) in leafmid_cut]
    gt_args = [(shard_leading(s), shard_leading(d0), shard_leading(ix))
               for (_, _, _, _, _, s, d0, ix) in gtop_cut]
    mid_args = []
    for md in mid_dist:
        pa = [(shard_host(s), shard_host(d0), shard_host(ix))
              for (_, _, _, s, d0, ix) in md["pairs"]]
        mid_args.append((shard_host(md["asrc"]), shard_host(md["adst"]),
                         shard_host(md["nc"]), pa))
    mt_args = [(shard_host(s), shard_host(d0), shard_host(ix))
               for (_, _, _, _, _, s, d0, ix) in midtop_cut]

    def _contrib(Usrc, srcs, idxs, R, RU_c):
        child = Usrc[srcs]
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, R, RU_c), 1)
        Pm = (iota == idxs[:, None, :]).astype(dtype)
        half = jnp.matmul(Pm, child, preferred_element_type=dtype,
                          precision=prec)
        return jnp.einsum('bik,bjk->bij', half, Pm,
                          preferred_element_type=dtype, precision=prec)

    def body(cdata, largs, lmargs, gtargs, midargs, mtargs):
        updates = {}
        panels = []
        token = None
        # ---- leaf phase (per-chip subtrees; zero communication) ----
        for li, dg in enumerate(dist_groups):
            asrc, adst, ncarr = (largs[li][0][0], largs[li][1][0],
                                 largs[li][2][0])
            R, C, Bd = dg["R"], dg["C"], dg["Bd"]
            shim = _Shim(R, C, Bd,
                         [sd.PairClass(src_level=0, src_gi=cli,
                                       RU_c=ru, npairs=pm)
                          for (cli, ru, pm, _, _, _) in dg["pairs"]],
                         dg["emax"])
            ix = {"asrc": asrc, "adst": adst, "nc": ncarr,
                  "pairs": [(p[0][0], p[1][0], p[2][0])
                            for p in largs[li][3]]}
            pflat, U = sd._group_compute(shim, ix, cdata, updates,
                                         dtype, None, None, prec,
                                         token=token)
            panels.append(pflat)
            token = pflat[:1]
            if U is not None:
                updates[(0, li)] = U
        # ---- leaf->mid halo: device-local placement + ICI-only psum ----
        F1s = []
        for mi, k in enumerate(mid_groups):
            g = plan.groups[k[0]][k[1]]
            Bh = v3["mid_dist"][mi]["Bh"]
            F1s.append(jnp.zeros((Bh, g.R, g.R), dtype=dtype))
        for ci, (cli, mi, RU_c, pmax, R, _, _, _) in enumerate(leafmid_cut):
            srcs, dsts, idxs = (lmargs[ci][0][0], lmargs[ci][1][0],
                                lmargs[ci][2][0])
            F1s[mi] = F1s[mi].at[dsts].add(
                _contrib(updates[(0, cli)], srcs, idxs, R, RU_c))
        if F1s:
            F1 = jnp.concatenate([f.reshape(-1) for f in F1s])
            F1 = jax.lax.psum(F1, cax)        # intra-host (ICI) halo only
        else:
            F1 = jnp.zeros(0, dtype=dtype)
        # ---- mid phase: host-sharded slots, chip-replicated compute ----
        mid_panels = []
        for mi, md in enumerate(mid_dist):
            k = mid_groups[mi]
            g = plan.groups[k[0]][k[1]]
            R, C, Bh = md["R"], md["C"], md["Bh"]
            asrc, adst, ncarr = (midargs[mi][0][0], midargs[mi][1][0],
                                 midargs[mi][2][0])
            f1 = jax.lax.dynamic_slice(F1, (v3["f1_base"][mi],),
                                       (Bh * R * R,))
            shim = _Shim(R, C, Bh,
                         [sd.PairClass(src_level=1, src_gi=cmi,
                                       RU_c=ru, npairs=pm)
                          for (cmi, ru, pm, _, _, _) in md["pairs"]],
                         md["emax"])
            ix = {"asrc": asrc, "adst": adst, "nc": ncarr,
                  "pairs": [(p[0][0], p[1][0], p[2][0])
                            for p in midargs[mi][3]]}
            pflat, U = sd._group_compute(shim, ix, cdata, updates,
                                         dtype, None, None, prec,
                                         token=token, f0=f1)
            mid_panels.append(pflat)
            token = pflat[:1]
            if U is not None:
                updates[(1, mi)] = U
        # ---- global separator-crown contributions: ONE DCN psum ----
        F0s = []
        for k in gtop_groups:
            g = plan.groups[k[0]][k[1]]
            F0s.append(jnp.zeros((g.B, g.R, g.R), dtype=dtype))
        for ci, (cli, RU_c, pmax, R, gt, _, _, _) in enumerate(gtop_cut):
            srcs, dsts, idxs = (gtargs[ci][0][0], gtargs[ci][1][0],
                                gtargs[ci][2][0])
            F0s[gt] = F0s[gt].at[dsts].add(
                _contrib(updates[(0, cli)], srcs, idxs, R, RU_c))
        # mid updates are chip-replicated: only chip 0 of each host
        # contributes to the global sum
        chip0 = (jax.lax.axis_index(cax) == 0).astype(dtype)
        for ci, (cmi, RU_c, pmax, R, gt, _, _, _) in enumerate(midtop_cut):
            srcs, dsts, idxs = (mtargs[ci][0][0], mtargs[ci][1][0],
                                mtargs[ci][2][0])
            F0s[gt] = F0s[gt].at[dsts].add(
                chip0 * _contrib(updates[(1, cmi)], srcs, idxs, R, RU_c))
        F0 = (jnp.concatenate([f.reshape(-1) for f in F0s])
              if F0s else jnp.zeros(0, dtype=dtype))
        F0 = jax.lax.psum(F0, axes)
        pcat = (jnp.concatenate(panels) if panels
                else jnp.zeros(0, dtype=dtype))
        midcat = (jnp.concatenate(mid_panels) if mid_panels
                  else jnp.zeros(0, dtype=dtype))
        return pcat[None, :], midcat[None, :], F0[None, :]

    in_specs = (P(),
                [tuple([P(axes), P(axes), P(axes),
                        [(P(axes),) * 3 for _ in dg["pairs"]]])
                 for dg in dist_groups],
                [(P(axes),) * 3 for _ in lm_args],
                [(P(axes),) * 3 for _ in gt_args],
                [tuple([P(hax), P(hax), P(hax),
                        [(P(hax),) * 3 for _ in ma[3]]])
                 for ma in mid_args],
                [(P(hax),) * 3 for _ in mt_args])
    out_specs = (P(axes), P(hax), P(axes))

    def full_fn(cdata, largs, lmargs, gtargs, midargs, mtargs):
        leaf_panels, mid_panels, F0r = shard_map(
            body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=False)(cdata, largs, lmargs, gtargs, midargs, mtargs)
        F0 = F0r[0]
        # ---- global top phase: panel-sharded separator crown ----
        updates = {}
        panels_top = {}
        token = None
        pconstr = NamedSharding(mesh, P(None, axes, None))

        def cstr(g, F):
            if g.R >= 256:
                return jax.lax.with_sharding_constraint(F, pconstr)
            return F

        for gt, (k, keep_pairs, keep_arrays) in enumerate(gtop_plan):
            g = plan.groups[k[0]][k[1]]
            f0 = jax.lax.dynamic_slice(F0, (v3["f0_base"][gt],),
                                       (g.B * g.R * g.R,))
            shim = _Shim(g.R, g.C, g.B, keep_pairs, g.asrc.size)
            shim.panel_base = g.panel_base
            ix = {"asrc": g.asrc, "adst": g.adst, "nc": g.nc,
                  "pairs": keep_arrays}
            pflat, U = sd._group_compute(shim, ix, cdata, updates,
                                         dtype, cstr, None, prec,
                                         token=token, f0=f0)
            panels_top[k] = pflat
            token = pflat[:1]
            if U is not None:
                updates[(k[0], k[1])] = U
        # ---- canonical remap: leaf + mid + gtop panels ----
        Lx = jnp.zeros(plan.dev_size, dtype=dtype)
        if dist["can_dst"].size:
            flat_pos = (dist["can_src_dev"] * dist["leaf_cells"]
                        + dist["can_src_pos"])
            vals = leaf_panels.reshape(-1)[flat_pos]
            Lx = Lx.at[dist["can_dst"]].set(vals, unique_indices=True)
        if v3["midcan_dst"].size:
            mpos = v3["midcan_host"] * v3["pan_cells"] + v3["midcan_pos"]
            mvals = mid_panels.reshape(-1)[mpos]
            Lx = Lx.at[v3["midcan_dst"]].set(mvals, unique_indices=True)
        for (k, _, _) in gtop_plan:
            g = plan.groups[k[0]][k[1]]
            Lx = jax.lax.dynamic_update_slice(
                Lx, panels_top[k], (g.panel_base,))
        return Lx

    return jax.jit(full_fn), (lm_args, gt_args, mid_args, mt_args)


def dist_factorize_v2(A: CSC, S: SupernodalSymbolic, mesh,
                      config: Config = DEFAULT,
                      topology: tuple | None = None) -> SupernodalFactor:
    """Sharded factorization: shard_map leaf phase + panel-sharded top
    phase. The returned factor is in the CANONICAL single-chip device
    layout (existing solves consume it directly); it stays on device.

    On a ('host', 'chip') mesh (or with explicit ``topology=(nhost,
    nchip)``), the 2-level DCN/ICI schedule engages: a host-local MID phase
    factors each host's subtree crown with its halo exchange riding the
    intra-host 'chip' axis only; the single global psum of the separator-
    crown contributions is the ONLY collective that crosses hosts (DCN).
    SURVEY §5.8 (i)-(iii), §7 S6 — subtree-per-host over DCN, per-chip
    subtrees + panel sharding within a host."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    # jax.shard_map (the 0.8+ home) drops check_rep; the experimental
    # entry point still accepts it and this code relies on it (manual psum
    # replication the checker cannot prove)
    from jax.experimental.shard_map import shard_map

    ndev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    axes = tuple(mesh.axis_names)
    if topology is None and axes == ("host", "chip"):
        topology = (mesh.shape["host"], mesh.shape["chip"])
    if topology is not None and topology[0] <= 1:
        topology = None          # single host: the flat schedule IS the plan

    cache = getattr(S, "_dist2_cache", None)
    key = (id(mesh), ndev, config.precision, topology,
           str(_dist_dtype(config)))  # dtype changes the compiled program
    if cache is None or cache[0] != key:
        C_low = A.symperm(S.perm).transpose()
        plan, part, dist = build_dist_plan(S, C_low, ndev, topo=topology)
        # the returned factor uses THIS plan's device layout: make it the
        # symbolic handle's canonical plan so the existing solves and px
        # materialization consume the distributed factor unchanged
        S._device_plan = plan
        S._clow_cache = C_low
        S._device_fn = None
        S._solve_plans = None
        S._solve_cache = None
        S._mf2_plan = None
        S._seg_cache = None
        # the distributed-solve program closes over the OLD plan's sharded
        # leaf args — invalidate it with the rest (ADVICE r2)
        S._dist2_solve = None
        # the coarse-solve relayout program slices the OLD plan's panel
        # bases; id() of a freed Plan can recycle, so clear it explicitly
        S._relayout = None
        prec = {"highest": jax.lax.Precision.HIGHEST,
                "high": jax.lax.Precision.HIGH,
                "default": jax.lax.Precision.DEFAULT}[config.precision]
        dtype = _dist_dtype(config)

        dist_groups = dist["dist_groups"]
        cut_sets = dist["cut_sets"]
        top_plan = dist["top_plan"]
        nleaf = len(dist_groups)

        # stacked per-device args, sharded on the leading axis
        def shard_leading(x):
            return jax.device_put(x, NamedSharding(mesh, P(axes)))

        leaf_args = []
        for dg in dist_groups:
            pa = [(shard_leading(s), shard_leading(d0), shard_leading(ix))
                  for (_, _, _, s, d0, ix) in dg["pairs"]]
            leaf_args.append((shard_leading(dg["asrc"]),
                              shard_leading(dg["adst"]),
                              shard_leading(dg["nc"]), pa))
        # (cut_args look v2-only but dist_solve_v2's leaf sweeps consume
        # them from this cache on BOTH schedules — they must stay)
        cut_args = [(shard_leading(s), shard_leading(d0), shard_leading(ix))
                    for (_, _, _, _, _, s, d0, ix) in cut_sets]

        v3fn = None
        if dist.get("v3") is not None:
            # 2-level (host, chip) program; leaf_args are shared with the
            # solve (dist_solve_v2 consumes the dist2-compat structures)
            v3fn, v3_args = _make_v3_fn(plan, dist, mesh, axes, dtype,
                                        prec, shard_leading)
            dist["v3_args"] = v3_args

        def leaf_body(cdata, largs, cargs):
            # per-device: largs leading dim == 1 (shard), squeeze
            updates = {}
            panels = []
            token = None
            for li, dg in enumerate(dist_groups):
                asrc, adst, ncarr, pa = largs[li]
                asrc, adst, ncarr = asrc[0], adst[0], ncarr[0]
                R, C, Bd = dg["R"], dg["C"], dg["Bd"]
                shim = _Shim(R, C, Bd,
                             [sd.PairClass(src_level=0, src_gi=cli,
                                           RU_c=ru, npairs=pm)
                              for (cli, ru, pm, _, _, _) in dg["pairs"]],
                             dg["emax"])
                ix = {"asrc": asrc, "adst": adst, "nc": ncarr,
                      "pairs": [(p[0][0], p[1][0], p[2][0]) for p in pa]}
                # updates keyed (0, cli) to match the shim PairClass keys
                pflat, U = sd._group_compute(shim, ix, cdata, updates,
                                             dtype, None, None, prec,
                                             token=token)
                panels.append(pflat)
                token = pflat[:1]
                if U is not None:
                    updates[(0, li)] = U
            # cut placement: per-top-group front buffers, block-granular
            # scatter-add (the same efficient pattern as the extend-add)
            F0s = [jnp.zeros(plan.groups[k[0]][k[1]].B
                             * plan.groups[k[0]][k[1]].R ** 2, dtype=dtype)
                   .reshape(plan.groups[k[0]][k[1]].B,
                            plan.groups[k[0]][k[1]].R,
                            plan.groups[k[0]][k[1]].R)
                   for k in dist["top_groups"]]
            for ci, (cli, RU_c, pmax, R, tgi, _, _, _) in                     enumerate(cut_sets):
                srcs, dsts, idxs = cargs[ci]
                srcs, dsts, idxs = srcs[0], dsts[0], idxs[0]
                Usrc = updates[(0, cli)]
                child = Usrc[srcs]
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, (1, R, RU_c), 1)
                Pm = (iota == idxs[:, None, :]).astype(dtype)
                half = jnp.matmul(Pm, child, preferred_element_type=dtype,
                                  precision=prec)
                contrib = jnp.einsum('bik,bjk->bij', half, Pm,
                                     preferred_element_type=dtype,
                                     precision=prec)
                F0s[tgi] = F0s[tgi].at[dsts].add(contrib)
            F0 = (jnp.concatenate([f.reshape(-1) for f in F0s])
                  if F0s else jnp.zeros(0, dtype=dtype))
            F0 = jax.lax.psum(F0, axes)
            pcat = (jnp.concatenate(panels) if panels
                    else jnp.zeros(0, dtype=dtype))
            return pcat[None, :], F0[None, :]

        in_specs = (P(),
                    [tuple([P(axes), P(axes), P(axes),
                            [(P(axes),) * 3 for _ in la[3]]])
                     for la in leaf_args],
                    [(P(axes),) * 3 for _ in cut_args])
        out_specs = (P(axes), P(axes))

        def full_fn(cdata, largs, cargs):
            leaf_panels, F0r = shard_map(
                leaf_body, mesh=mesh,
                in_specs=in_specs, out_specs=out_specs,
                check_rep=False)(cdata, largs, cargs)
            # F0r: (ndev, cells) all equal after psum; take row 0
            F0 = F0r[0]
            # ---- top phase: panel-sharded separator fronts ----
            updates = {}
            panels_top = {}
            token = None
            # big separator fronts: shard rows over EVERY device (both
            # mesh axes) — the whole fleet cooperates on the top chain
            pconstr = NamedSharding(mesh, P(None, axes, None))

            def cstr(g, F):
                if pconstr is not None and g.R >= 256:
                    return jax.lax.with_sharding_constraint(F, pconstr)
                return F

            for (k, keep_pairs, keep_arrays) in top_plan:
                g = plan.groups[k[0]][k[1]]
                base = 0
                for kk in dist["top_groups"]:
                    if kk == k:
                        break
                    gg = plan.groups[kk[0]][kk[1]]
                    base += gg.B * gg.R * gg.R
                f0 = jax.lax.dynamic_slice(F0, (base,),
                                           (g.B * g.R * g.R,))
                shim = _Shim(g.R, g.C, g.B, keep_pairs, g.asrc.size)
                shim.panel_base = g.panel_base
                ix = {"asrc": g.asrc, "adst": g.adst, "nc": g.nc,
                      "pairs": keep_arrays}
                pflat, U = sd._group_compute(shim, ix, cdata, updates,
                                             dtype, cstr, None, prec,
                                             token=token, f0=f0)
                panels_top[k] = pflat
                token = pflat[:1]
                if U is not None:
                    updates[(k[0], k[1])] = U
            # ---- canonical remap (leaf) + top panels placement ----
            Lx = jnp.zeros(plan.dev_size, dtype=dtype)
            if dist["can_dst"].size:
                flat_pos = (dist["can_src_dev"] * dist["leaf_cells"]
                            + dist["can_src_pos"])
                vals = leaf_panels.reshape(-1)[flat_pos]
                Lx = Lx.at[dist["can_dst"]].set(vals, unique_indices=True)
            for (k, _, _) in top_plan:
                g = plan.groups[k[0]][k[1]]
                Lx = jax.lax.dynamic_update_slice(
                    Lx, panels_top[k], (g.panel_base,))
            return Lx

        fn = v3fn if v3fn is not None else jax.jit(full_fn)
        S._dist2_cache = (key, fn, leaf_args, cut_args, plan, part, dist,
                          mesh)
    _, fn, leaf_args, cut_args, plan, part, dist, mesh = S._dist2_cache
    import jax.numpy as jnp
    cdev = jax.device_put(
        sd._clow_data(A, S),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
    if dist.get("v3_args") is not None:
        Lx = fn(cdev, leaf_args, *dist["v3_args"])
    else:
        Lx = fn(cdev, leaf_args, cut_args)
    minor = S.n
    if not bool(jnp.isfinite(Lx).all()):
        minor = sd._find_minor(S, plan, Lx)
    F = SupernodalFactor(S=S, Lx=Lx, minor=minor, layout="device")
    F._dist_plan = plan
    F._dist2 = True
    return F


def dist_solve_v2(F, b: np.ndarray, config: Config = DEFAULT) -> np.ndarray:
    """Distributed solve over a dist_factorize_v2 factor.

    Mirrors the factorization's communication structure: each device runs
    the forward/backward sweeps over ITS OWN subtree groups under
    ``shard_map`` (panels gathered from the replicated canonical factor by
    per-device slot maps; leaf-to-leaf contribution routing is device-local
    by construction), the cut contributions combine with ONE ``psum``, the
    separator-crown (top) sweeps run as plain replicated ops, and the top
    solution broadcasts back into the leaf backward sweep with no further
    collectives (children SELECT rows from the replicated top state)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    # jax.shard_map (the 0.8+ home) drops check_rep; the experimental
    # entry point still accepts it and this code relies on it (manual psum
    # replication the checker cannot prove)
    from jax.experimental.shard_map import shard_map

    S = F.S
    assert getattr(F, "_dist2", False), "factor is not from dist_factorize_v2"
    (_, _, leaf_args, cut_args, plan, part, dist,
     mesh) = S._dist2_cache
    axes = tuple(mesh.axis_names)
    ndev = dist["ndev"]
    n = S.n
    b = np.asarray(b, dtype=np.float64)
    one_d = b.ndim == 1
    bb = b.reshape(-1, 1) if one_d else b
    nrhs = bb.shape[1]
    dtype = _dist_dtype(config)

    dist_groups = dist["dist_groups"]
    cut_sets = dist["cut_sets"]
    top_plan = dist["top_plan"]
    top_groups = dist["top_groups"]
    solve_leaf = dist["solve_leaf"]
    nleaf = len(dist_groups)

    cache = getattr(S, "_dist2_solve", None)
    if cache is None or cache[0] != (nrhs, str(dtype)):
        def shard_leading(x):
            return jax.device_put(x, NamedSharding(mesh, P(axes)))

        sargs = [(shard_leading(sl["col"]), shard_leading(sl["pan"]))
                 for sl in solve_leaf]

        # static helpers -------------------------------------------------
        def panels_of(Lxp, pan, Bd, R, C, ncarr):
            Pn = Lxp[pan].reshape(Bd, R, C)
            L11 = Pn[:, :C, :]
            ridx = jax.lax.broadcasted_iota(jnp.int32, (Bd, C, C), 1)
            cidx = jax.lax.broadcasted_iota(jnp.int32, (Bd, C, C), 2)
            ncb = ncarr.reshape(Bd, 1, 1)
            eye = jnp.where(ridx == cidx, jnp.asarray(1.0, dtype), 0.0)
            live = (ridx < ncb) & (cidx < ncb)
            return jnp.where(live, L11, eye), Pn[:, C:, :]

        def trisolve(L11, yc, transpose):
            return jax.lax.linalg.triangular_solve(
                L11, yc, left_side=True, lower=True, transpose_a=transpose)

        top_base = []
        off = 0
        for k in top_groups:
            g = plan.groups[k[0]][k[1]]
            top_base.append(off)
            off += g.B * g.R * nrhs
        wtop_cells = off
        # top-group column ids (for yc gather and final x placement)
        top_cols = []
        for k in top_groups:
            g = plan.groups[k[0]][k[1]]
            ci = np.full(g.B * g.C, n, dtype=np.int64)
            for bslot, sn in enumerate(g.snodes):
                f = int(S.super_first[sn])
                nc = int(S.super_first[sn + 1]) - f
                ci[bslot * g.C:bslot * g.C + nc] = np.arange(f, f + nc)
            top_cols.append(ci)

        def leaf_fwd(Lx, pbp, sa, la, ca):
            Lxp = jnp.concatenate([Lx.astype(dtype),
                                   jnp.zeros(1, dtype=dtype)])
            yfwd, V = [], {}
            for li, dg in enumerate(dist_groups):
                R, C, Bd = dg["R"], dg["C"], dg["Bd"]
                RU = R - C
                col, pan = sa[li][0][0], sa[li][1][0]
                ncarr = la[li][2][0]
                L11, L21 = panels_of(Lxp, pan, Bd, R, C, ncarr)
                w = jnp.zeros((Bd, R, nrhs), dtype=dtype)
                for (cli, RU_c, pmax, _, _, _), pa in zip(dg["pairs"],
                                                          la[li][3]):
                    src, dst, idx = pa[0][0], pa[1][0], pa[2][0]
                    Vc = V[cli][src]
                    iota = jax.lax.broadcasted_iota(
                        jnp.int32, (1, R, RU_c), 1)
                    Pm = (iota == idx[:, None, :]).astype(dtype)
                    w = w.at[dst].add(jnp.matmul(
                        Pm, Vc, preferred_element_type=dtype),
                        indices_are_sorted=True)
                yc = pbp[col].reshape(Bd, C, nrhs) - w[:, :C, :]
                xc = trisolve(L11, yc, False)
                yfwd.append(xc)
                if RU > 0:
                    V[li] = jnp.matmul(L21, xc,
                                       preferred_element_type=dtype) \
                        + w[:, C:, :]
                else:
                    V[li] = jnp.zeros((Bd, 1, nrhs), dtype=dtype)
            # cut contributions into the top-front w vector heap
            wtop = jnp.zeros(wtop_cells, dtype=dtype)
            for ci_, (cli, RU_c, pmax, R, tgi, _, _, _) in \
                    enumerate(cut_sets):
                srcs, dsts, idxs = ca[ci_][0][0], ca[ci_][1][0], \
                    ca[ci_][2][0]
                Vc = V[cli][srcs]
                iota = jax.lax.broadcasted_iota(jnp.int32, (1, R, RU_c), 1)
                Pm = (iota == idxs[:, None, :]).astype(dtype)
                placed = jnp.matmul(Pm, Vc, preferred_element_type=dtype)
                g = plan.groups[top_groups[tgi][0]][top_groups[tgi][1]]
                buf = jax.lax.dynamic_slice(
                    wtop, (top_base[tgi],),
                    (g.B * g.R * nrhs,)).reshape(g.B, g.R, nrhs)
                buf = buf.at[dsts].add(placed, indices_are_sorted=True)
                wtop = jax.lax.dynamic_update_slice(
                    wtop, buf.reshape(-1), (top_base[tgi],))
            wtop = jax.lax.psum(wtop, axes)
            return [y[None] for y in yfwd], wtop[None]

        def leaf_bwd(Lx, sa, la, ca, yf, fxtop):
            Lxp = jnp.concatenate([Lx.astype(dtype),
                                   jnp.zeros(1, dtype=dtype)])
            xb = {}
            # cut pulls: children select their below rows from the top fx
            for ci_, (cli, RU_c, pmax, R, tgi, _, _, _) in \
                    enumerate(cut_sets):
                srcs, dsts, idxs = ca[ci_][0][0], ca[ci_][1][0], \
                    ca[ci_][2][0]
                g = plan.groups[top_groups[tgi][0]][top_groups[tgi][1]]
                rows = jax.lax.dynamic_slice(
                    fxtop, (top_base[tgi],),
                    (g.B * g.R * nrhs,)).reshape(g.B, g.R, nrhs)[dsts]
                iota = jax.lax.broadcasted_iota(jnp.int32, (1, R, RU_c), 1)
                Pm = (iota == idxs[:, None, :]).astype(dtype)
                childx = jnp.matmul(jnp.swapaxes(Pm, 1, 2), rows,
                                    preferred_element_type=dtype)
                cdg = dist_groups[cli]
                buf = xb.get(cli)
                if buf is None:
                    buf = jnp.zeros((cdg["Bd"], max(cdg["R"] - cdg["C"], 1),
                                     nrhs), dtype=dtype)
                xb[cli] = buf.at[srcs].set(childx, unique_indices=True)
            xcs = []
            for li in range(nleaf - 1, -1, -1):
                dg = dist_groups[li]
                R, C, Bd = dg["R"], dg["C"], dg["Bd"]
                RU = R - C
                col, pan = sa[li][0][0], sa[li][1][0]
                ncarr = la[li][2][0]
                L11, L21 = panels_of(Lxp, pan, Bd, R, C, ncarr)
                yc = yf[li][0]
                below = xb.get(li)
                if below is None:
                    below = jnp.zeros((Bd, max(RU, 1), nrhs), dtype=dtype)
                if RU > 0:
                    yc = yc - jnp.matmul(jnp.swapaxes(L21, 1, 2),
                                         below[:, :RU],
                                         preferred_element_type=dtype)
                xc = trisolve(L11, yc, True)
                xcs.append(xc)
                # push down to leaf children
                fx = (jnp.concatenate([xc, below[:, :RU]], axis=1)
                      if RU > 0 else xc)
                for (cli, RU_c, pmax, _, _, _), pa in zip(dg["pairs"],
                                                          la[li][3]):
                    src, dst, idx = pa[0][0], pa[1][0], pa[2][0]
                    rows = fx[dst]
                    iota = jax.lax.broadcasted_iota(
                        jnp.int32, (1, R, RU_c), 1)
                    Pm = (iota == idx[:, None, :]).astype(dtype)
                    childx = jnp.matmul(jnp.swapaxes(Pm, 1, 2), rows,
                                        preferred_element_type=dtype)
                    cdg = dist_groups[cli]
                    buf = xb.get(cli)
                    if buf is None:
                        buf = jnp.zeros(
                            (cdg["Bd"], max(cdg["R"] - cdg["C"], 1), nrhs),
                            dtype=dtype)
                    xb[cli] = buf.at[src].set(childx, unique_indices=True)
            xcs = xcs[::-1]
            xcat = jnp.concatenate([x.reshape(-1, nrhs) for x in xcs],
                                   axis=0)
            return xcat[None]

        in_fwd = (P(), P(),
                  [(P(axes), P(axes)) for _ in sargs],
                  [tuple([P(axes), P(axes), P(axes),
                          [(P(axes),) * 3 for _ in la[3]]])
                   for la in leaf_args],
                  [(P(axes),) * 3 for _ in cut_args])
        out_fwd = ([P(axes) for _ in dist_groups], P(axes))
        in_bwd = (P(),
                  [(P(axes), P(axes)) for _ in sargs],
                  [tuple([P(axes), P(axes), P(axes),
                          [(P(axes),) * 3 for _ in la[3]]])
                   for la in leaf_args],
                  [(P(axes),) * 3 for _ in cut_args],
                  [P(axes) for _ in dist_groups], P())
        out_bwd = P(axes)

        # sargs/leaf_args/cut_args ride as ARGUMENTS, not closure constants:
        # closing over arrays sharded across the global mesh is illegal in
        # real multi-process execution ("Closing over jax.Array that spans
        # non-addressable devices") — the factor fn already does the same
        def solve_fn(Lx, pbp, sargs, leaf_args, cut_args):
            pbp = pbp.astype(dtype)
            yf, wtop_r = shard_map(leaf_fwd, mesh=mesh, in_specs=in_fwd,
                                   out_specs=out_fwd, check_rep=False)(
                Lx, pbp, sargs, leaf_args, cut_args)
            wtop = wtop_r[0]
            Lxp = jnp.concatenate([Lx.astype(dtype),
                                   jnp.zeros(1, dtype=dtype)])
            # ---- top forward (replicated) ----
            up = {}
            tyf = {}
            for ti, (k, keep_pairs, keep_arrays) in enumerate(top_plan):
                g = plan.groups[k[0]][k[1]]
                B, R, C = g.B, g.R, g.C
                RU = R - C
                Pn = jax.lax.dynamic_slice_in_dim(
                    Lxp, g.panel_base, B * R * C).reshape(B, R, C)
                L11 = Pn[:, :C, :]
                ridx = jax.lax.broadcasted_iota(jnp.int32, (B, C, C), 1)
                cidx = jax.lax.broadcasted_iota(jnp.int32, (B, C, C), 2)
                ncb = jnp.asarray(g.nc).reshape(B, 1, 1)
                eye = jnp.where(ridx == cidx, jnp.asarray(1.0, dtype), 0.0)
                live = (ridx < ncb) & (cidx < ncb)
                L11 = jnp.where(live, L11, eye)
                L21 = Pn[:, C:, :]
                w = jax.lax.dynamic_slice(
                    wtop, (top_base[ti],),
                    (B * R * nrhs,)).reshape(B, R, nrhs)
                for pc, (src, dst, idx) in zip(keep_pairs, keep_arrays):
                    cti = top_groups.index((pc.src_level, pc.src_gi))
                    Vc = up[cti][src]
                    iota = jax.lax.broadcasted_iota(
                        jnp.int32, (1, R, pc.RU_c), 1)
                    Pm = (iota == idx[:, None, :]).astype(dtype)
                    w = w.at[dst].add(jnp.matmul(
                        Pm, Vc, preferred_element_type=dtype),
                        indices_are_sorted=True)
                yc = pbp[jnp.asarray(top_cols[ti])].reshape(B, C, nrhs) \
                    - w[:, :C, :]
                xc = trisolve_top(L11, yc, False)
                tyf[ti] = (xc, L11, L21, w)
                up[ti] = (jnp.matmul(L21, xc, preferred_element_type=dtype)
                          + w[:, C:, :]) if RU > 0 else \
                    jnp.zeros((B, 1, nrhs), dtype=dtype)
            # ---- top backward (replicated) ----
            fxtop = jnp.zeros(wtop_cells, dtype=dtype)
            txb = {}
            txc = {}
            for ti in range(len(top_plan) - 1, -1, -1):
                k, keep_pairs, keep_arrays = top_plan[ti]
                g = plan.groups[k[0]][k[1]]
                B, R, C = g.B, g.R, g.C
                RU = R - C
                xc, L11, L21, _ = tyf[ti]
                below = txb.get(ti)
                if below is None:
                    below = jnp.zeros((B, max(RU, 1), nrhs), dtype=dtype)
                yc = xc
                if RU > 0:
                    yc = yc - jnp.matmul(jnp.swapaxes(L21, 1, 2),
                                         below[:, :RU],
                                         preferred_element_type=dtype)
                xs = trisolve_top(L11, yc, True)
                txc[ti] = xs
                fx = (jnp.concatenate([xs, below[:, :RU]], axis=1)
                      if RU > 0 else xs)
                fxtop = jax.lax.dynamic_update_slice(
                    fxtop, fx.reshape(-1), (top_base[ti],))
                for pc, (src, dst, idx) in zip(keep_pairs, keep_arrays):
                    cti = top_groups.index((pc.src_level, pc.src_gi))
                    rows = fx[dst]
                    iota = jax.lax.broadcasted_iota(
                        jnp.int32, (1, R, pc.RU_c), 1)
                    Pm = (iota == idx[:, None, :]).astype(dtype)
                    childx = jnp.matmul(jnp.swapaxes(Pm, 1, 2), rows,
                                        preferred_element_type=dtype)
                    cg = plan.groups[pc.src_level][pc.src_gi]
                    buf = txb.get(cti)
                    if buf is None:
                        buf = jnp.zeros(
                            (cg.B, max(cg.R - cg.C, 1), nrhs), dtype=dtype)
                    txb[cti] = buf.at[src].set(childx, unique_indices=True)
            # ---- leaf backward (shard_map) ----
            xcat = shard_map(leaf_bwd, mesh=mesh, in_specs=in_bwd,
                             out_specs=out_bwd, check_rep=False)(
                Lx, sargs, leaf_args, cut_args, yf, fxtop)
            # ---- assemble x ----
            x = jnp.zeros((n + 1, nrhs), dtype=dtype)
            flat = xcat.reshape(-1, nrhs)
            pos = (jnp.asarray(dist["xmap_dev"]) * dist["x_cells_dev"]
                   + jnp.asarray(dist["xmap_pos"]))
            x = x.at[jnp.asarray(dist["xmap_dst"])].set(flat[pos])
            for ti, (k, _, _) in enumerate(top_plan):
                g = plan.groups[k[0]][k[1]]
                x = x.at[jnp.asarray(top_cols[ti])].set(
                    txc[ti].reshape(g.B * g.C, nrhs))
            return x[:n]

        def trisolve_top(L11, yc, transpose):
            import jax as _j
            return _j.lax.linalg.triangular_solve(
                L11, yc, left_side=True, lower=True, transpose_a=transpose)

        jfn = jax.jit(solve_fn)
        S._dist2_solve = ((nrhs, str(dtype)), jfn, sargs)
    _, jfn, sargs = S._dist2_solve
    pbp = np.concatenate([bb[S.perm], np.zeros((1, nrhs))], axis=0)
    yz = np.asarray(jfn(F.Lx, jnp.asarray(pbp), sargs, leaf_args, cut_args),
                    dtype=np.float64)
    x = np.empty_like(yz)
    x[S.perm] = yz
    return x[:, 0] if one_d else x
