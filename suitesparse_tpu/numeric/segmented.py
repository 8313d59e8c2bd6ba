"""Memory-bounded segmented execution for the QR-plan pipelines.

The supernodal Cholesky path grew this discipline first
(``supernodal_device._run_plan_segmented`` — SPQR stack-plan analog,
VERDICT r1 item 1); this module generalizes it to the QRPlan-shaped
pipelines (multifrontal QR and the unsymmetric multifrontal LU, which
share ``QRGroupPlan`` groups): the group schedule splits into segments
whose estimated working set stays under a budget, each segment is its own
jitted program, contribution panels that cross a segment boundary are
carried (and donated) between programs, and index arrays ride as
device-resident jit ARGUMENTS (baked HLO constants stall the remote
compiler at audikw-class sizes).
"""

from __future__ import annotations

import os

__all__ = ["estimate_qr_group_cells", "run_qrplan_segmented",
           "qrplan_total_cells"]


def estimate_qr_group_cells(g) -> int:
    """Working-set estimate (cells) for one QRGroupPlan step."""
    cells = 2 * g.B * g.M * g.N + g.B * g.K * g.N
    for (dc, gc, Kc, Nc, psrc, pdst, rowmap, colmap) in g.pairs:
        npi = len(psrc)
        cells += npi * (g.M * Kc + g.M * Nc + Nc * g.N + g.M * g.N)
    return cells


def qrplan_total_cells(plan) -> int:
    return sum(estimate_qr_group_cells(g)
               for gl in plan.groups for g in gl)


def _schedule(plan, budget_cells):
    segs, cur, cur_cells = [], [], 0
    for d, glist in enumerate(plan.groups):
        for gi, g in enumerate(glist):
            cells = estimate_qr_group_cells(g)
            if cur and cur_cells + cells > budget_cells:
                segs.append(cur)
                cur, cur_cells = [], 0
            cur.append((d, gi))
            cur_cells += cells
    if cur:
        segs.append(cur)
    return segs


def _consumers(plan):
    order, last, pos = {}, {}, 0
    for d, glist in enumerate(plan.groups):
        for gi, g in enumerate(glist):
            order[(d, gi)] = pos
            for (dc, gc, *_rest) in g.pairs:
                last[(dc, gc)] = pos
            pos += 1
    return order, last


def run_qrplan_segmented(plan, holder, src, dtype, precision, body,
                         budget_cells: int, cache_attr: str):
    """Run a QR-shaped plan as bounded segments.

    ``body(g, ix, src, updates, key)`` computes one group given traced
    index arrays ``ix`` = (asrc, adst, pair_arrays) and returns
    (flat_panel, update_or_None). Compiled segment functions are cached on
    ``holder`` under ``cache_attr``."""
    import jax
    import jax.numpy as jnp

    segs = _schedule(plan, budget_cells)
    order, last_consumer = _consumers(plan)
    # key must pin the PLAN identity: build_qr_plan rebuilds on nrhs change
    # and stale segment programs would gather the new src buffer with old
    # indices (silent wrong answers — review finding r2)
    key = (id(plan), plan.nrhs, str(dtype), str(precision), budget_cells)
    cache = getattr(holder, cache_attr, None)
    if cache is None or cache[0] != key:
        fns = []
        for seg in segs:
            first_pos = order[seg[0]]
            last_pos = order[seg[-1]]
            in_keys = sorted(k for k, lp in last_consumer.items()
                             if order[k] < first_pos and lp >= first_pos)
            seg_args = []
            for (d, gi) in seg:
                g = plan.groups[d][gi]
                seg_args.append((g.asrc, g.adst,
                                 [(psrc, pdst, rowmap, colmap)
                                  for (_dc, _gc, _kc, _nc, psrc, pdst,
                                       rowmap, colmap) in g.pairs]))

            def seg_fn(sd, upd_in, idx_list, _seg=seg, _last=last_pos):
                updates = dict(upd_in)
                panels = []
                for (d, gi), ix in zip(_seg, idx_list):
                    g = plan.groups[d][gi]
                    pflat, U = body(g, ix, sd, updates, (d, gi))
                    panels.append(pflat)
                    if U is not None:
                        updates[(d, gi)] = U
                out = {k2: v for k2, v in updates.items()
                       if last_consumer.get(k2, -1) > _last}
                pcat = (jnp.concatenate(panels) if panels
                        else jnp.zeros(0, dtype=dtype))
                return pcat, out

            dev_args = jax.device_put(seg_args)
            fns.append((jax.jit(seg_fn, donate_argnums=(1,)), in_keys,
                        dev_args))
        setattr(holder, cache_attr, (key, fns))
    _, fns = getattr(holder, cache_attr)

    upd_state = {}
    panel_parts = []
    import warnings as _w
    with _w.catch_warnings():
        _w.filterwarnings("ignore", message=".*donated buffers.*")
        for (fn, in_keys, dev_args) in fns:
            upd_in = {k: upd_state.pop(k) for k in in_keys}
            pcat, upd_out = fn(src, upd_in, dev_args)
            panel_parts.append(pcat)
            upd_state.update(upd_out)
    import jax.numpy as jnp
    return jnp.concatenate(panel_parts) if panel_parts else \
        jnp.zeros(0, dtype=dtype)
