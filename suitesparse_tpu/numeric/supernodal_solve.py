"""Level-scheduled supernodal triangular solves on device.

Reference analog: ``CHOLMOD/Supernodal/cholmod_super_solve.c`` /
``t_cholmod_super_solve.c:89-173`` (per-supernode dtrsv/dtrsm + dgemv/dgemm) —
re-designed for TPU as level-batched dense ops: all supernodes of one
elimination-tree level solve simultaneously. Multi-RHS is a free static
dimension.

Two formulations:

  * MULTIFRONTAL solve (the fast path, "device" layout): contributions move
    strictly child→parent as per-group vectors routed by the SAME pair/idx
    plans as the factorization's extend-add — one-hot placement matvecs up,
    one-hot selection matmuls down, and ONE final gather assembles x. No
    global scatter at all (measured: the naive formulation spent >75% of
    solve time in elementwise y scatters at ~55 ns/element).
  * scatter-based level solve (the "px"-layout fallback): per level,
    y[cols_s] = L11^{-1} y[cols_s]; y[rows_s] -= L21 @ y[cols_s], then the
    transposed sweep backward.

Both use the Pallas batched trisolve kernel where shapes favor it.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..config import Config, DEFAULT
from ..symbolic.supernodes import SupernodalSymbolic
from .supernodal import SupernodalFactor

__all__ = ["build_solve_plan", "solve_device", "solve_dispatch",
           "solve_refined"]


def _mode_policy(env_var: str, nrhs: int) -> bool:
    """Shared env policy for the solve fast-path modes: "0" off, "1" on,
    "auto" (default) = on TPU. Round-4 A/B (AB_RESULTS.jsonl solve_both /
    place_inv vs base, v5e, n=125k): inv+coarse wins at BOTH ends —
    1 RHS 14.7 -> 9.9/10.1 ms, 64 RHS 20.9 -> 16.5 ms, residual
    3.2e-7 vs 2.8e-7 (factor-limited either way) — so auto no longer
    bounds nrhs."""
    import os

    import jax

    mode = os.environ.get(env_var, "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    return jax.default_backend() == "tpu"


def _use_inv_solve(nrhs: int) -> bool:
    """Inverse-panel solve policy (SSTPU_SOLVE_INV=auto|1|0).

    With W = L11^{-1} precomputed per group (one batched C-RHS trisolve at
    first solve, cached on the factor), every sequential in-sweep trisolve
    becomes ONE MXU matmul — the same partitioned-inverse trick GPU trisolve
    libraries use, applied at supernode-group granularity. Targets the
    latency-bound single-RHS case; refinement restores fp64-class residuals
    as usual."""
    return _mode_policy("SSTPU_SOLVE_INV", nrhs)


def _use_w2(nrhs: int) -> bool:
    """Stacked inverse-panel policy (SSTPU_SOLVE_W2=auto|1|0; default
    auto = on-TPU — the round-5 A/B: w2+fine 6.75 ms vs the r4 default
    inv+coarse 9.90 ms at n=125k 1 RHS, 18.6 vs 26.7 ms at 64 RHS with
    the precision fix, residual unchanged).

    With W = L11^{-1}, precompute the STACKED panel W2 = [W ; L21 @ W]
    (R x C) once per factor. Then each solve group needs exactly ONE
    batched matvec per sweep with no intra-group dependency chain:

        forward   [xc ; v] = W2 @ yc          (xc = W yc, v = L21 xc)
        backward  xc = W2^T @ [yf ; -xb]      (= W^T yf - (L21 W)^T xb)

    — halving the sequential ops of the inverse-panel mode and making
    panel bytes per sweep exactly R*C (the factor's L21 is no longer
    read during sweeps). Reference analog: the dtrsv+dgemv pair per
    supernode in t_cholmod_super_solve.c:89-173 collapsed to one gemv."""
    return _mode_policy("SSTPU_SOLVE_W2", nrhs)


def _use_pmv(B: int, R: int, C: int, nrhs: int, itemsize: int = 4) -> bool:
    """Streaming panel-matvec kernel policy (SSTPU_SOLVE_PMV=auto|1|0,
    default 0 until the TPU A/B) for big-front w2 groups: XLA's batched
    matvec puts N=1 on the MXU (127/128 lanes idle); the pallas kernel
    (kernels/pmatvec.py) streams the panel with a sublane reduction in
    BOTH sweep directions (the stacked panel is stored in both
    orientations — 2x solve-copy memory, same bytes per sweep).  Only
    where the (8, 128) tile padding stays small and the batch is tiny
    (bmv handles the big-batch leaf end)."""
    import os

    from ..kernels.pmatvec import pmv_fits, pmv_pad

    mode = os.environ.get("SSTPU_SOLVE_PMV", "0")
    if mode == "0" or (mode != "1" and not _mode_policy("SSTPU_SOLVE_PMV",
                                                        nrhs)):
        return False
    if B > 32 or nrhs > 8 or B * R * C < int(
            os.environ.get("SSTPU_PMV_MIN_CELLS", str(1 << 20))):
        return False
    Kp, Np = pmv_pad(R, C, itemsize)
    if Kp * Np > 1.35 * R * C:
        return False
    Kp2, Np2 = pmv_pad(C, R, itemsize)
    if Kp2 * Np2 > 1.35 * R * C:
        return False
    return pmv_fits(R, C, nrhs, itemsize) and pmv_fits(C, R, nrhs, itemsize)


def _use_bmv(B: int, C: int, RU: int, nrhs: int, itemsize: int = 4,
             R: int | None = None) -> bool:
    """Lane-batched matvec kernel policy (SSTPU_SOLVE_BMV=auto|1|0) for
    one solve group on the inverse-panel path: the kernel stores panels
    lanes=batch so small-C groups stream at full HBM rate instead of
    XLA's ~37 GB/s lane-padded batched matvec (see kernels/bmatvec.py).
    Worth it when the batch fills lanes (B >= SSTPU_BMV_BMIN) and the
    RHS count is in the latency regime. With ``R`` (the w2 stacked-panel
    mode) feasibility is checked on the single (R, C) panel. NOTE:
    opt-in (default '0') — validated correct on real TPU this round;
    the recorded A/B verdict lives in AB_RESULTS.jsonl."""
    import os

    from ..kernels.bmatvec import bmv_fits

    mode = os.environ.get("SSTPU_SOLVE_BMV", "0")
    if mode == "0" or (mode != "1" and not _mode_policy("SSTPU_SOLVE_BMV",
                                                        nrhs)):
        return False
    if B < int(os.environ.get("SSTPU_BMV_BMIN", "32")) or nrhs > 8:
        return False
    if R is not None:
        return bmv_fits(R, C, B, nrhs, itemsize)
    return bmv_fits(C, C, B, nrhs, itemsize) and (
        RU == 0 or bmv_fits(RU, C, B, nrhs, itemsize))


def _to_lanes(x, Bp: int, rows_pad: int | None = None):
    """(B, R, NR) -> (rows_pad or R, NR, Bp) lane-major, zero padded."""
    import jax.numpy as jnp

    B, R, NR = x.shape
    xt = jnp.transpose(x, (1, 2, 0))
    return jnp.pad(xt, (((0, (rows_pad or R) - R), (0, 0), (0, Bp - B))))


def _from_lanes(zt, B: int, R: int):
    """(Rpad, NR, Bp) -> (B, R, NR)."""
    import jax.numpy as jnp

    return jnp.transpose(zt[:R, :, :B], (2, 0, 1))


def build_winv(splan: "SolvePlan", Lx, dtype, nrhs: int = 1,
               w2: bool = False):
    """W[d][gi] = L11^{-1} for every solve group (identity on padded
    rows/cols, so padded columns pass through exactly like the trisolve).

    Per group the entry is a 1-tuple ``(W,)`` with W (B, C, C) for the
    XLA matmul path, or — when the lane-batched kernel is eligible
    (_use_bmv) — a 2-tuple ``(Wt, L21t)`` of lane-major panels padded
    per kernels/bmatvec.bmv_pad (the same stored panels serve both
    sweeps: forward applies M, backward M^T). With ``w2`` (see _use_w2)
    the entry is a dict ``{"w2": W2}`` holding the stacked panel
    W2 = [W ; L21 @ W] (B, R, C), or ``{"w2t": W2t, "bb": bb}`` with the
    lane-major stacked panel when the bmv kernel is eligible.

    One jitted batched triangular solve per group; runs once per factor.
    The compiled builder is cached on the SolvePlan so the factor-many
    contract pays tracing/compile once."""
    import jax
    import jax.numpy as jnp

    from ..kernels.bmatvec import bmv_group_geom

    cached = getattr(splan, "_winv_builders", None)
    if cached is None:
        cached = {}
        splan._winv_builders = cached
    isz = jnp.dtype(dtype).itemsize
    if w2:
        bmv = tuple(
            "pmv" if _use_pmv(sg.B, sg.R, sg.C, nrhs, isz)
            else _use_bmv(sg.B, sg.C, sg.R - sg.C, nrhs, isz, R=sg.R)
            for sglist in splan.groups for sg in sglist)
    else:
        bmv = tuple(_use_bmv(sg.B, sg.C, sg.R - sg.C, nrhs, isz)
                    for sglist in splan.groups for sg in sglist)
    build = cached.get((str(dtype), bmv, w2))
    if build is None:
        @jax.jit
        def build(lx):
            Lxp = jnp.concatenate([lx.astype(dtype),
                                   jnp.zeros(1, dtype=dtype)])
            out = []
            k = iter(bmv)
            for sglist in splan.groups:
                row = []
                for sg in sglist:
                    L11, L21 = _group_panels(Lxp, sg, dtype)
                    eye = jnp.broadcast_to(jnp.eye(sg.C, dtype=dtype),
                                           (sg.B, sg.C, sg.C))
                    W = jax.lax.linalg.triangular_solve(
                        L11, eye, left_side=True, lower=True)
                    use_bmv = next(k)
                    B, C = sg.B, sg.C
                    RU = sg.R - C
                    if w2:
                        if RU > 0:
                            # one-time build: HIGHEST unconditionally (the
                            # TPU default is ONE bf16 pass — 2^-8 error
                            # baked into W2 poisons every solve)
                            W2 = jnp.concatenate(
                                [W, jnp.matmul(
                                    L21, W, preferred_element_type=dtype,
                                    precision=jax.lax.Precision.HIGHEST)],
                                axis=1)
                        else:
                            W2 = W
                        if use_bmv == "pmv":
                            from ..kernels.pmatvec import pmv_pad
                            R_ = sg.R
                            Kp, Np = pmv_pad(R_, C, isz)
                            Kp2, Np2 = pmv_pad(C, R_, isz)
                            # both orientations: fwd applies W2 via
                            # (W2^T)^T, bwd applies W2^T via W2
                            W2b = jnp.pad(W2, ((0, 0), (0, Kp - R_),
                                               (0, Np - C)))
                            W2f = jnp.pad(jnp.swapaxes(W2, 1, 2),
                                          ((0, 0), (0, Kp2 - C),
                                           (0, Np2 - R_)))
                            row.append({"w2f": W2f, "w2b": W2b})
                        elif not use_bmv:
                            row.append({"w2": W2})
                        else:
                            pads, Bp, bb = bmv_group_geom(
                                ((sg.R, C),), B, isz)
                            row.append({"w2t": _to_lanes(
                                W2, Bp, rows_pad=pads[0])})
                        continue
                    if not use_bmv:
                        row.append((W,))
                        continue
                    pads, Bp, _bb = bmv_group_geom(
                        ((C, C), (RU, C)) if RU > 0 else ((C, C),), B, isz)
                    Wt = _to_lanes(W, Bp, rows_pad=pads[0])
                    if RU > 0:
                        L21t = _to_lanes(L21, Bp, rows_pad=pads[1])
                    else:
                        L21t = jnp.zeros((8, C, Bp), dtype)
                    row.append((Wt, L21t))
                out.append(row)
            return out
        cached[(str(dtype), bmv, w2)] = build

    return build(Lx)


def _group_panels(Lxp, g: "SolveGroup", dtype):
    """(L11, L21) of one device-layout solve group; identity-padded L11."""
    import jax
    import jax.numpy as jnp

    sl = jax.lax.dynamic_slice_in_dim(Lxp, g.panel_base, g.B * g.R * g.C)
    # barrier: XLA's backend otherwise folds the per-group reshape-of-slice
    # pattern into ONE whole-factor (X, R, C) reshape whose lane-padded
    # tiling (C -> 128) cost 16x HBM — a 38 GB compile-time OOM at n=512k
    (sl,) = jax.lax.optimization_barrier((sl,))
    P = sl.reshape(g.B, g.R, g.C)
    L11 = P[:, :g.C, :]
    ridx = jax.lax.broadcasted_iota(jnp.int32, (g.B, g.C, g.C), 1)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (g.B, g.C, g.C), 2)
    ncb = jnp.asarray(g.nc).reshape(g.B, 1, 1)
    eye = jnp.where(ridx == cidx, jnp.asarray(1.0, dtype), 0.0)
    live = (ridx < ncb) & (cidx < ncb)
    return jnp.where(live, L11, eye), P[:, g.C:, :]


# pow4 rungs for the COARSE solve plan: ~3.6x fewer (level, bucket) steps
# than the factor ladder at ~2x panel-gather traffic (n=125k: 124 -> 34
# groups, 110M -> 220M ladder cells before group-max tightening) — the
# 1-RHS solve is sequential-step-latency bound, not bandwidth bound
_SOLVE_R_LADDER = [16, 64, 256, 1024, 4096, 8192]
_SOLVE_C_LADDER = [16, 64, 256, 512]
# pow2 middle ladder (SSTPU_SOLVE_LADDER=pow2): ~2x fewer groups than
# the fine plan at ~1.2-1.4x panel bytes — between fine (124 groups /
# 335 MB at n=125k) and the pow4 ladder above (34 groups / 440 MB)
_SOLVE_R_POW2 = [16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192]
_SOLVE_C_POW2 = [16, 32, 64, 128, 256, 512]


def _use_coarse_solve(nrhs: int) -> bool:
    """Coarse solve-plan policy (SSTPU_SOLVE_COARSE=auto|1|0; default
    now OFF): pow4 re-bucketing cuts sequential steps ~3.6x at ~2x
    panel-gather traffic — it won round 4's inv-mode A/B, but with the
    stacked w2 panels the FINE plan wins at both ends (6.75 vs 7.57 ms
    at 1 RHS, 18.6 vs 26.7 at 64; the pow2 middle ladder was also
    measured and lost, 7.35 — byte inflation beats thunk savings)."""
    import os

    if os.environ.get("SSTPU_SOLVE_COARSE", "0") == "0":
        return False
    return _mode_policy("SSTPU_SOLVE_COARSE", nrhs)


def _coarse_plan(S: SupernodalSymbolic):
    """Solve-only re-bucketed plan (cached on the symbolic).
    SSTPU_SOLVE_LADDER=pow2 picks the middle ladder (fewer sequential
    thunks than fine, far less padding than the pow4 default)."""
    import os

    pow2 = os.environ.get("SSTPU_SOLVE_LADDER", "pow4") == "pow2"
    attr = "_solve_pow2_plan" if pow2 else "_solve_coarse_plan"
    plan2 = getattr(S, attr, None)
    if plan2 is None:
        from .supernodal_device import build_plan
        C_low = getattr(S, "_clow_cache", None)
        # the plan builder only reads C_low's PATTERN-dependent scatter for
        # asrc/adst (unused by the solve) — reuse any cached one or rebuild
        if C_low is None:
            raise RuntimeError("coarse solve plan needs C_low (see caller)")
        plan2 = build_plan(
            S, C_low,
            ladders=((_SOLVE_R_POW2, _SOLVE_C_POW2) if pow2
                     else (_SOLVE_R_LADDER, _SOLVE_C_LADDER)))
        setattr(S, attr, plan2)
    return plan2


def _snode_panels(S: SupernodalSymbolic, plan):
    """Per-supernode (flat panel base, R, C) for a device plan."""
    base = np.zeros(S.nsuper, dtype=np.int64)
    Rs = np.zeros(S.nsuper, dtype=np.int64)
    Cs = np.zeros(S.nsuper, dtype=np.int64)
    for gl in plan.groups:
        for g in gl:
            for b, s in enumerate(g.snodes):
                base[s] = g.panel_base + b * g.R * g.C
                Rs[s] = g.R
                Cs[s] = g.C
    return base, Rs, Cs


def relayout_map(S: SupernodalSymbolic, plan1, plan2) -> np.ndarray:
    """int32 gather map: Lx2[i] = Lx1[map[i]] (sentinel plan1.dev_size for
    plan2 padding, which the padded source resolves to 0).

    Device panels are GAPPED row-major (R, C): supernode s's pivot rows sit
    at panel rows [0, nc) and its below rows at [C, C + nr - nc) — the gap
    [nc, C) is the dead-pivot padding region, which must stay zero."""
    b1, R1, C1 = _snode_panels(S, plan1)
    b2, R2, C2 = _snode_panels(S, plan2)
    m = np.full(plan2.dev_size, plan1.dev_size, dtype=np.int64)
    for s in range(S.nsuper):
        nr = len(S.rows[s])
        nc = int(S.super_first[s + 1] - S.super_first[s])
        r1 = np.concatenate([np.arange(nc), C1[s] + np.arange(nr - nc)])
        r2 = np.concatenate([np.arange(nc), C2[s] + np.arange(nr - nc)])
        c = np.arange(nc, dtype=np.int64)[None, :]
        src = b1[s] + r1[:, None] * C1[s] + c
        dst = b2[s] + r2[:, None] * C2[s] + c
        m[dst.ravel()] = src.ravel()
    assert m.max() <= np.iinfo(np.int32).max
    return m.astype(np.int32)


def relayout_fn(S: SupernodalSymbolic, plan1, plan2):
    """Device-side relayout Lx1 -> Lx2 with STATIC slices only (no index-map
    H2D: a dev2-sized gather map is ~400 MB at n=125k — 10+ minutes through
    the axon relay's 0.6 MB/s H2D path).

    For each (source group g1 -> target group g2) class, slots share
    (R1, C1) and (R2, C2); with the GAPPED row convention (pivot rows at
    [0, nc), zeros at [nc, C), below rows at [C, C + nr - nc)) the row
    transform is shape-static: rows [0, C1) keep (gap zeros included, then
    zero-extended to C2 >= C1... or truncated when C2 < C1, legal because
    rows [min(C1,C2), C1) are gap zeros: nc <= min(C1, C2) for every slot
    by construction), and rows [C1, R1) move to [C2, ...). Only tiny slot
    index vectors enter the program as constants."""
    import jax
    import jax.numpy as jnp

    loc1 = {}
    for d, gl in enumerate(plan1.groups):
        for gi, g in enumerate(gl):
            for b, s in enumerate(g.snodes):
                loc1[int(s)] = (d, gi, b)
    # per plan2 group: class map (d1, gi1) -> (src_slots, dst_slots)
    classes = []
    for gl in plan2.groups:
        for g2 in gl:
            cl = {}
            for b2, s in enumerate(g2.snodes):
                d1, gi1, b1 = loc1[int(s)]
                cl.setdefault((d1, gi1), ([], []))
                cl[(d1, gi1)][0].append(b1)
                cl[(d1, gi1)][1].append(b2)
            classes.append((g2, sorted(cl.items())))

    g1_meta = {}
    for d, gl in enumerate(plan1.groups):
        for gi, g in enumerate(gl):
            g1_meta[(d, gi)] = g

    def fn(lx):
        out = []
        for g2, cl in classes:
            B2, R2, C2 = g2.B, g2.R, g2.C
            buf = jnp.zeros((B2, R2, C2), dtype=lx.dtype)
            for (k1, (sb, db)) in cl:
                g1 = g1_meta[k1]
                R1, C1 = g1.R, g1.C
                src = jax.lax.dynamic_slice_in_dim(
                    lx, g1.panel_base, g1.B * R1 * C1)
                (src,) = jax.lax.optimization_barrier((src,))
                P = src.reshape(g1.B, R1, C1)[np.asarray(sb)]
                top = P[:, :min(C1, C2), :]
                below = P[:, C1:, :]
                pad_mid = C2 - top.shape[1]
                pad_bot = R2 - C2 - below.shape[1]
                parts = [top]
                if pad_mid:
                    parts.append(jnp.zeros((P.shape[0], pad_mid, C1),
                                           dtype=lx.dtype))
                parts.append(below)
                if pad_bot:
                    parts.append(jnp.zeros((P.shape[0], pad_bot, C1),
                                           dtype=lx.dtype))
                blk = jnp.concatenate(parts, axis=1)
                if C2 > C1:
                    blk = jnp.pad(blk, ((0, 0), (0, 0), (0, C2 - C1)))
                elif C2 < C1:
                    blk = blk[:, :, :C2]
                buf = buf.at[np.asarray(db)].set(blk, unique_indices=True)
            out.append(buf.reshape(-1))
        return jnp.concatenate(out)

    return fn


def _use_step_kernel(dtype, B: int, C: int, RU: int, nrhs: int) -> bool:
    """Fused solve-step kernel policy (mirrors _use_potrf_kernel)."""
    import os

    import jax
    import jax.numpy as jnp

    mode = os.environ.get("SSTPU_PALLAS", "auto")
    if mode == "0":
        return False
    from ..kernels.solve_step import step_fits
    min_b = int(os.environ.get("SSTPU_STEP_MINB", "8"))
    good = (B >= min_b and C <= 96 and dtype == jnp.float32
            and step_fits(C, RU, nrhs))
    if mode == "1":
        return good
    return good and jax.default_backend() == "tpu"


@dataclasses.dataclass
class SolveGroup:
    R: int
    C: int
    B: int
    panel_base: int         # device layout: Lx[panel_base : +B*R*C]
    panel_src: np.ndarray   # px layout: gather map (pad -> lnz), else empty
    col_idx: np.ndarray     # [B*C] global column ids (pad -> n)
    below_idx: np.ndarray   # [B*RU] global below-row ids (pad -> n)
    nc: np.ndarray


@dataclasses.dataclass
class SolvePlan:
    groups: list            # groups[level] = [SolveGroup, ...]
    n: int
    lx_size: int
    layout: str


def build_solve_plan(S: SupernodalSymbolic, layout: str,
                     plan=None) -> SolvePlan:
    from .supernodal_device import _pad_to, _R_LADDER, _C_LADDER, _ranges

    if layout == "device":
        if plan is None:
            plan = S._device_plan
        level_groups = [[(g.R, g.C, list(g.snodes), g.panel_base)
                         for g in glist] for glist in plan.groups]
        lx_size = plan.dev_size
    else:
        level_groups = []
        for level_nodes in S.levels:
            buckets: dict = {}
            for s in level_nodes:
                nr, nc = S.nrows(s), S.ncols(s)
                key = (_pad_to(nr - nc, _R_LADDER) + _pad_to(nc, _C_LADDER),
                       _pad_to(nc, _C_LADDER))
                buckets.setdefault(key, []).append(int(s))
            level_groups.append([(R, C, ss, -1)
                                 for (R, C), ss in sorted(buckets.items())])
        lx_size = S.lnz

    groups_all = []
    for placed in level_groups:
        glist = []
        for (R, C, ss, pbase) in placed:
            B = len(ss)
            RU = R - C
            cidx = np.full(B * C, S.n, dtype=np.int64)
            bidx = np.full(B * max(RU, 1), S.n, dtype=np.int64)
            nc_arr = np.zeros(B, dtype=np.int32)
            psrc = (np.full(B * R * C, lx_size, dtype=np.int64)
                    if layout == "px" else np.empty(0, dtype=np.int64))
            for b, s in enumerate(ss):
                nr, nc = S.nrows(s), S.ncols(s)
                f = int(S.super_first[s])
                nc_arr[b] = nc
                cidx[b * C:b * C + nc] = np.arange(f, f + nc)
                if nr > nc:
                    bidx[b * max(RU, 1):b * max(RU, 1) + (nr - nc)] = \
                        S.rows[s][nc:]
                if layout == "px":
                    kk = np.repeat(np.arange(nc, dtype=np.int64),
                                   nr - np.arange(nc))
                    rp = _ranges(np.arange(nc, dtype=np.int64),
                                 np.full(nc, nr, np.int64))
                    rloc = np.where(rp < nc, rp, C + (rp - nc))
                    psrc[b * R * C + rloc * C + kk] = S.Lpx[s] + kk * nr + rp
            glist.append(SolveGroup(R=R, C=C, B=B, panel_base=pbase,
                                    panel_src=psrc, col_idx=cidx,
                                    below_idx=bidx, nc=nc_arr))
        groups_all.append(glist)
    return SolvePlan(groups=groups_all, n=S.n, lx_size=lx_size, layout=layout)


def _solve_fn(plan: SolvePlan, Lx, b, dtype):
    """y = L' \\ (L \\ b) for b [n, nrhs]; jit-friendly."""
    import jax
    import jax.numpy as jnp

    n = plan.n
    nrhs = b.shape[1]
    Lxp = jnp.concatenate([Lx.astype(dtype), jnp.zeros(1, dtype=dtype)])
    y = jnp.concatenate([b.astype(dtype), jnp.zeros((1, nrhs), dtype=dtype)])

    def panels_of(g: SolveGroup):
        if plan.layout == "device":
            return _group_panels(Lxp, g, dtype)
        P = Lxp[g.panel_src].reshape(g.B, g.R, g.C)
        L11 = P[:, :g.C, :]
        ridx = jax.lax.broadcasted_iota(jnp.int32, (g.B, g.C, g.C), 1)
        cidx = jax.lax.broadcasted_iota(jnp.int32, (g.B, g.C, g.C), 2)
        ncb = jnp.asarray(g.nc).reshape(g.B, 1, 1)
        eye = jnp.where(ridx == cidx, jnp.asarray(1.0, dtype), 0.0)
        live = (ridx < ncb) & (cidx < ncb)
        L11 = jnp.where(live, L11, eye)  # identity on padding
        L21 = P[:, g.C:, :]
        return L11, L21

    from .supernodal_device import _use_potrf_kernel

    def trisolve(L11, yc, g, transpose):
        from ..kernels.trisolve import batched_trisolve, trisolve_fits
        if _use_potrf_kernel(dtype, g.B, g.C) and trisolve_fits(
                g.C, yc.shape[2], dtype):
            return batched_trisolve(L11, yc, transpose=transpose)
        return jax.lax.linalg.triangular_solve(
            L11, yc, left_side=True, lower=True, transpose_a=transpose)

    # forward: leaves -> root
    for glist in plan.groups:
        for g in glist:
            L11, L21 = panels_of(g)
            yc = y[g.col_idx].reshape(g.B, g.C, nrhs)
            xc = trisolve(L11, yc, g, False)
            y = y.at[g.col_idx].set(xc.reshape(g.B * g.C, nrhs))
            if g.R > g.C:
                upd = jnp.matmul(L21, xc, preferred_element_type=dtype)
                y = y.at[g.below_idx].add(
                    -upd.reshape(g.B * (g.R - g.C), nrhs))
    # backward: root -> leaves
    for glist in reversed(plan.groups):
        for g in glist:
            L11, L21 = panels_of(g)
            yc = y[g.col_idx].reshape(g.B, g.C, nrhs)
            if g.R > g.C:
                yb = y[g.below_idx].reshape(g.B, g.R - g.C, nrhs)
                yc = yc - jnp.matmul(jnp.swapaxes(L21, 1, 2), yb,
                                     preferred_element_type=dtype)
            xc = trisolve(L11, yc, g, True)
            y = y.at[g.col_idx].set(xc.reshape(g.B * g.C, nrhs))
    return y[:n]


@dataclasses.dataclass
class MF2Plan:
    """Per-LEVEL fused contribution routing (VERDICT r1 item 5: the 824
    per-pair-class op chains made the solve op-latency bound at 15.5 ms).

    Forward: child pass-up vectors live in one global V-heap (rows =
    concatenated per-group (B*RU) blocks, schedule order, plus a zero dump
    row); each level does ONE padded gather + ONE one-hot placement matmul
    + ONE block scatter-add into the level's w buffer.

    Backward: solved x values live in an x-heap (concatenated per-group
    (B*C) blocks — exactly the ``_mf_xmap`` layout); each group PULLS its
    below-row values with one static gather (below rows are columns of
    ancestors, already solved when the backward sweep reaches the group).
    No per-pair ops at all on the backward sweep."""

    vbase: dict          # (d, gi) -> row base of the group's V block
    vrows: int           # total V-heap rows (excl. dump)
    lv_vbase: list       # level -> base row of the level's first group
    xbase: dict          # (d, gi) -> row base of the group's xc block
    xrows: int
    lv_xbase: list
    # per level: (NP, RUmax) src rows into V-heap, (NP, RUmax) front
    # coords, (NP,) flat dst slot, Rmax, Btot, group row offsets
    lv_route: list
    # per group: (B*RU,) x-heap positions of its below rows (pad -> dump)
    xpos: dict


def build_mf2_plan(S: SupernodalSymbolic, plan) -> MF2Plan:
    gids = [(d, gi) for d, gl in enumerate(plan.groups)
            for gi in range(len(gl))]
    vbase, xbase = {}, {}
    lv_vbase, lv_xbase = [], []
    voff = xoff = 0
    for d, glist in enumerate(plan.groups):
        lv_vbase.append(voff)
        lv_xbase.append(xoff)
        for gi, g in enumerate(glist):
            vbase[(d, gi)] = voff
            xbase[(d, gi)] = xoff
            voff += g.B * max(g.R - g.C, 0)
            xoff += g.B * g.C
    vrows, xrows = voff, xoff

    # column -> x-heap position (for below-row pulls)
    colpos = np.empty(S.n, dtype=np.int64)
    for d, glist in enumerate(plan.groups):
        for gi, g in enumerate(glist):
            for b, s in enumerate(g.snodes):
                f = int(S.super_first[s])
                nc = int(S.super_first[s + 1]) - f
                colpos[f:f + nc] = xbase[(d, gi)] + b * g.C + np.arange(nc)

    lv_route = []
    xpos = {}
    for d, glist in enumerate(plan.groups):
        # ---- forward routing: ONE route per parent group, padded only to
        # the group's own (R, max child RU) — level-wide padding materialized
        # huge one-hot buffers when a level mixed a big separator group with
        # many small ones (measured slower than the classic per-class path)
        routes = []
        for gi, g in enumerate(glist):
            srcs, coords, dsts = [], [], []
            RUmax = 1
            for pc, (src, dst, idx) in zip(g.pairs, g._pair_arrays):
                cb = vbase[(pc.src_level, pc.src_gi)]
                RU_c = pc.RU_c
                RUmax = max(RUmax, RU_c)
                # V-heap rows of each pair's child block
                rows = (cb + src.astype(np.int64)[:, None] * RU_c
                        + np.arange(RU_c)[None, :])
                rows = np.where(idx >= 0, rows, vrows)   # pad -> dump row
                srcs.append(rows)
                coords.append(idx)
                dsts.append(dst.astype(np.int64))
            if not srcs:
                routes.append(None)
                continue
            NP = sum(a.shape[0] for a in srcs)
            sr = np.full((NP, RUmax), vrows, dtype=np.int64)
            co = np.full((NP, RUmax), -1, dtype=np.int32)
            k = 0
            for a, c in zip(srcs, coords):
                sr[k:k + a.shape[0], :a.shape[1]] = a
                co[k:k + a.shape[0], :c.shape[1]] = c
                k += a.shape[0]
            ds = np.concatenate(dsts)
            order = np.argsort(ds, kind="stable")
            routes.append((sr[order], co[order],
                           ds[order].astype(np.int32)))
        lv_route.append(routes)
        # ---- backward pulls ----
        for gi, g in enumerate(glist):
            RU = g.R - g.C
            if RU <= 0:
                continue
            pos = np.full(g.B * RU, xrows, dtype=np.int64)
            for b, s in enumerate(g.snodes):
                nc = S.ncols(int(s))
                below = S.rows[s][nc:]
                pos[b * RU:b * RU + below.size] = colpos[below]
            xpos[(d, gi)] = pos
    return MF2Plan(vbase=vbase, vrows=vrows, lv_vbase=lv_vbase,
                   xbase=xbase, xrows=xrows, lv_xbase=lv_xbase,
                   lv_route=lv_route, xpos=xpos)


def _mf2_solve_fn(S: SupernodalSymbolic, plan, solve_plan, m2: MF2Plan,
                  Lx, pb, dtype):
    """Per-level fused multifrontal solve (see MF2Plan)."""
    import jax
    import jax.numpy as jnp

    nrhs = pb.shape[1]
    pb = pb.astype(dtype)
    Lxp = jnp.concatenate([Lx.astype(dtype), jnp.zeros(1, dtype=dtype)])

    def panels_of(g):
        sl = jax.lax.dynamic_slice_in_dim(
            Lxp, g.panel_base, g.B * g.R * g.C)
        (sl,) = jax.lax.optimization_barrier((sl,))  # see _mf_solve_fn
        P = sl.reshape(g.B, g.R, g.C)
        L11 = P[:, :g.C, :]
        ridx = jax.lax.broadcasted_iota(jnp.int32, (g.B, g.C, g.C), 1)
        cidx = jax.lax.broadcasted_iota(jnp.int32, (g.B, g.C, g.C), 2)
        ncb = jnp.asarray(g.nc).reshape(g.B, 1, 1)
        eye = jnp.where(ridx == cidx, jnp.asarray(1.0, dtype), 0.0)
        live = (ridx < ncb) & (cidx < ncb)
        return jnp.where(live, L11, eye), P[:, g.C:, :]

    from .supernodal_device import _use_potrf_kernel

    def trisolve(L11, yc, g, transpose):
        from ..kernels.trisolve import batched_trisolve, trisolve_fits
        if _use_potrf_kernel(dtype, g.B, g.C) and trisolve_fits(
                g.C, yc.shape[2], dtype):
            return batched_trisolve(L11, yc, transpose=transpose)
        return jax.lax.linalg.triangular_solve(
            L11, yc, left_side=True, lower=True, transpose_a=transpose)

    nlev = len(plan.groups)
    # ---------------- forward ----------------
    vheap = jnp.zeros((m2.vrows + 1, nrhs), dtype=dtype)
    yfwd = {}
    for d in range(nlev):
        glist, slist = plan.groups[d], solve_plan.groups[d]
        vparts = []
        for gi, (g, sg) in enumerate(zip(glist, slist)):
            B, R, C = g.B, g.R, g.C
            RU = R - C
            route = m2.lv_route[d][gi]
            if route is not None:
                sr, co, ds = route
                vals = vheap[sr]                 # (NP, RUmax, nrhs)
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, (1, R, co.shape[1]), 1)
                P = (iota == co[:, None, :]).astype(dtype)
                placed = jnp.matmul(P, vals, preferred_element_type=dtype)
                wslice = jnp.zeros((B, R, nrhs), dtype=dtype)
                wslice = wslice.at[ds].add(placed, indices_are_sorted=True)
            else:
                wslice = jnp.zeros((B, R, nrhs), dtype=dtype)
            yc = pb[sg.col_idx].reshape(B, C, nrhs) - wslice[:, :C, :]
            L11, L21 = panels_of(sg)
            if RU > 0 and _use_step_kernel(dtype, B, C, RU, nrhs):
                from ..kernels.solve_step import solve_step_fwd
                xc, V = solve_step_fwd(L11, L21, yc, wslice[:, C:, :])
            else:
                xc = trisolve(L11, yc, sg, False)
                V = (jnp.matmul(L21, xc, preferred_element_type=dtype)
                     + wslice[:, C:, :]) if RU > 0 else None
            yfwd[(d, gi)] = xc
            if V is not None:
                vparts.append(V.reshape(B * RU, nrhs))
        if vparts:
            vheap = jax.lax.dynamic_update_slice(
                vheap, jnp.concatenate(vparts), (m2.lv_vbase[d], 0))

    # ---------------- backward ----------------
    xheap = jnp.zeros((m2.xrows + 1, nrhs), dtype=dtype)
    for d in range(nlev - 1, -1, -1):
        glist, slist = plan.groups[d], solve_plan.groups[d]
        xparts = []
        for gi, (g, sg) in enumerate(zip(glist, slist)):
            B, R, C = g.B, g.R, g.C
            RU = R - C
            yc = yfwd[(d, gi)]
            L11, L21 = panels_of(sg)
            if RU > 0:
                xb = xheap[m2.xpos[(d, gi)]].reshape(B, RU, nrhs)
                if _use_step_kernel(dtype, B, C, RU, nrhs):
                    from ..kernels.solve_step import solve_step_bwd
                    xc = solve_step_bwd(L11, L21, yc, xb)
                else:
                    yc = yc - jnp.matmul(jnp.swapaxes(L21, 1, 2), xb,
                                         preferred_element_type=dtype)
                    xc = trisolve(L11, yc, sg, True)
            else:
                xc = trisolve(L11, yc, sg, True)
            xparts.append(xc.reshape(B * C, nrhs))
        if xparts:
            xheap = jax.lax.dynamic_update_slice(
                xheap, jnp.concatenate(xparts), (m2.lv_xbase[d], 0))
    return xheap[:m2.xrows]


def _mf_solve_fn(S: SupernodalSymbolic, plan, solve_plan, Lx, pb, dtype,
                 winv=None):
    """Multifrontal solve over the device factor layout (see module doc).

    ``plan`` is the factorization Plan (pair routing reused verbatim);
    ``solve_plan`` the SolvePlan (panel slices + column gathers);
    ``pb`` (n+1, nrhs) the permuted rhs with a zero dump row;
    ``winv`` optional precomputed L11^{-1} pytree (see build_winv) — when
    given, every trisolve in the sweep becomes one matmul."""
    import jax
    import jax.numpy as jnp

    nrhs = pb.shape[1]
    pb = pb.astype(dtype)
    Lxp = jnp.concatenate([Lx.astype(dtype), jnp.zeros(1, dtype=dtype)])

    def panels_of(g):
        return _group_panels(Lxp, g, dtype)

    from .supernodal_device import _use_potrf_kernel

    def trisolve(L11, yc, g, transpose):
        from ..kernels.trisolve import batched_trisolve, trisolve_fits
        if _use_potrf_kernel(dtype, g.B, g.C) and trisolve_fits(
                g.C, yc.shape[2], dtype):
            return batched_trisolve(L11, yc, transpose=transpose)
        return jax.lax.linalg.triangular_solve(
            L11, yc, left_side=True, lower=True, transpose_a=transpose)

    # measurement-only ablations (WRONG RESULTS; for the timing
    # decomposition of the solve program): SSTPU_SOLVE_ABLATE=route
    # skips the pair routing, =panel replaces every panel matvec input
    # with its yc (keeping routing + glue). See NOTES_NEXT_ROUND.md.
    import os as _os
    _ablate = _os.environ.get("SSTPU_SOLVE_ABLATE", "")
    # SSTPU_SOLVE_FUSE_ROUTE=1: fuse each dest group's pair classes into
    # ONE padded placement (concat child vectors, idx padded to the
    # group's RUmax) — ~6.5x fewer routing thunks on the fine plan (800
    # classes -> 124 groups) at the cost of RUmax-padding the placement
    # mask work. MEASURED LOSS on v5e (7.83 vs 6.78 ms w2+fine): the
    # fused (NP, R, RUmax) placement hits the N=1 MXU dot path while the
    # small per-class placements run as VPU loop fusions. Kept opt-in as
    # the record.
    _fuse = _os.environ.get("SSTPU_SOLVE_FUSE_ROUTE", "0") == "1"
    # SSTPU_SOLVE_SORT=1 (DEFAULT in the latency regime, per the round-5
    # TPU A/B): class-sorted pass-up buffers — ONE batch permutation
    # gather per child group; each class then reads a static contiguous
    # slice (fuses into its placement) and the backward per-class scatter
    # becomes a static update-slice. Measured twice at n=125k 1 RHS on
    # v5e: 6.41 vs 6.68 and 6.51 vs 6.91 ms (w2+fine); at 64 RHS the
    # permute bytes scale with nrhs and COST 0.74 ms (19.25 vs 18.51), so
    # the default gates at nrhs <= 8. The RU_c-bucket class merge
    # (SSTPU_SOLVE_MERGE) measured NO win (6.64) — the routing cost is
    # scheduling/dependency structure, not thunk count.
    _sort = (_os.environ.get("SSTPU_SOLVE_SORT", "1") == "1"
             and nrhs <= int(_os.environ.get("SSTPU_SORT_NRHS_MAX", "8"))
             and not _fuse and not _ablate)
    smap, cmap = _sorted_route(plan) if _sort else ({}, {})
    # SSTPU_SOLVE_MERGE=1: RU_c-bucketed class merging + one global rhs
    # pre-gather (see _merged_route/_pb_pregather) — fewer routing and
    # glue thunks on the sequential sweep chain, bit-identical results.
    _merge = (_os.environ.get("SSTPU_SOLVE_MERGE", "0") == "1"
              and not _fuse and not _sort and not _ablate)
    if _merge:
        _pbidx, _pboffs = _pb_pregather(solve_plan)
        pbcat = pb[jnp.asarray(_pbidx)]          # (sum B*C, nrhs)

    # ---------------- forward: leaves -> root ----------------
    up = {}       # (level, gi) -> pass-up contribution vectors (B, RU, nrhs)
    yfwd = {}     # (level, gi) -> forward solution on own columns (B, C, nrhs)
    for d, (fglist, sglist) in enumerate(zip(plan.groups, solve_plan.groups)):
        for gi, (fg, sg) in enumerate(zip(fglist, sglist)):
            B, R, C = fg.B, fg.R, fg.C
            RU = R - C
            w = jnp.zeros((B, R, nrhs), dtype=dtype)
            if _fuse and fg.pairs and _ablate != "route":
                idxcat, dstcat, metas, RUmax = _fused_route(fg)
                V = jnp.concatenate(
                    [jnp.pad(up[(sl, sgi)][src],
                             ((0, 0), (0, RUmax - ruc), (0, 0)))
                     for (sl, sgi, src, _k0, _k1, ruc) in metas], axis=0)
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, (1, R, RUmax), 1)
                P = (iota == idxcat[:, None, :]).astype(dtype)
                placed = jnp.matmul(P, V, preferred_element_type=dtype)
                w = w.at[dstcat].add(placed)
            elif _merge and fg.pairs:
                for (idxcat, dstcat, metas) in _merged_route(fg):
                    Vs = [up[(sl, sgi)][src]
                          for (sl, sgi, src, _k0, _k1) in metas]
                    V = Vs[0] if len(Vs) == 1 else jnp.concatenate(Vs,
                                                                   axis=0)
                    iota = jax.lax.broadcasted_iota(
                        jnp.int32, (1, R, idxcat.shape[1]), 1)
                    P = (iota == idxcat[:, None, :]).astype(dtype)
                    placed = jnp.matmul(P, V, preferred_element_type=dtype)
                    w = w.at[dstcat].add(placed)
            else:
                for ci, (pc, (src, dst, idx)) in enumerate(zip(
                        [] if _ablate == "route" else fg.pairs,
                        fg._pair_arrays)):
                    if _sort:
                        off, hi = cmap[(d, gi, ci)]
                        V = jax.lax.slice_in_dim(
                            up[(pc.src_level, pc.src_gi)], off, hi)
                    else:
                        V = up[(pc.src_level, pc.src_gi)][src]
                    iota = jax.lax.broadcasted_iota(
                        jnp.int32, (1, R, pc.RU_c), 1)
                    P = (iota == idx[:, None, :]).astype(dtype)
                    placed = jnp.matmul(P, V, preferred_element_type=dtype)
                    w = w.at[dst].add(placed, indices_are_sorted=True)
            if _merge:
                off = _pboffs[(d, gi)]
                pbg = jax.lax.slice_in_dim(pbcat, off, off + B * C)
            else:
                pbg = pb[sg.col_idx]
            yc = pbg.reshape(B, C, nrhs) - w[:, :C, :]
            if _ablate == "panel":
                yfwd[(d, gi)] = yc
                if RU > 0:
                    up[(d, gi)] = w[:, C:, :] + jnp.mean(yc, axis=1,
                                                         keepdims=True)
                continue
            if winv is not None and isinstance(winv[d][gi], dict):
                e = winv[d][gi]
                if "w2f" in e:
                    from ..kernels.pmatvec import pmatvec_t
                    W2f = e["w2f"]                  # (B, Cp, Rp)
                    Cp = W2f.shape[1]
                    Z = pmatvec_t(W2f, jnp.pad(
                        yc, ((0, 0), (0, Cp - C), (0, 0))))
                    z = jnp.swapaxes(Z[:, :nrhs, :R], 1, 2)  # (B, R, nrhs)
                    yfwd[(d, gi)] = z[:, :C, :]
                    if RU > 0:
                        up[(d, gi)] = z[:, C:, :] + w[:, C:, :]
                elif "w2t" in e:
                    from ..kernels.bmatvec import bmatvec_t, bmv_group_geom
                    W2t = e["w2t"]
                    Bp = W2t.shape[2]
                    bb = bmv_group_geom(((R, C),), B,
                                        jnp.dtype(dtype).itemsize)[2]
                    zt = bmatvec_t(W2t, _to_lanes(yc, Bp), bb=bb)
                    yfwd[(d, gi)] = _from_lanes(zt[:C], B, C)
                    if RU > 0:
                        up[(d, gi)] = _from_lanes(zt[C:R], B, RU) \
                            + w[:, C:, :]
                else:
                    z = jnp.matmul(e["w2"], yc,
                                   preferred_element_type=dtype)
                    yfwd[(d, gi)] = z[:, :C, :]
                    if RU > 0:
                        up[(d, gi)] = z[:, C:, :] + w[:, C:, :]
                continue
            L11, L21 = panels_of(sg)
            if winv is not None and len(winv[d][gi]) == 2:
                from ..kernels.bmatvec import bmatvec_t, bmv_group_geom
                Wt, L21t = winv[d][gi]
                Bp = Wt.shape[2]
                bb = bmv_group_geom(
                    ((C, C), (RU, C)) if RU > 0 else ((C, C),), B,
                    jnp.dtype(dtype).itemsize)[2]
                xct = bmatvec_t(Wt, _to_lanes(yc, Bp), bb=bb)
                xc = _from_lanes(xct, B, C)
                yfwd[(d, gi)] = xc
                if RU > 0:
                    vt = bmatvec_t(L21t, xct[:C], bb=bb)
                    up[(d, gi)] = _from_lanes(vt, B, RU) + w[:, C:, :]
            elif winv is not None:
                xc = jnp.matmul(winv[d][gi][0], yc,
                                preferred_element_type=dtype)
                yfwd[(d, gi)] = xc
                if RU > 0:
                    up[(d, gi)] = jnp.matmul(
                        L21, xc, preferred_element_type=dtype) + w[:, C:, :]
            elif RU > 0 and _use_step_kernel(dtype, B, C, RU, nrhs):
                from ..kernels.solve_step import solve_step_fwd
                xc, V = solve_step_fwd(L11, L21, yc, w[:, C:, :])
                yfwd[(d, gi)] = xc
                up[(d, gi)] = V
            else:
                xc = trisolve(L11, yc, sg, False)
                yfwd[(d, gi)] = xc
                if RU > 0:
                    V = jnp.matmul(L21, xc, preferred_element_type=dtype) \
                        + w[:, C:, :]
                    up[(d, gi)] = V
        if _sort:
            # one batch-permute gather per child group: its pass-up rows
            # land in consuming-class order so every class upstream reads
            # a static slice (fused) instead of issuing its own gather
            for gi2 in range(len(fglist)):
                key = (d, gi2)
                if key in smap and key in up:
                    cat, _inv, _ncat = smap[key]
                    up[key] = up[key][jnp.asarray(cat)]

    # ---------------- backward: root -> leaves ----------------
    xb = {}       # (level, gi) -> below-row x values (B, RU, nrhs)
    xcs = {}
    for d in range(len(plan.groups) - 1, -1, -1):
        for gi in range(len(plan.groups[d]) - 1, -1, -1):
            fg = plan.groups[d][gi]
            sg = solve_plan.groups[d][gi]
            B, R, C = fg.B, fg.R, fg.C
            RU = R - C
            below = xb.get((d, gi))
            if below is None:
                below = jnp.zeros((B, max(RU, 1), nrhs), dtype=dtype)
            elif _sort and (d, gi) in smap:
                # class-sorted slab -> batch order; childless rows pull
                # the zero pad row (inv sentinel = ncat)
                cat, inv, ncat = smap[(d, gi)]
                below = jnp.concatenate(
                    [below, jnp.zeros((1,) + below.shape[1:], dtype)],
                    axis=0)[jnp.asarray(inv)]
            yc = yfwd[(d, gi)]
            if _ablate == "panel":
                xc = yc + jnp.mean(below, axis=1, keepdims=True)
                xcs[(d, gi)] = xc
                if fg.pairs and _ablate != "route":
                    fx = jnp.concatenate([xc, below[:, :RU]], axis=1) \
                        if RU > 0 else xc
                    for pc, (src, dst, idx) in zip(fg.pairs,
                                                   fg._pair_arrays):
                        rows = fx[dst]
                        iota = jax.lax.broadcasted_iota(
                            jnp.int32, (1, R, pc.RU_c), 1)
                        P = (iota == idx[:, None, :]).astype(dtype)
                        childx = jnp.matmul(jnp.swapaxes(P, 1, 2), rows,
                                            preferred_element_type=dtype)
                        key = (pc.src_level, pc.src_gi)
                        buf = xb.get(key)
                        if buf is None:
                            cg = plan.groups[pc.src_level][pc.src_gi]
                            buf = jnp.zeros(
                                (cg.B, max(cg.R - cg.C, 1), nrhs),
                                dtype=dtype)
                        xb[key] = buf.at[src].set(childx,
                                                  unique_indices=True)
                continue
            if winv is not None and isinstance(winv[d][gi], dict):
                e = winv[d][gi]
                yin = jnp.concatenate([yc, -below[:, :RU]], axis=1) \
                    if RU > 0 else yc
                if "w2b" in e:
                    from ..kernels.pmatvec import pmatvec_t
                    W2b = e["w2b"]                  # (B, Rp, Cp)
                    Rp = W2b.shape[1]
                    Z = pmatvec_t(W2b, jnp.pad(
                        yin, ((0, 0), (0, Rp - R), (0, 0))))
                    xc = jnp.swapaxes(Z[:, :nrhs, :C], 1, 2)
                elif "w2t" in e:
                    from ..kernels.bmatvec import bmatvec_t, bmv_group_geom
                    W2t = e["w2t"]
                    Bp, Rpad = W2t.shape[2], W2t.shape[0]
                    bb = bmv_group_geom(((R, C),), B,
                                        jnp.dtype(dtype).itemsize)[2]
                    zt = bmatvec_t(W2t, _to_lanes(yin, Bp, rows_pad=Rpad),
                                   transpose=True, bb=bb)
                    xc = _from_lanes(zt, B, C)
                else:
                    xc = jnp.matmul(jnp.swapaxes(e["w2"], 1, 2), yin,
                                    preferred_element_type=dtype)
            elif winv is not None and len(winv[d][gi]) == 2:
                from ..kernels.bmatvec import bmatvec_t
                Wt, L21t = winv[d][gi]
                Bp, Cpad = Wt.shape[2], Wt.shape[0]
                yct = _to_lanes(yc, Bp)
                if RU > 0:
                    bt = _to_lanes(below[:, :RU], Bp,
                                   rows_pad=L21t.shape[0])
                    yct = yct - bmatvec_t(L21t, bt, transpose=True)
                if Cpad > C:
                    yct = jnp.pad(yct, ((0, Cpad - C), (0, 0), (0, 0)))
                xct = bmatvec_t(Wt, yct, transpose=True)
                xc = _from_lanes(xct, B, C)
            elif winv is not None:
                L11, L21 = panels_of(sg)
                if RU > 0:
                    yc = yc - jnp.matmul(jnp.swapaxes(L21, 1, 2),
                                         below[:, :RU],
                                         preferred_element_type=dtype)
                xc = jnp.matmul(jnp.swapaxes(winv[d][gi][0], 1, 2), yc,
                                preferred_element_type=dtype)
            elif RU > 0 and _use_step_kernel(dtype, B, C, RU, nrhs):
                from ..kernels.solve_step import solve_step_bwd
                L11, L21 = panels_of(sg)
                xc = solve_step_bwd(L11, L21, yc, below[:, :RU])
            else:
                L11, L21 = panels_of(sg)
                if RU > 0:
                    yc = yc - jnp.matmul(jnp.swapaxes(L21, 1, 2),
                                         below[:, :RU],
                                         preferred_element_type=dtype)
                xc = trisolve(L11, yc, sg, True)
            xcs[(d, gi)] = xc
            # push the front's x values down to every child group
            if fg.pairs and _ablate != "route" and _fuse:
                idxcat, dstcat, metas, RUmax = _fused_route(fg)
                fx = jnp.concatenate([xc, below[:, :RU]], axis=1) \
                    if RU > 0 else xc
                rows = fx[dstcat]                           # (NP, R, nrhs)
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, (1, R, RUmax), 1)
                P = (iota == idxcat[:, None, :]).astype(dtype)
                childx = jnp.matmul(jnp.swapaxes(P, 1, 2), rows,
                                    preferred_element_type=dtype)
                for (sl, sgi, src, k0, k1, ruc) in metas:
                    key = (sl, sgi)
                    buf = xb.get(key)
                    if buf is None:
                        cg = plan.groups[sl][sgi]
                        buf = jnp.zeros((cg.B, max(cg.R - cg.C, 1), nrhs),
                                        dtype=dtype)
                    xb[key] = buf.at[src].set(childx[k0:k1, :ruc],
                                              unique_indices=True)
            elif fg.pairs and _ablate != "route" and _merge:
                fx = jnp.concatenate([xc, below[:, :RU]], axis=1) \
                    if RU > 0 else xc
                for (idxcat, dstcat, metas) in _merged_route(fg):
                    rows = fx[dstcat]                       # (npt, R, nrhs)
                    iota = jax.lax.broadcasted_iota(
                        jnp.int32, (1, R, idxcat.shape[1]), 1)
                    P = (iota == idxcat[:, None, :]).astype(dtype)
                    childx = jnp.matmul(jnp.swapaxes(P, 1, 2), rows,
                                        preferred_element_type=dtype)
                    for (sl, sgi, src, k0, k1) in metas:
                        key = (sl, sgi)
                        buf = xb.get(key)
                        if buf is None:
                            cg = plan.groups[sl][sgi]
                            buf = jnp.zeros(
                                (cg.B, max(cg.R - cg.C, 1), nrhs),
                                dtype=dtype)
                        part = childx if len(metas) == 1 else \
                            jax.lax.slice_in_dim(childx, k0, k1)
                        xb[key] = buf.at[src].set(part, unique_indices=True)
            elif fg.pairs and _ablate != "route":
                fx = jnp.concatenate([xc, below[:, :RU]], axis=1) \
                    if RU > 0 else xc
                for ci, (pc, (src, dst, idx)) in enumerate(
                        zip(fg.pairs, fg._pair_arrays)):
                    rows = fx[dst]                          # (np, R, nrhs)
                    # select child rows via the one-hot transpose (P^T @ fx):
                    # same op family as the factor program (gather-free)
                    iota = jax.lax.broadcasted_iota(
                        jnp.int32, (1, R, pc.RU_c), 1)
                    P = (iota == idx[:, None, :]).astype(dtype)
                    childx = jnp.matmul(jnp.swapaxes(P, 1, 2), rows,
                                        preferred_element_type=dtype)
                    key = (pc.src_level, pc.src_gi)
                    buf = xb.get(key)
                    if _sort:
                        # class-sorted slab: static update-slice at the
                        # class offset (disjoint across classes)
                        if buf is None:
                            cg = plan.groups[pc.src_level][pc.src_gi]
                            buf = jnp.zeros(
                                (smap[key][2], max(cg.R - cg.C, 1), nrhs),
                                dtype=dtype)
                        off, _hi = cmap[(d, gi, ci)]
                        xb[key] = jax.lax.dynamic_update_slice_in_dim(
                            buf, childx, off, axis=0)
                        continue
                    if buf is None:
                        cg = plan.groups[pc.src_level][pc.src_gi]
                        buf = jnp.zeros((cg.B, max(cg.R - cg.C, 1), nrhs),
                                        dtype=dtype)
                    xb[key] = buf.at[src].set(childx, unique_indices=True)

    # assemble x (permuted ordering) with one gather through xmap
    xcat = jnp.concatenate(
        [xcs[(d, gi)].reshape(-1, nrhs)
         for d in range(len(plan.groups))
         for gi in range(len(plan.groups[d]))], axis=0)
    return xcat


def _sorted_route(plan):
    """Class-sorted routing maps (cached on the factor Plan): for each
    CHILD group, the batch permutation that lays its pass-up vectors out
    in consuming-class order.  Pair-class sources are DISJOINT per child
    group (routing is tree-edge-only — verified on real plans), so after
    ONE gather per child group every class reads a STATIC contiguous
    slice (fused into its placement matvec) instead of issuing its own
    batch-gather, and the backward per-class scatter becomes a static
    dynamic-update-slice.  Returns {child_key: (cat, inv, ncat)} plus
    {(parent_d, parent_gi, class_i): (off, np)} in the second dict."""
    sr = getattr(plan, "_solve_sortmap", None)
    if sr is None:
        order: dict = {}
        for dp, gl in enumerate(plan.groups):
            for gip, g in enumerate(gl):
                for ci, (pc, (src, _dst, _idx)) in enumerate(
                        zip(g.pairs, g._pair_arrays)):
                    order.setdefault((pc.src_level, pc.src_gi), []).append(
                        ((dp, gip, ci), src))
        groups_map, class_map = {}, {}
        for key, lst in order.items():
            cat = np.concatenate([s for (_pk, s) in lst]).astype(np.int64)
            B_c = plan.groups[key[0]][key[1]].B
            # childless batch slots point at the zero pad row (cat.size)
            inv = np.full(B_c, cat.size, dtype=np.int64)
            inv[cat] = np.arange(cat.size)
            off = 0
            for (pk, s) in lst:
                class_map[pk] = (off, off + s.size)
                off += s.size
            groups_map[key] = (cat, inv, cat.size)
        sr = (groups_map, class_map)
        plan._solve_sortmap = sr
    return sr


def _merged_route(fg):
    """Per-dest-group pair classes bucketed by EXACT RU_c (cached on the
    GroupPlan): classes in one bucket concatenate along the pair axis with
    ZERO padding (same row-map width), so k classes cost one placement
    matmul + one scatter-add instead of k of each.  At n=125k this takes
    the fine plan's 800 classes to 517 buckets (the fully-fused variant —
    one RUmax-padded placement per group — measured SLOWER on v5e; this
    is the no-pad middle ground).  Returns a list of buckets
    [(idxcat (npt, RU_c), dstcat (npt,), metas)] with
    metas = [(src_level, src_gi, src, k0, k1), ...]."""
    mr = getattr(fg, "_solve_merged", None)
    if mr is None:
        byru: dict = {}
        for pc, (src, dst, idx) in zip(fg.pairs, fg._pair_arrays):
            byru.setdefault(pc.RU_c, []).append((pc, src, dst, idx))
        mr = []
        for ru, lst in byru.items():
            k0, metas = 0, []
            for (pc, src, dst, idx) in lst:
                metas.append((pc.src_level, pc.src_gi, src, k0,
                              k0 + src.size))
                k0 += src.size
            mr.append((np.concatenate([idx for (_p, _s, _d, idx) in lst],
                                      axis=0),
                       np.concatenate([d for (_p, _s, d, _i) in lst]),
                       metas))
        fg._solve_merged = mr
    return mr


def _pb_pregather(solve_plan):
    """ONE rhs gather for the whole sweep: concatenated col_idx across
    every group plus per-group offsets (cached on the SolvePlan).  Each
    group's ``pb[sg.col_idx]`` becomes a static slice of the single
    gathered buffer (fuses into its panel matvec) instead of issuing its
    own gather thunk."""
    pg = getattr(solve_plan, "_pb_pregather", None)
    if pg is None:
        idxs, offs = [], {}
        off = 0
        for d, gl in enumerate(solve_plan.groups):
            for gi, sg in enumerate(gl):
                idxs.append(sg.col_idx)
                offs[(d, gi)] = off
                off += sg.col_idx.size
        pg = (np.concatenate(idxs) if idxs else np.empty(0, np.int64), offs)
        solve_plan._pb_pregather = pg
    return pg


def _fused_route(fg):
    """Per-dest-group fused routing arrays (cached on the GroupPlan):
    (idxcat (NP, RUmax) int32 pad -1, dstcat (NP,), metas, RUmax) where
    metas = [(src_level, src_gi, src_idx, k0, k1, RU_c), ...] in concat
    order. The factor plan's per-class chunking (cap_cells for U-buffer
    working sets) is irrelevant for solve vectors, so classes fuse whole."""
    fr = getattr(fg, "_solve_fused", None)
    if fr is None and fg.pairs:
        RUmax = max(pc.RU_c for pc in fg.pairs)
        idxs, dsts, metas = [], [], []
        k0 = 0
        for pc, (src, dst, idx) in zip(fg.pairs, fg._pair_arrays):
            idxs.append(np.pad(idx, ((0, 0), (0, RUmax - idx.shape[1])),
                               constant_values=-1))
            dsts.append(dst)
            metas.append((pc.src_level, pc.src_gi, src, k0, k0 + src.size,
                          pc.RU_c))
            k0 += src.size
        fr = (np.concatenate(idxs, axis=0), np.concatenate(dsts),
              metas, RUmax)
        fg._solve_fused = fr
    return fr


def _mf_xmap(S: SupernodalSymbolic, plan) -> np.ndarray:
    """xmap[j] = row of the concatenated per-group xc buffer holding column j."""
    xmap = np.empty(S.n, dtype=np.int64)
    base = 0
    for glist in plan.groups:
        for g in glist:
            for b, s in enumerate(g.snodes):
                f = int(S.super_first[s])
                nc = S.ncols(int(s))
                xmap[f:f + nc] = base + b * g.C + np.arange(nc)
            base += g.B * g.C
    return xmap


def solve_refined(F: SupernodalFactor, A, b: np.ndarray, iters: int = 2,
                  config: Config = DEFAULT) -> np.ndarray:
    """Device solve + host-fp64-residual iterative refinement (the UMFPACK
    IRSTEP pattern, ``umfpack_solve.c:102``, applied to Cholesky): recovers
    fp64-class residuals from an fp32 — or bfloat16-update — factor."""
    b = np.asarray(b, dtype=np.float64)
    x = solve_device(F, b, config)
    for _ in range(max(iters, 0)):
        r = b - A.matvec(x)
        x = x + solve_device(F, r, config)
    return x


def solve_device(F: SupernodalFactor, b: np.ndarray,
                 config: Config = DEFAULT,
                 _dispatch_only: bool = False) -> np.ndarray:
    """x = A \\ b via the device supernodal solves (handles permutation)."""
    import jax
    import jax.numpy as jnp

    S = F.S
    assert F.ok
    layout = F.layout
    bb_n = 1 if np.asarray(b).ndim == 1 else np.asarray(b).shape[1]
    use_coarse = (layout == "device" and _use_coarse_solve(bb_n)
                  and getattr(S, "_clow_cache", None) is not None
                  # the relayout keeps a SECOND factor copy on device:
                  # skip at capacity sizes (n=512k: +2 GB factor + 2 GB map)
                  and S._device_plan.dev_size <= int(float(
                      __import__("os").environ.get("SSTPU_COARSE_MAX_CELLS",
                                                   "3e8"))))
    plans = getattr(S, "_solve_plans", None)
    if plans is None:
        plans = {}
        S._solve_plans = plans
    _ladder = __import__("os").environ.get("SSTPU_SOLVE_LADDER", "pow4")
    pkey = layout + (f"/coarse-{_ladder}" if use_coarse else "")
    if pkey not in plans:
        plans[pkey] = build_solve_plan(
            S, layout, plan=_coarse_plan(S) if use_coarse else None)
    plan = plans[pkey]
    dtype = jnp.float64 if (config.compute_dtype == "float64"
                            and jax.config.jax_enable_x64) else jnp.float32
    b = np.asarray(b, dtype=np.float64)
    one_d = b.ndim == 1
    bb = b.reshape(-1, 1) if one_d else b
    pb = bb[S.perm]
    import os as _os
    # HBM gate for the inverse-panel modes: build_winv peaks at several
    # factor-sized buffers (Lx arg + Lxp copy + the W/W2 output + jit
    # double-buffering) and the solve then keeps BOTH Lx and W2 resident.
    # Measured: n=512k (lx_size 5.4e8 cells) OOMed 18.44G vs 15.75G HBM
    # at build_winv; the classic trisolve sweep stays in-budget. 6x
    # lx_size bytes is the conservative peak estimate.
    _winv_fits = (plan.lx_size * jnp.dtype(dtype).itemsize * 6
                  <= float(_os.environ.get("SSTPU_WINV_HBM", "1.2e10")))
    use_inv = (layout == "device" and _use_inv_solve(bb.shape[1])
               and _winv_fits)
    key = (pkey, str(dtype), bb.shape[1], use_inv,
           id(S._device_plan) if layout == "device" else 0,
           # knobs that change the traced program without changing the
           # arg structure must key the compiled-fn cache
           _os.environ.get("SSTPU_SOLVE_ABLATE", ""),
           _os.environ.get("SSTPU_SOLVE_FUSE_ROUTE", "0"),
           _os.environ.get("SSTPU_SOLVE_SORT", "1"),
           _os.environ.get("SSTPU_SOLVE_MERGE", "0"),
           config.precision)
    cache = getattr(S, "_solve_cache", None)
    if not isinstance(cache, dict):
        cache = {}
        S._solve_cache = cache
    if key not in cache:
        if layout == "device":
            import os
            fplan = _coarse_plan(S) if use_coarse else S._device_plan
            xmap = _mf_xmap(S, fplan)
            # default CLASSIC: measured on-TPU (n=125k, 1 rhs) the
            # per-class block routing runs 14.8 ms vs 28.7 ms for the
            # global-heap mf2 variant — the heap's element-granular
            # vheap gathers (~5 ns/elem over ~2.2M contribution elements)
            # cost more than the op-count reduction saves. mf2 stays as an
            # opt-in (SSTPU_SOLVE_MF2=1) for shapes where it may win.
            # trace-time precision context: multi-RHS panel applications
            # and placements become REAL matmuls on TPU, and the default
            # is ONE bf16 pass (2^-8) — measured 1.6e-3 residual at
            # nrhs=64 before this fix. The 1-RHS matvec path rides the
            # VPU and is unaffected. Follows config.precision like the
            # factor kernels do.
            prec_name = config.precision
            if use_inv:
                def fn_mf(lx, pbp, wv):
                    with jax.default_matmul_precision(prec_name):
                        xcat = _mf_solve_fn(S, fplan, plan, lx, pbp, dtype,
                                            winv=wv)
                        return xcat[xmap]
            elif use_coarse or os.environ.get("SSTPU_SOLVE_MF2", "0") != "1":
                # (MF2 keeps its own plan keyed to the FINE layout; the
                # coarse route uses the classic per-group formulation)
                def fn_mf(lx, pbp):
                    with jax.default_matmul_precision(prec_name):
                        xcat = _mf_solve_fn(S, fplan, plan, lx, pbp, dtype)
                        return xcat[xmap]
            else:
                m2 = getattr(S, "_mf2_plan", None)
                if m2 is None:
                    m2 = build_mf2_plan(S, fplan)
                    S._mf2_plan = m2

                def fn_mf(lx, pbp):
                    with jax.default_matmul_precision(prec_name):
                        xcat = _mf2_solve_fn(S, fplan, plan, m2, lx, pbp,
                                             dtype)
                        return xcat[xmap]

            fn = jax.jit(fn_mf)
        else:
            prec_name = config.precision

            def fn_px(lx, bb2):
                with jax.default_matmul_precision(prec_name):
                    return _solve_fn(plan, lx, bb2, dtype)

            fn = jax.jit(fn_px)
        # pin the plan whose id() is in the key: alive-while-cached means
        # the id can never be recycled into a false hit
        cache[key] = (fn, S._device_plan if layout == "device" else None)
    fn = cache[key][0]
    if layout == "device":
        pbp = np.concatenate([pb, np.zeros((1, pb.shape[1]))], axis=0)
        lx_in = F.Lx
        if use_coarse:
            # one-time per-factor relayout gather into the coarse layout
            # (factor-many/solve-many amortizes it). Cache keys hold STRONG
            # references compared with `is` — id() of a freed Plan/array can
            # recycle (review r3)
            rc = getattr(F, "_lx_coarse", None)
            if rc is None or rc[0] is not S._device_plan \
                    or rc[1] is not F.Lx or rc[2] != _ladder:
                plan2 = _coarse_plan(S)
                mc = getattr(S, "_relayout", None)
                if mc is None or mc[0] is not S._device_plan \
                        or mc[2] != _ladder:
                    # static-slice device relayout — NOT a gather map (a
                    # dev2-sized map is ~400 MB of H2D at n=125k)
                    S._relayout = (S._device_plan,
                                   jax.jit(relayout_fn(S, S._device_plan,
                                                       plan2)), _ladder)
                F._lx_coarse = (S._device_plan, F.Lx, _ladder,
                                S._relayout[1](F.Lx))
            lx_in = F._lx_coarse[3]
        if use_inv:
            # inverse panels cached per factor VALUES (device arrays are
            # immutable; a refactorization makes a fresh Lx object)
            import os
            # the stacked W2 panel doubles the per-factor device footprint
            # (a full extra R*C copy) — gate at capacity sizes like coarse
            use_w2 = (_use_w2(bb.shape[1])
                      and S._device_plan.dev_size <= int(float(
                          os.environ.get("SSTPU_W2_MAX_CELLS", "3e8"))))
            # same default as _use_bmv ('0') so unset vs explicit 'auto'
            # hash to DIFFERENT keys only when behavior differs (ADVICE r4)
            wkey = (str(dtype), pkey, bb.shape[1], use_w2,
                    os.environ.get("SSTPU_SOLVE_BMV", "0"),
                    os.environ.get("SSTPU_SOLVE_PMV", "0"),
                    os.environ.get("SSTPU_BMV_BMIN", "32"))
            wcache = getattr(F, "_winv", None)
            if (wcache is None or wcache[0] != wkey
                    or wcache[1] is not F.Lx):
                wv = build_winv(plan, lx_in, dtype, nrhs=bb.shape[1],
                                w2=use_w2)
                F._winv = (wkey, F.Lx, wv)
            args = (lx_in, jnp.asarray(pbp), F._winv[2])
        else:
            args = (lx_in, jnp.asarray(pbp))
    else:
        args = (jnp.asarray(F.Lx), jnp.asarray(pb))
    if _dispatch_only:
        return fn, args
    yz = np.asarray(fn(*args), dtype=np.float64)
    x = np.empty_like(yz[:S.n])
    x[S.perm] = yz[:S.n]
    return x[:, 0] if one_d else x


def solve_dispatch(F: SupernodalFactor, b: np.ndarray,
                   config: Config = DEFAULT):
    """(jitted_fn, device_args) exactly as solve_device would run them —
    the pipelined-benchmark surface (one warm call populates every cache;
    per-call host work is excluded from what the caller times)."""
    return solve_device(F, b, config, _dispatch_only=True)


def solve_report(S: SupernodalSymbolic, nrhs: int = 1,
                 bytes_per_elt: int = 4) -> str:
    """Static latency accounting for the multifrontal solve (the solve-side
    analog of ``supernodal_device.roofline_report``): per mode, the number
    of SEQUENTIAL group steps (the 1-RHS latency driver — measured ~2 us
    dispatch/DMA floor per step on TPU), panel bytes streamed per sweep,
    and the bandwidth floor those bytes imply at v5e HBM (~800 GB/s)."""
    lines = [f"mode    steps/sweep  panel MB/sweep  HBM floor (2 sweeps)"]
    plans = {"fine": getattr(S, "_device_plan", None)}
    p2 = getattr(S, "_solve_coarse_plan", None)
    if p2 is None and getattr(S, "_clow_cache", None) is not None:
        p2 = _coarse_plan(S)
    if p2 is not None:
        plans["coarse"] = p2
    for name, plan in plans.items():
        if plan is None:
            continue
        steps = sum(len(gl) for gl in plan.groups)
        cells = sum(g.B * g.R * g.C for gl in plan.groups for g in gl)
        mb = cells * bytes_per_elt / 1e6
        floor_ms = 2 * mb / 800e3 * 1e3
        lines.append(f"{name:7s} {steps:10d} {mb:14.1f} {floor_ms:10.2f} ms"
                     f"  (+~{2 * steps * 2e-3:.1f} ms step latency)")
    return "\n".join(lines)
