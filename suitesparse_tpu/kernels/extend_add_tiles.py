"""Tiled extend-add Pallas kernel: traffic-optimal multifrontal assembly.

Reference analog: the scatter-assembly loop of ``t_cholmod_super_numeric.c:724``
(CHOLMOD adds each descendant's update block into the ancestor front with
per-row index arithmetic inside one BLAS-3 sweep). Round 2/3 measured the
XLA formulations of that step as the dominant factor cost at n=125k:

  * one-hot matmuls (P @ U @ P'): 27x the useful panel flops;
  * row-gather strategy: ~18.7 GB of HBM traffic (half / halfT / contrib
    intermediates + full-frame scatter-adds) vs a ~4 GB traffic floor.

This kernel removes the intermediates entirely. The child->parent row maps
are MONOTONE (``idx`` rows are sorted), so for any (128, 128) tile of the
parent front the contributing child rows/cols are CONTIGUOUS ranges that
span at most two 128-aligned child blocks each. A manifest enumerates, per
parent tile, the (child block quad, in-tile placement map) pieces; the
kernel walks the manifest with the parent tile resident in VMEM:

  * parent F tiles WITH contributions are visited once, in sorted order —
    consecutive manifest steps with the same tile index keep the output
    block resident (grid revisit accumulation). The F input is DONATED to
    the output (``input_output_aliases``), so tiles with no contributions
    are never visited at all and keep their assembled-A content in place:
    at n=125k this removed 10,590 of 25,919 grid steps (the measured cost
    is ~1.7 us/STEP, content-independent — the grid is step-bound). The
    alias is race-free because visited tiles strictly increase (a tile's
    input fetch never overlaps another tile's writeback at the same
    address; probed on v5e incl. revisit accumulation and unvisited-tile
    preservation);
  * the 4 child blocks arrive via manifest-driven BlockSpec index maps
    (hardware-aligned, auto-pipelined; Mosaic rejects unaligned DMA);
  * in-tile placement is two one-hot matmuls per quadrant pair at
    precision=HIGHEST — exact selection (verified bit-identical on v5e),
    MXU work proportional to TILE^3, not R^2 x RU;
  * only LOWER tiles (tr >= tc) are materialized: every cell the panel
    factorization or any consumer reads lives in a lower tile (row >= col
    cells only), which halves both traffic and steps. Upper-tile garbage
    in a child update is neutralized by an in-VMEM isfinite mask (0 * NaN
    would otherwise poison the one-hot dots).

Child updates are concatenated per parent group into one zero-padded
``Ucat`` (pairs x RUp x RUp, RUp a tile multiple) so a single input array
serves every piece; classes whose RU is small relative to RUp stay on the
XLA strategies (padding would dominate).
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

__all__ = ["TILE", "build_group_manifest", "extend_add_tiles"]

TILE = 128


@dataclasses.dataclass
class TileManifest:
    man: np.ndarray        # (NS, 10) int32 step table (see columns below)
    rowmap: np.ndarray     # (NS, 1, T) int32 in-window row map (-1 = none)
    colmap: np.ndarray     # (NS, 1, T) int32
    RUp: int               # Ucat padded child size (TILE multiple)
    nslots: int            # Ucat slots (total folded pairs)
    uslices: list          # [(class_i, k0, (src_level, src_gi), RU_c, src)]
    folded: list           # class indices handled by the kernel

# manifest columns:
#   0 slot  1 tr  2 tc  3 init  4 has_piece
#   5 uslot 6 blkr 7 blkr2 8 blkc 9 blkc2
#
# Measured step-cost facts (v5e, n=125k, AB_RESULTS/NOTES round 4): the
# grid runs ~2.5 us/piece-step and is bound by the fixed grid machinery +
# the 6 pipelined placement dots, NOT by the quad DMA bytes (parking
# span-1 pieces' unused high quads on a constant all-zero slot: no change)
# and NOT by dot count alone (branching the dead dots out with pl.when:
# 90.8 -> 108.8 ms — scalar branches kill Mosaic's pipelining; keep the
# kernel BRANCH-FREE).


def _class_tiles(iv: np.ndarray, T: int):
    """Touched front tiles and child ranges for one sorted coord row."""
    tiles = np.unique(iv // T)
    bounds = np.searchsorted(iv, np.stack([tiles * T, tiles * T + T],
                                          axis=1).ravel()).reshape(-1, 2)
    return tiles, bounds


def build_group_manifest(g, T: int = TILE, ru_min_frac: float = 0.5,
                         npiece: int = 1):
    """Build the tile manifest for one GroupPlan, or None if nothing folds.

    Folds a pair class iff RU_c >= ru_min_frac * RUp (zero-padding every
    child to the largest folded size must not dominate); remaining classes
    keep their XLA placement strategy.  ``npiece=2`` merges consecutive
    same-tile pieces into two-piece grid steps (see _pair_manifest).
    """
    R = g.R
    if not g.pairs:
        return None
    RUmax = max(pc.RU_c for pc in g.pairs)
    RUp = -(-RUmax // T) * T
    folded = [i for i, pc in enumerate(g.pairs)
              if pc.RU_c >= ru_min_frac * RUp or pc.RU_c >= 2 * T]
    if not folded:
        return None
    nbr = RUp // T
    nrt = -(-R // T)

    piece_by_tile: dict = {}
    uslices = []
    k0 = 0
    for ci in folded:
        pc = g.pairs[ci]
        src, dst, idx = g._pair_arrays[ci]
        uslices.append((ci, k0, (pc.src_level, pc.src_gi), pc.RU_c, src))
        for p in range(dst.size):
            iv = idx[p][idx[p] >= 0]
            if iv.size == 0:
                k0 += 1
                continue
            uslot = k0
            k0 += 1
            tiles, bounds = _class_tiles(iv, T)
            rms = {}
            for t, (a0, a1) in zip(tiles, bounds):
                blkr = a0 // T
                rm = np.full(T, -1, np.int32)
                rm[iv[a0:a1] - t * T] = np.arange(a0, a1) - blkr * T
                rms[int(t)] = (int(blkr), int(min(blkr + 1, nbr - 1)), rm)
            d = int(dst[p])
            for tr in tiles:
                br, br2, rm = rms[int(tr)]
                for tc in tiles[tiles <= tr]:
                    bc, bc2, cm = rms[int(tc)]
                    piece_by_tile.setdefault((d, int(tr), int(tc)), []) \
                        .append((uslot, br, br2, bc, bc2, rm, cm))

    man, rmaps, cmaps = [], [], []
    # tiles with NO pieces are never visited: the F input is aliased into
    # the output, so their assembled-A content survives untouched
    for slot in range(g.B):
        for tr in range(nrt):
            for tc in range(tr + 1):
                ps = piece_by_tile.get((slot, tr, tc), ())
                for i, (u, br, br2, bc, bc2, rm, cm) in enumerate(ps):
                    man.append([slot, tr, tc, 1 if i == 0 else 0, 1,
                                u, br, br2, bc, bc2])
                    rmaps.append(rm)
                    cmaps.append(cm)
    if not man:
        return None
    if npiece == 2:
        return _pair_manifest(man, rmaps, cmaps, T, RUp, k0, uslices, folded)
    return TileManifest(man=np.asarray(man, np.int32),
                        rowmap=np.stack(rmaps)[:, None, :],
                        colmap=np.stack(cmaps)[:, None, :],
                        RUp=RUp, nslots=k0, uslices=uslices, folded=folded)


def _pair_manifest(man, rmaps, cmaps, T, RUp, k0, uslices, folded):
    """Merge consecutive same-tile pieces into TWO-PIECE steps.

    At n=125k the pieces-per-visited-tile histogram is {1: 3.9k, 2: 7.8k,
    3: 210} — pairing cuts the grid 20,179 -> 12,160 steps while the
    measured cost is step-bound (~2 us/step fixed machinery). The second
    piece of an odd tail is DEAD: its row/col maps are all -1, so both its
    low and high one-hots are exactly zero and the 6 extra dots contribute
    exact zeros — branch-free (pl.when dead-dot skipping measured 90.8 ->
    108.8 ms; scalar branches kill Mosaic's pipelining).

    Two-piece manifest columns (14):
      0 slot  1 tr  2 tc  3 init
      4 u0  5 br0  6 br20  7 bc0  8 bc20
      9 u1 10 br1 11 br21 12 bc1 13 bc21
    """
    dead = np.full(T, -1, np.int32)
    man2, rm2, cm2 = [], [], []
    i = 0
    while i < len(man):
        a = man[i]
        if i + 1 < len(man) and man[i + 1][:3] == a[:3]:
            b = man[i + 1]
            man2.append(a[:4] + a[5:] + b[5:])
            rm2.append(np.stack([rmaps[i], rmaps[i + 1]]))
            cm2.append(np.stack([cmaps[i], cmaps[i + 1]]))
            i += 2
        else:
            man2.append(a[:4] + a[5:] + [0, 0, 0, 0, 0])
            rm2.append(np.stack([rmaps[i], dead]))
            cm2.append(np.stack([cmaps[i], dead]))
            i += 1
    return TileManifest(man=np.asarray(man2, np.int32),
                        rowmap=np.stack(rm2), colmap=np.stack(cm2),
                        RUp=RUp, nslots=k0, uslices=uslices, folded=folded)


def _kernel(man, rm_ref, cm_ref, fin, ull, ulh, uhl, uhh, fout):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    s = pl.program_id(0)
    T = fout.shape[-1]

    @pl.when(man[s, 3] == 1)
    def _():
        fout[...] = fin[...]

    @pl.when(man[s, 4] == 1)
    def _():
        rm = rm_ref[0, 0, :]
        cm = cm_ref[0, 0, :]
        iota = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
        prl = (rm[:, None] == iota).astype(jnp.float32)
        pcl = (cm[:, None] == iota).astype(jnp.float32)
        hp = jax.lax.Precision.HIGHEST

        def dot(a, b, tb=False):
            dn = (((1,), (1 if tb else 0,)), ((), ()))
            return jax.lax.dot_general(a, b, dn, precision=hp,
                                       preferred_element_type=jnp.float32)

        def clean(u):
            # child diagonal blocks carry uninitialized upper-triangle cells
            # when the child itself assembled lower-only; 0 * NaN = NaN in
            # the one-hot dot, so mask non-finite lanes to zero in VMEM
            v = u[0]
            return jnp.where(jnp.isfinite(v), v, 0.0)

        prh = ((rm[:, None] - T) == iota).astype(jnp.float32)
        pch = ((cm[:, None] - T) == iota).astype(jnp.float32)
        half_l = dot(prl, clean(ull)) + dot(prh, clean(uhl))
        half_h = dot(prl, clean(ulh)) + dot(prh, clean(uhh))
        fout[...] += (dot(half_l, pcl, tb=True)
                      + dot(half_h, pch, tb=True))[None]


def _kernel2(man, rm_ref, cm_ref, fin,
             all0, alh0, ahl0, ahh0, all1, alh1, ahl1, ahh1, fout):
    """Two pieces per grid step, 12 unconditional dots (see _pair_manifest).

    A dead second piece has all-(-1) maps: both of its one-hots are exactly
    zero, so its 6 dots add exact fp32 zeros — no scalar branches."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    s = pl.program_id(0)
    T = fout.shape[-1]

    @pl.when(man[s, 3] == 1)
    def _():
        fout[...] = fin[...]

    iota = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    hp = jax.lax.Precision.HIGHEST

    def dot(a, b, tb=False):
        dn = (((1,), (1 if tb else 0,)), ((), ()))
        return jax.lax.dot_general(a, b, dn, precision=hp,
                                   preferred_element_type=jnp.float32)

    def clean(u):
        v = u[0]
        return jnp.where(jnp.isfinite(v), v, 0.0)

    def piece(p, ull, ulh, uhl, uhh):
        rm = rm_ref[0, p, :]
        cm = cm_ref[0, p, :]
        prl = (rm[:, None] == iota).astype(jnp.float32)
        pcl = (cm[:, None] == iota).astype(jnp.float32)
        prh = ((rm[:, None] - T) == iota).astype(jnp.float32)
        pch = ((cm[:, None] - T) == iota).astype(jnp.float32)
        half_l = dot(prl, clean(ull)) + dot(prh, clean(uhl))
        half_h = dot(prl, clean(ulh)) + dot(prh, clean(uhh))
        return dot(half_l, pcl, tb=True) + dot(half_h, pch, tb=True)

    fout[...] += (piece(0, all0, alh0, ahl0, ahh0)
                  + piece(1, all1, alh1, ahl1, ahh1))[None]


def extend_add_tiles(F, Ucat, man, rowmap, colmap, interpret: bool = False):
    """F (B, R, R) fp32 + manifest-driven extend-add of Ucat (K, RUp, RUp).

    Returns F with every LOWER tile assembled; upper-tile contents are
    unspecified (no consumer reads them — see module docstring).
    ``man.shape[1]`` selects the variant: 10 = one piece per step,
    14 = two pieces per step (maps shaped (NS, 2, T))."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NS = man.shape[0]
    T = rowmap.shape[-1]
    # SMEM budget: Mosaic materializes each per-step map operand (rowmap /
    # colmap, and the scalar-prefetched man) as a single SMEM-resident
    # buffer for the whole call, and any ONE operand past the ~1 MB scalar
    # arena fails the compile — measured on v5e: a 3,583-step irregular
    # group's (3584, 1, 128) i32 rowmap = 1,835,008 B is rejected while
    # n=125k's largest (1,659-step, 851,968 B) compiles.  Chunk the grid so
    # every per-call map operand stays under the budget; sequential calls
    # chain through the F io-alias, and tile coordinates in ``man`` are
    # absolute so slicing the step axis is sound.
    smem_budget = int(os.environ.get("SSTPU_TILE_SMEM", str(832 * 1024)))
    per_step = rowmap.shape[1] * T * 4
    ns_max = max(8, smem_budget // per_step)
    if NS > ns_max:
        nchunk = -(-NS // ns_max)
        step = -(-NS // nchunk)
        for k0 in range(0, NS, step):
            k1 = min(NS, k0 + step)
            mc = man[k0:k1]
            # a chunk boundary can split one tile's (sorted, consecutive)
            # step run; on real TPU a revisited output block is NOT
            # reloaded from HBM at call start (the r2 io-alias lesson —
            # interpret mode hides this), so the split tile's first step
            # here must re-init from fin, which — through the io-alias —
            # already holds the previous chunk's partial accumulation.
            if isinstance(mc, np.ndarray):
                mc = mc.copy()
                mc[0, 3] = 1
            else:
                mc = mc.at[0, 3].set(1)   # traced jit arg (segment path)
            F = extend_add_tiles(F, Ucat, mc, rowmap[k0:k1],
                                 colmap[k0:k1], interpret=interpret)
        return F
    if man.shape[1] == 14:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NS,),
            in_specs=[
                pl.BlockSpec((1, 2, T), lambda s, m: (s, 0, 0)),
                pl.BlockSpec((1, 2, T), lambda s, m: (s, 0, 0)),
                pl.BlockSpec((1, T, T),
                             lambda s, m: (m[s, 0], m[s, 1], m[s, 2])),
                pl.BlockSpec((1, T, T),
                             lambda s, m: (m[s, 4], m[s, 5], m[s, 7])),
                pl.BlockSpec((1, T, T),
                             lambda s, m: (m[s, 4], m[s, 5], m[s, 8])),
                pl.BlockSpec((1, T, T),
                             lambda s, m: (m[s, 4], m[s, 6], m[s, 7])),
                pl.BlockSpec((1, T, T),
                             lambda s, m: (m[s, 4], m[s, 6], m[s, 8])),
                pl.BlockSpec((1, T, T),
                             lambda s, m: (m[s, 9], m[s, 10], m[s, 12])),
                pl.BlockSpec((1, T, T),
                             lambda s, m: (m[s, 9], m[s, 10], m[s, 13])),
                pl.BlockSpec((1, T, T),
                             lambda s, m: (m[s, 9], m[s, 11], m[s, 12])),
                pl.BlockSpec((1, T, T),
                             lambda s, m: (m[s, 9], m[s, 11], m[s, 13])),
            ],
            out_specs=pl.BlockSpec((1, T, T),
                                   lambda s, m: (m[s, 0], m[s, 1], m[s, 2])),
        )
        return pl.pallas_call(
            _kernel2, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(F.shape, jnp.float32),
            input_output_aliases={3: 0},
            interpret=interpret,
        )(man, rowmap, colmap, F,
          Ucat, Ucat, Ucat, Ucat, Ucat, Ucat, Ucat, Ucat)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NS,),
        in_specs=[
            pl.BlockSpec((1, 1, T), lambda s, m: (s, 0, 0)),
            pl.BlockSpec((1, 1, T), lambda s, m: (s, 0, 0)),
            pl.BlockSpec((1, T, T), lambda s, m: (m[s, 0], m[s, 1], m[s, 2])),
            pl.BlockSpec((1, T, T), lambda s, m: (m[s, 5], m[s, 6], m[s, 8])),
            pl.BlockSpec((1, T, T), lambda s, m: (m[s, 5], m[s, 6], m[s, 9])),
            pl.BlockSpec((1, T, T), lambda s, m: (m[s, 5], m[s, 7], m[s, 8])),
            pl.BlockSpec((1, T, T), lambda s, m: (m[s, 5], m[s, 7], m[s, 9])),
        ],
        out_specs=pl.BlockSpec((1, T, T),
                               lambda s, m: (m[s, 0], m[s, 1], m[s, 2])),
    )
    return pl.pallas_call(
        _kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(F.shape, jnp.float32),
        # donate F into the output: unvisited tiles keep their content in
        # place (alias keys count the scalar-prefetch operand: man=0,
        # rowmap=1, colmap=2, F=3)
        input_output_aliases={3: 0},
        interpret=interpret,
    )(man, rowmap, colmap, F, Ucat, Ucat, Ucat, Ucat)
