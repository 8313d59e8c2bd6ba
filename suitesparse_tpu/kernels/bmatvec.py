"""Lane-batched matvec kernel for the multifrontal solve sweeps.

The 1-RHS solve is bandwidth-bound on panel reads, but XLA's batched
matvec ``(B, I, J) @ (B, J, 1)`` runs at ~37 GB/s on this v5e (measured,
demos/hbm_probe.py: the (1024, 64, 64) shape) versus 122-171 GB/s for
plain matvecs/streams — lane padding of the J-minor operand (J = C of a
supernode group, 16-64 for the leaf half of the tree) wastes 2-8x of
every vector register.

This kernel stores the panels TRANSPOSED, lanes = batch: ``Mt (I, J, B)``
with B on the 128-lane minor dimension, so every vreg is fully occupied
regardless of C, and the panel streams at full rate. Per grid step it
loads one ``(I_blk, J, 128)`` panel block and reduces over J (sublanes)
with the X block resident:

    forward   Z[i, r, b] = sum_j Mt[i, j, b] * X[j, r, b]
    transpose Z[j, r, b] = sum_i Mt[i, j, b] * X[i, r, b]

The same stored panel serves both solve sweeps (forward applies M, the
backward sweep applies M^T), halving the solve-copy footprint: L21t is
read no-transpose in the forward substitution (v = L21 @ xc) and
transposed in the back-substitution (yc -= L21^T @ xb); Winv likewise.

Reference analog: the dense dtrsv/dgemv pair per supernode in
``CHOLMOD/Supernodal/t_cholmod_super_solve.c:89-173`` — here the trisolve
is already an inverse-panel matmul (SSTPU_SOLVE_INV), and this kernel is
the memory-layout half of the redesign.
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = ["bmatvec_t", "bmv_fits", "bmv_pad"]

_LANES = 128
_VMEM_BLOCK = 2 * 1024 * 1024   # target panel-block bytes per grid step


def _geom(I: int, J: int, B: int, itemsize: int):
    """(ib, bb): panel rows and lanes per grid step. Each step's panel
    block targets ~_VMEM_BLOCK bytes so the grid is bandwidth-bound, not
    step-bound (the ~2 us/step DMA floor would cap tiny C*C blocks at
    tens of GB/s). Small panels widen the LANE block (bb up to 4096,
    Mosaic tiles minors > 128 internally); big panels block rows instead.
    Depends on I/B only through "fits one block" / "fewer lanes than the
    target" so bmv_pad and _build always agree on padded shapes."""
    rows = _VMEM_BLOCK // max(1, J * _LANES * itemsize)
    rows = max(8, rows // 8 * 8)
    if I > rows:
        return rows, _LANES
    ib = -(-I // 8) * 8
    bb = _VMEM_BLOCK // max(1, ib * J * itemsize)
    bb = max(_LANES, min(4096, bb // _LANES * _LANES))
    bb = min(bb, -(-B // _LANES) * _LANES)
    return ib, bb


def bmv_fits(I: int, J: int, B: int, NR: int, itemsize: int = 4) -> bool:
    """VMEM feasibility: one panel block + X + Z + product scratch."""
    ib, bb = _geom(max(I, 8), J, B, itemsize)
    blk = ib * J * bb * itemsize
    xz = (J + ib) * max(NR, 8) * bb * itemsize
    # product intermediate is another block; x2 for double buffering
    return 2 * blk + blk + xz < 96 * 1024 * 1024


def bmv_pad(I: int, J: int, B: int, itemsize: int = 4):
    """(I_pad, B_pad) the caller must pre-pad panels to (zero fill)."""
    ib, bb = _geom(max(I, 8), J, B, itemsize)
    return -(-max(I, 8) // ib) * ib, -(-B // bb) * bb


def bmv_group_geom(panels, B: int, itemsize: int = 4):
    """Shared geometry for the panels of ONE solve group, whose kernels
    exchange lane-major vectors and therefore must agree on the lane
    block: ([I_pad per panel], B_pad, bb = min lane block)."""
    geo = [_geom(max(I, 8), J, B, itemsize) for I, J in panels]
    bb = min(g[1] for g in geo)
    ipads = [-(-max(I, 8) // g[0]) * g[0]
             for (I, J), g in zip(panels, geo)]
    return ipads, -(-B // bb) * bb, bb


def _fwd_kernel(mt, xt, zt, *, NR):
    import jax.numpy as jnp

    for r in range(NR):
        # reduce over J = the sublane axis of the panel block
        acc = jnp.sum(mt[:, :, :] * xt[:, r, :][None, :, :], axis=1)
        zt[:, r, :] = acc


def _bwd_kernel(mt, xt, zt, *, NR):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(1) == 0)
    def _init():
        zt[:] = jnp.zeros_like(zt)

    for r in range(NR):
        # reduce over I = the row-block axis; out block revisited per I step
        acc = jnp.sum(mt[:, :, :] * xt[:, r, :][:, None, :], axis=0)
        zt[:, r, :] = zt[:, r, :] + acc


@functools.lru_cache(maxsize=None)
def _build(I: int, J: int, Bp: int, NR: int, transpose: bool, bb: int,
           dtype_name: str, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.dtype(dtype_name)
    ib = _geom(I, J, Bp, dtype.itemsize)[0]
    ni, nb = I // ib, Bp // bb
    out_rows = J if transpose else I

    if transpose:
        kern = functools.partial(_bwd_kernel, NR=NR)
        # X rides the I axis; Z (J, NR, -) accumulates across I steps
        x_spec = pl.BlockSpec((ib, NR, bb), lambda b, i: (i, 0, b),
                              memory_space=pltpu.VMEM)
        z_spec = pl.BlockSpec((J, NR, bb), lambda b, i: (0, 0, b),
                              memory_space=pltpu.VMEM)
    else:
        kern = functools.partial(_fwd_kernel, NR=NR)
        x_spec = pl.BlockSpec((J, NR, bb), lambda b, i: (0, 0, b),
                              memory_space=pltpu.VMEM)
        z_spec = pl.BlockSpec((ib, NR, bb), lambda b, i: (i, 0, b),
                              memory_space=pltpu.VMEM)

    def call(mt, xt):
        return pl.pallas_call(
            kern,
            grid=(nb, ni),
            in_specs=[
                pl.BlockSpec((ib, J, bb), lambda b, i: (i, 0, b),
                             memory_space=pltpu.VMEM),
                x_spec,
            ],
            out_specs=z_spec,
            out_shape=jax.ShapeDtypeStruct((out_rows, NR, Bp), dtype),
            interpret=interpret,
        )(mt, xt)

    return call


def bmatvec_t(Mt, Xt, transpose: bool = False,
              interpret: bool | None = None, bb: int | None = None):
    """Batched matvec on lane-major panels.

    Mt (I, J, B): panels with batch on the minor (lane) axis, I padded
    to the row-block multiple and B padded to the lane block (see
    bmv_pad / bmv_group_geom) — zero fill. Xt (J, NR, B) forward /
    (I, NR, B) transpose. Returns Zt (I, NR, B) forward / (J, NR, B)
    transpose. NR must be small (the latency path). ``bb`` is the lane
    block; panels sharing vectors must pass the group's shared bb.
    """
    import jax

    I, J, Bp = Mt.shape
    NR = Xt.shape[1]
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    if bb is None:
        bb = _geom(I, J, Bp, Mt.dtype.itemsize)[1]
    assert Bp % bb == 0 and I % _geom(I, J, Bp, Mt.dtype.itemsize)[0] == 0, \
        (I, J, Bp, bb)
    assert Xt.shape == ((I, NR, Bp) if transpose else (J, NR, Bp))
    return _build(I, J, Bp, NR, bool(transpose), int(bb), str(Mt.dtype),
                  bool(interpret))(Mt, Xt)
