"""Fused per-group solve-step kernels for the multifrontal solve.

Reference analog: one supernode's share of ``t_cholmod_super_solve.c`` —
dtrsv + dgemv (forward), dgemv^T + dtrsv^T (backward) — fused into single
VPU kernels with the batch on the 128-lane minor dimension. The solve's cost
at scale is pure critical-path op latency (~160 sequential group steps), so
fusing each step's 3 device ops into one kernel attacks the chain directly.

forward:   xc = L11^{-1} y;           v = wb + L21 @ xc     (carried upward)
backward:  xc = L11^{-T} (y - L21^T @ xb)

Shapes per group (lanes = batch): L11 (C, C, B), L21 (RU, C, B),
y/xc (C, NR, B), wb/v/xb (RU, NR, B).
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = ["solve_step_fwd", "solve_step_bwd", "step_fits"]


def _fwd_kernel(l11, l21, y, wb, xc, v, *, C, RU, NR):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    xc[:] = y[:]
    v[:] = wb[:]
    rows = jax.lax.broadcasted_iota(jnp.int32, (C, 1, 1), 0)

    def body(k, _):
        piv = l11[pl.ds(k, 1), pl.ds(k, 1), :]          # (1, 1, B)
        xk = xc[pl.ds(k, 1), :, :] / piv                # (1, NR, B)
        colk = l11[:, pl.ds(k, 1), :]                   # (C, 1, B)
        collo = jnp.where(rows > k, colk, 0.0)
        xc[:] = xc[:] - collo * xk
        xc[pl.ds(k, 1), :, :] = xk
        v[:] = v[:] + l21[:, pl.ds(k, 1), :] * xk
        return 0

    jax.lax.fori_loop(0, C, body, 0)


def _bwd_kernel(l11, l21, y, xb, xc, *, C, RU, NR):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    xc[:] = y[:]
    rows = jax.lax.broadcasted_iota(jnp.int32, (C, 1, 1), 0)

    def body(i, _):
        k = C - 1 - i
        colk = l11[:, pl.ds(k, 1), :]
        collo = jnp.where(rows > k, colk, 0.0)
        dot11 = jnp.sum(collo * xc[:], axis=0, keepdims=True)     # (1,NR,B)
        dot21 = jnp.sum(l21[:, pl.ds(k, 1), :] * xb[:], axis=0,
                        keepdims=True)
        piv = l11[pl.ds(k, 1), pl.ds(k, 1), :]
        xc[pl.ds(k, 1), :, :] = (xc[pl.ds(k, 1), :, :] - dot11
                                 - dot21) / piv
        return 0

    jax.lax.fori_loop(0, C, body, 0)


def step_fits(C: int, RU: int, NR: int, itemsize: int = 4) -> bool:
    return _bb(C, RU, NR, itemsize) >= 128


def _bb(C, RU, NR, itemsize=4):
    # in + out refs, times 2 for Mosaic double buffering: keep within ~half
    # the 16MB scoped-vmem limit (headroom measured necessary at scale)
    per_lane = 2 * (C * C + max(RU, 1) * C
                    + 2 * (C + max(RU, 1)) * NR) * itemsize
    return min(1024, int(7e6 // max(per_lane, 1)) // 128 * 128)


@functools.lru_cache(maxsize=None)
def _build(C, RU, NR, B, BB, fwd, dtype_name, interpret):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.dtype(dtype_name)
    nb = -(-B // BB)
    RU1 = max(RU, 1)
    spec = lambda s: pl.BlockSpec(s + (BB,), lambda b: (0, 0, b),
                                  memory_space=pltpu.VMEM)
    if fwd:
        def call(l11, l21, y, wb):
            return pl.pallas_call(
                functools.partial(_fwd_kernel, C=C, RU=RU, NR=NR),
                grid=(nb,),
                in_specs=[spec((C, C)), spec((RU1, C)), spec((C, NR)),
                          spec((RU1, NR))],
                out_specs=[spec((C, NR)), spec((RU1, NR))],
                out_shape=[jax.ShapeDtypeStruct((C, NR, nb * BB), dtype),
                           jax.ShapeDtypeStruct((RU1, NR, nb * BB), dtype)],
                interpret=interpret,
            )(l11, l21, y, wb)
    else:
        def call(l11, l21, y, xb):
            return pl.pallas_call(
                functools.partial(_bwd_kernel, C=C, RU=RU, NR=NR),
                grid=(nb,),
                in_specs=[spec((C, C)), spec((RU1, C)), spec((C, NR)),
                          spec((RU1, NR))],
                out_specs=spec((C, NR)),
                out_shape=jax.ShapeDtypeStruct((C, NR, nb * BB), dtype),
                interpret=interpret,
            )(l11, l21, y, xb)
    return call


def _to_lanes(x, pad):
    import jax.numpy as jnp
    t = jnp.transpose(x, (1, 2, 0))
    if pad:
        t = jnp.pad(t, ((0, 0), (0, 0), (0, pad)))
    return t


def solve_step_fwd(L11, L21, Y, WB, interpret: bool | None = None):
    """(xc, v): xc = L11^{-1} Y, v = WB + L21 @ xc. L11 (B,C,C) lower with
    nonzero diag (identity padding), L21 (B,RU,C), Y (B,C,NR), WB (B,RU,NR)."""
    import jax
    import jax.numpy as jnp

    B, C, _ = L11.shape
    RU = L21.shape[1]
    NR = Y.shape[2]
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    itemsize = np.dtype(L11.dtype).itemsize
    BB = _bb(C, RU, NR, itemsize)
    nb = -(-B // BB)
    pad = nb * BB - B
    l11 = _to_lanes(L11, pad)
    if pad:  # identity on padded lanes keeps the divisions finite
        eye = jnp.eye(C, dtype=L11.dtype)[:, :, None]
        l11 = l11.at[:, :, B:].add(jnp.broadcast_to(eye, (C, C, pad)))
    l21 = _to_lanes(L21 if RU else jnp.zeros((B, 1, C), L11.dtype), pad)
    y = _to_lanes(Y, pad)
    wb = _to_lanes(WB if RU else jnp.zeros((B, 1, NR), L11.dtype), pad)
    xc, v = _build(C, RU, NR, B, BB, True, str(L11.dtype),
                   bool(interpret))(l11, l21, y, wb)
    out_xc = jnp.transpose(xc[:, :, :B], (2, 0, 1))
    out_v = jnp.transpose(v[:, :, :B], (2, 0, 1)) if RU else None
    return out_xc, out_v


def solve_step_bwd(L11, L21, Y, XB, interpret: bool | None = None):
    """xc = L11^{-T} (Y - L21^T @ XB)."""
    import jax
    import jax.numpy as jnp

    B, C, _ = L11.shape
    RU = L21.shape[1]
    NR = Y.shape[2]
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    itemsize = np.dtype(L11.dtype).itemsize
    BB = _bb(C, RU, NR, itemsize)
    nb = -(-B // BB)
    pad = nb * BB - B
    l11 = _to_lanes(L11, pad)
    if pad:
        eye = jnp.eye(C, dtype=L11.dtype)[:, :, None]
        l11 = l11.at[:, :, B:].add(jnp.broadcast_to(eye, (C, C, pad)))
    l21 = _to_lanes(L21 if RU else jnp.zeros((B, 1, C), L11.dtype), pad)
    y = _to_lanes(Y, pad)
    xb = _to_lanes(XB if RU else jnp.zeros((B, 1, NR), L11.dtype), pad)
    xc = _build(C, RU, NR, B, BB, False, str(L11.dtype),
                bool(interpret))(l11, l21, y, xb)
    return jnp.transpose(xc[:, :, :B], (2, 0, 1))
