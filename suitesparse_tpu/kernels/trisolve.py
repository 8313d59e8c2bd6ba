"""Batched small triangular solve Pallas kernel (lanes = batch).

Reference analog: the dtrsv/dtrsm solves of ``t_cholmod_super_solve.c:89-173``.
Same motivation as kernels/potrf.py: XLA's ``triangular_solve`` on TPU is a
blocked While loop costing ~85 us per call regardless of size; the
level-scheduled solve issues one per (level, bucket) group twice per sweep,
so a whole solve drowned in control flow. This kernel runs the substitution
as C short VPU steps over (C, NR, B) tiles with the batch on the 128-lane
minor dimension.

forward  (L x = y):       x[k] = y[k]/L[k,k];  y -= L[:,k>.] x[k]
backward (L^T x = y):     x[k] = (y[k] - L[k+1:,k].y[k+1:]) / L[k,k]

L must be lower-triangular with a nonzero diagonal (identity on padding —
exactly what the solve plan's masking produces).
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = ["batched_trisolve", "trisolve_fits"]

_VMEM_BUDGET = 10e6


def _tile_lanes(C: int, NR: int, itemsize: int) -> int:
    """Largest lane-multiple batch tile fitting the VMEM budget (0 if none)."""
    per_lane = 2 * (C * C + 2 * C * NR) * itemsize
    return int(_VMEM_BUDGET // max(per_lane, 1)) // 128 * 128


def trisolve_fits(C: int, NR: int, dtype) -> bool:
    """True iff a (C, C) x (C, NR) batched trisolve tile fits in VMEM.

    NR-aware analog of ``solve_step.step_fits`` — callers must check this
    before routing to the Pallas kernel (multi-RHS solves can exceed the
    budget even when the factorization-time ``(C, C)`` tile fit)."""
    return _tile_lanes(C, NR, np.dtype(dtype).itemsize) >= 128


def _kernel(l_ref, y_ref, x_ref, *, C: int, NR: int, transpose: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    x_ref[:] = y_ref[:]
    rows = jax.lax.broadcasted_iota(jnp.int32, (C, 1, 1), 0)

    if not transpose:
        def body(k, _):
            piv = l_ref[pl.ds(k, 1), pl.ds(k, 1), :]       # (1, 1, B)
            xk = x_ref[pl.ds(k, 1), :, :] / piv            # (1, NR, B)
            colk = l_ref[:, pl.ds(k, 1), :]                # (C, 1, B)
            collo = jnp.where(rows > k, colk, 0.0)
            x_ref[:] = x_ref[:] - collo * xk
            x_ref[pl.ds(k, 1), :, :] = xk
            return 0

        jax.lax.fori_loop(0, C, body, 0)
    else:
        def body(i, _):
            k = C - 1 - i
            piv = l_ref[pl.ds(k, 1), pl.ds(k, 1), :]
            colk = l_ref[:, pl.ds(k, 1), :]
            collo = jnp.where(rows > k, colk, 0.0)         # (C, 1, B)
            dot = jnp.sum(collo * x_ref[:], axis=0, keepdims=True)
            xk = (x_ref[pl.ds(k, 1), :, :] - dot) / piv
            x_ref[pl.ds(k, 1), :, :] = xk
            return 0

        jax.lax.fori_loop(0, C, body, 0)


@functools.lru_cache(maxsize=None)
def _build(C: int, NR: int, B: int, BB: int, transpose: bool,
           dtype_name: str, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.dtype(dtype_name)
    nb = -(-B // BB)

    def call(l, y):
        return pl.pallas_call(
            functools.partial(_kernel, C=C, NR=NR, transpose=transpose),
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((C, C, BB), lambda b: (0, 0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, NR, BB), lambda b: (0, 0, b),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((C, NR, BB), lambda b: (0, 0, b),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, NR, nb * BB), dtype),
            interpret=interpret,
        )(l, y)

    return call


def batched_trisolve(L, Y, transpose: bool = False,
                     interpret: bool | None = None):
    """X solving L X = Y (or L^T X = Y): L (B, C, C) lower with nonzero
    diagonal, Y (B, C, NR)."""
    import jax
    import jax.numpy as jnp

    B, C, C2 = L.shape
    NR = Y.shape[2]
    assert C == C2 and Y.shape[:2] == (B, C)
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    dtype = L.dtype
    BB = _tile_lanes(C, NR, np.dtype(dtype).itemsize)
    if BB < 128:
        # tile too large for VMEM — degrade to the XLA solve rather than fail
        return jax.lax.linalg.triangular_solve(
            L, Y, left_side=True, lower=True, transpose_a=transpose)
    BB = min(1024, BB)
    nb = -(-B // BB)
    pad = nb * BB - B
    lt = jnp.transpose(L, (1, 2, 0))
    yt = jnp.transpose(Y, (1, 2, 0))
    if pad:
        eye = jnp.eye(C, dtype=dtype)[:, :, None]
        lt = jnp.pad(lt, ((0, 0), (0, 0), (0, pad)))
        lt = lt.at[:, :, B:].add(jnp.broadcast_to(eye, (C, C, pad)))
        yt = jnp.pad(yt, ((0, 0), (0, 0), (0, pad)))
    xt = _build(C, NR, B, BB, bool(transpose), str(dtype),
                bool(interpret))(lt, yt)
    return jnp.transpose(xt[:, :, :B], (2, 0, 1))
