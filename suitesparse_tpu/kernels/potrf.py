"""Batched Cholesky (potrf) Pallas kernel for supernodal diagonal blocks.

Reference analog: the dpotrf calls of ``t_cholmod_super_numeric.c:864`` (and
the GPU block-hybrid variant ``t_cholmod_gpu.c:876-964``). The supernodal
plan produces batches of C×C diagonal blocks with C ≤ 128 (bucket ladder);
XLA's general `cholesky` lowers to a blocked while-loop algorithm tuned for
LARGE single matrices — for many small tiles an unblocked in-VMEM kernel with
one grid step per tile avoids that control-flow overhead.

The kernel runs the classic unblocked right-looking update: per column k,
scale by rsqrt of the pivot and subtract the rank-1 outer product from the
trailing submatrix — all VPU work on an in-VMEM tile (C ≤ 128 ⇒ the whole
tile sits in registers/VMEM comfortably).

Input tiles must be "prepared" like the device plan prepares them: symmetric
(full, not just lower) with unit diagonal on padded rows/cols — every tile is
then positive definite and the kernel needs no pivoting logic. Output is
lower-triangular with zeros above the diagonal.
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = ["batched_potrf"]


def _kernel(x_ref, o_ref, *, C: int):
    import jax
    import jax.numpy as jnp

    X = x_ref[0]  # (C, C) tile
    rows = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)

    rk = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)

    def body(k, X):
        # masked extraction instead of dynamic_slice (Mosaic-lowerable)
        colsel = (cols == k)
        pivot = jnp.sum(jnp.where(colsel & (rows == k), X, 0.0))
        inv = jax.lax.rsqrt(pivot)
        col = jnp.sum(jnp.where(colsel, X, 0.0), axis=1, keepdims=True) * inv
        # rank-1 update touches only the trailing submatrix
        col_lo = jnp.where(rk > k, col, 0.0)
        X = X - jnp.dot(col_lo, col_lo.T, preferred_element_type=X.dtype)
        # write column k: scaled entries at rows >= k, zeros above
        colw = jnp.where(rk >= k, col, 0.0)
        X = jnp.where(colsel, colw, X)
        return X

    X = jax.lax.fori_loop(0, C, body, X)
    o_ref[0] = jnp.where(rows >= cols, X, 0.0)


@functools.lru_cache(maxsize=None)
def _build(C: int, dtype_name: str, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.dtype(dtype_name)

    def call(x):
        B = x.shape[0]
        return pl.pallas_call(
            functools.partial(_kernel, C=C),
            grid=(B,),
            in_specs=[pl.BlockSpec((1, C, C), lambda b: (b, 0, 0))],
            out_specs=pl.BlockSpec((1, C, C), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(x.shape, dtype),
            interpret=interpret,
        )(x)

    return jax.jit(call)


def batched_potrf(x, interpret: bool | None = None):
    """Cholesky of a batch [B, C, C] of PREPARED SPD tiles (see module doc).

    Uses the Pallas kernel on TPU (or interpreter elsewhere when forced);
    caller is responsible for choosing this vs ``jnp.linalg.cholesky``."""
    import jax

    B, C, C2 = x.shape
    assert C == C2
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    fn = _build(C, str(x.dtype), bool(interpret))
    return fn(x)
