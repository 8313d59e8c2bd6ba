"""Batched Cholesky panel factorization (potrf + trsm) Pallas kernel.

Reference analog: the dpotrf + dtrsm pair of ``t_cholmod_super_numeric.c``
(:864 potrf on the nscol x nscol diagonal block, :997 trsm on the
(nsrow-nscol) x nscol subdiagonal panel) and the GPU block-hybrid variant
(``t_cholmod_gpu.c:876-964``).

Why a kernel: XLA's ``cholesky``/``triangular_solve`` lower to blocked
While-loop algorithms tuned for one LARGE matrix; at this library's shapes
(dozens of groups of B x C x C tiles with small C), each call costs ~85 us of
control-flow overhead — measured 55% of the whole factorization program.

Layout: the batch is the MINOR (128-lane) dimension — tiles are processed as
(C, C, B) / (RU, C, B) so every VPU op runs B lanes wide (the v1 kernel's
mistake was lanes = front columns, wasting 128 - C lanes). Per column k:

  potrf:  colw = X[:,k,:] * rsqrt(X[k,k,:]), masked to rows >= k; write;
          X -= collo * collo^T (outer product only touches rows/cols > k)
  trsm :  Y[:,k,:] *= rsqrt-pivot; Y -= Y[:,k,:] * collo^T (right-looking)

Inputs must be "prepared" like the device plan prepares them: F11 symmetric
full with identity on padded rows/cols (every tile then factors without
pivoting). Outputs: L11 lower-triangular (zeros above), L21 = F21 L11^{-T}.
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = ["batched_potrf", "batched_potrf_trsm", "lane_block", "kernel_fits"]


def lane_block(C: int, RU: int, itemsize: int = 4,
               B: int | None = None) -> int | None:
    """Largest 128-multiple batch block whose in+out VMEM fits the ~16MB
    scoped budget; None if even 128 lanes do not fit (caller must use the
    XLA path).

    Mosaic double-buffers the block refs only when the grid has more than
    one step — a multi-block launch needs 2x the single-block footprint
    (measured: C=16, RU=32, BB=1024, nb=2 allocates 16.04M and trips the
    16.00M scoped limit). When ``B`` is given, the returned block accounts
    for whether it forces a multi-step grid."""
    per_lane_1 = 2 * (C * C + max(RU, 1) * C) * itemsize    # in+out refs
    budget = 15.2e6
    # headroom: Mosaic materializes in-kernel temporaries — measured
    # 0.78x the refs at C=16/RU=128/BB=512 (16.82M total vs the 16.00M
    # scoped limit, fem_148k capacity run), so budget 2x refs for the
    # single-step grid; a multi-step grid additionally double-buffers the
    # refs (measured: C=16 RU=32 BB=896 nb=2 allocated 16.70M)
    bb1 = int(budget // max(per_lane_1 * 2, 1)) // 128 * 128
    bb2 = int(budget // max(3 * per_lane_1, 1)) // 128 * 128
    bb1 = min(1024, bb1)
    bb2 = min(1024, bb2)
    if B is not None and B <= bb1:
        return bb1 if bb1 >= 128 else None                  # nb == 1
    return bb2 if bb2 >= 128 else None


def kernel_fits(C: int, RU: int, itemsize: int = 4,
                B: int | None = None) -> bool:
    return lane_block(C, RU, itemsize, B) is not None


def _kernel(x11_ref, x21_ref, l11_ref, l21_ref, *, C: int, RU: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    l11_ref[:] = x11_ref[:]
    if RU > 0:
        l21_ref[:] = x21_ref[:]
    rows = jax.lax.broadcasted_iota(jnp.int32, (C, 1, 1), 0)

    def body(k, _):
        piv = l11_ref[pl.ds(k, 1), pl.ds(k, 1), :]        # (1, 1, B)
        inv = jax.lax.rsqrt(piv)
        colk = l11_ref[:, pl.ds(k, 1), :]                 # (C, 1, B)
        colw = jnp.where(rows >= k, colk * inv, 0.0)
        l11_ref[:, pl.ds(k, 1), :] = colw
        collo = jnp.where(rows > k, colw, 0.0)            # (C, 1, B)
        collo_t = jnp.swapaxes(collo, 0, 1)               # (1, C, B)
        l11_ref[:] = l11_ref[:] - collo * collo_t
        if RU > 0:
            u21k = l21_ref[:, pl.ds(k, 1), :] * inv       # (RU, 1, B)
            l21_ref[:, pl.ds(k, 1), :] = u21k
            l21_ref[:] = l21_ref[:] - u21k * collo_t
        return 0

    jax.lax.fori_loop(0, C, body, 0)


@functools.lru_cache(maxsize=None)
def _build(C: int, RU: int, B: int, BB: int, dtype_name: str,
           interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.dtype(dtype_name)
    nb = -(-B // BB)
    RU1 = max(RU, 1)

    def call(x11, x21):
        return pl.pallas_call(
            functools.partial(_kernel, C=C, RU=RU),
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((C, C, BB), lambda b: (0, 0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((RU1, C, BB), lambda b: (0, 0, b),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((C, C, BB), lambda b: (0, 0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((RU1, C, BB), lambda b: (0, 0, b),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((C, C, nb * BB), dtype),
                jax.ShapeDtypeStruct((RU1, C, nb * BB), dtype),
            ],
            interpret=interpret,
        )(x11, x21)

    return call


def batched_potrf_trsm(f11, f21=None, interpret: bool | None = None):
    """(L11, L21) for a batch of prepared SPD panels.

    f11: (B, C, C) symmetric full tiles (identity on padding);
    f21: (B, RU, C) subdiagonal panels or None.
    Returns L11 (B, C, C) lower-triangular and L21 (B, RU, C) with
    L21 L11^T = F21."""
    import jax
    import jax.numpy as jnp

    B, C, C2 = f11.shape
    assert C == C2
    RU = 0 if f21 is None else f21.shape[1]
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    dtype = f11.dtype
    BB = lane_block(C, RU, np.dtype(dtype).itemsize, B)
    if BB is None:
        # too large for VMEM — degrade to XLA rather than fail
        L11 = jnp.linalg.cholesky(f11)
        if f21 is None:
            return L11, None
        L21 = jax.lax.linalg.triangular_solve(
            L11, f21, left_side=False, lower=True, transpose_a=True)
        return L11, L21
    nb = -(-B // BB)
    pad = nb * BB - B
    x11 = jnp.transpose(f11, (1, 2, 0))
    x21 = (jnp.transpose(f21, (1, 2, 0)) if RU > 0
           else jnp.zeros((1, C, B), dtype))
    if pad:
        x11 = jnp.pad(x11, ((0, 0), (0, 0), (0, pad)))
        # padded lanes factor an identity tile (keeps lanes finite)
        eye = jnp.eye(C, dtype=dtype)[:, :, None]
        x11 = x11.at[:, :, B:].add(jnp.broadcast_to(eye, (C, C, pad)))
        x21 = jnp.pad(x21, ((0, 0), (0, 0), (0, pad)))
    l11t, l21t = _build(C, RU, B, BB, str(dtype), bool(interpret))(x11, x21)
    L11 = jnp.transpose(l11t[:, :, :B], (2, 0, 1))
    L21 = (jnp.transpose(l21t[:, :, :B], (2, 0, 1)) if RU > 0 else None)
    return L11, L21


def batched_potrf(x, interpret: bool | None = None):
    """Cholesky of a batch [B, C, C] of PREPARED SPD tiles (see module doc)."""
    L11, _ = batched_potrf_trsm(x, None, interpret=interpret)
    return L11
