"""Streaming panel matvec for the big-front solve levels.

The top levels of the solve sweep apply huge panels (R, C up to ~4k) to
one or a few RHS vectors with tiny batch (B = 1..12 supernodes per
group).  XLA lowers the batched matvec ``(B, R, C) @ (B, C, 1)`` to an
MXU dot with N=1 — 127/128 output lanes idle — and the measured stream
rate lands far below the chip's ~171 GB/s fp32 axpy roof.

This kernel computes ``z = M^T @ x`` for a panel stored (K, N) with K on
the SUBLANE axis: per grid step it loads one (Kblk, Nblk) block, forms
``m * x[k]`` (x broadcast along lanes) and reduces over K — a pure
sublane reduction, VPU-native, no cross-lane shuffles.  The output block
is revisited across K steps (accumulation; init at k==0 — the pattern
validated on v5e by kernels/extend_add_tiles.py).

Both solve sweeps use the SAME kernel: the caller stores the panel twice
(W2t = W2^T for the forward ``[xc; v] = W2 @ yc`` as ``W2t^T @ yc``, and
W2 itself for the backward ``xc = W2^T [yf; -xb]``), trading 2x
factor-copy device memory for sublane-reduce in both directions.

Reference analog: the dense dgemv per supernode in
``CHOLMOD/Supernodal/t_cholmod_super_solve.c:89-173``.
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = ["pmatvec_t", "pmv_pad", "pmv_fits"]

_KBLK = 512            # sublane-axis block (reduction axis)
_NBLK = 1024           # lane-axis block (output axis)


def _geom(K: int, N: int, itemsize: int):
    kb = min(_KBLK, -(-max(K, 8) // 8) * 8)
    nb = min(_NBLK, -(-max(N, 128) // 128) * 128)
    # keep a block under ~2 MB so the grid pipelines on DMA
    while kb * nb * itemsize > 2 * 1024 * 1024 and kb > 8:
        kb //= 2
    return kb, nb


def pmv_pad(K: int, N: int, itemsize: int = 4):
    """(Kpad, Npad) the caller must zero-pad panels to."""
    kb, nb = _geom(K, N, itemsize)
    return -(-max(K, 8) // kb) * kb, -(-max(N, 128) // nb) * nb


def pmv_fits(K: int, N: int, NR: int, itemsize: int = 4) -> bool:
    kb, nb = _geom(K, N, itemsize)
    nr8 = -(-max(NR, 1) // 8) * 8
    blk = kb * nb * itemsize
    xz = (kb * nr8 + nr8 * nb) * itemsize
    return 3 * blk + 2 * xz < 96 * 1024 * 1024


def _kernel(m, x, z, *, NR):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(len(_GRID_AXES) - 1) == 0)
    def _init():
        z[:] = jnp.zeros_like(z)

    for r in range(NR):
        # (Kblk, Nblk) * (Kblk, 1) summed over K (sublanes)
        acc = jnp.sum(m[0] * x[0, :, r][:, None], axis=0)
        z[0, r, :] = z[0, r, :] + acc


_GRID_AXES = ("b", "n", "k")


@functools.lru_cache(maxsize=None)
def _build(B: int, Kp: int, Np: int, NR: int, dtype_name: str,
           interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.dtype(dtype_name)
    kb, nb = _geom(Kp, Np, dtype.itemsize)
    nk, nn = Kp // kb, Np // nb
    nr8 = -(-NR // 8) * 8

    def call(m, x):
        return pl.pallas_call(
            functools.partial(_kernel, NR=NR),
            grid=(B, nn, nk),
            in_specs=[
                pl.BlockSpec((1, kb, nb), lambda b, n, k: (b, k, n),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kb, nr8), lambda b, n, k: (b, k, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, nr8, nb), lambda b, n, k: (b, 0, n),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, nr8, Np), dtype),
            interpret=interpret,
        )(m, x)

    return call


def pmatvec_t(M, X, interpret: bool | None = None):
    """z[b] = M[b]^T @ X[b] for panels M (B, Kpad, Npad) and vectors
    X (B, Kpad, NR) with NR small; returns Z (B, NRpad8, Npad) — caller
    slices [:, :NR, :N].  Pads per pmv_pad (zero fill); X's NR axis is
    padded in-call."""
    import jax
    import jax.numpy as jnp

    B, Kp, Np = M.shape
    NR = X.shape[2]
    assert X.shape == (B, Kp, NR)
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    kb, nb = _geom(Kp, Np, M.dtype.itemsize)
    assert Kp % kb == 0 and Np % nb == 0, (Kp, Np, kb, nb)
    nr8 = -(-NR // 8) * 8
    if nr8 > NR:
        X = jnp.pad(X, ((0, 0), (0, 0), (0, nr8 - NR)))
    return _build(B, Kp, Np, NR, str(M.dtype), bool(interpret))(M, X)
