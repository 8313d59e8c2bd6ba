"""Pallas TPU kernels for the hot dense panel ops.

The reference's analogous layer is its BLAS/LAPACK bindings plus the GPU
"uberkernel" machinery (``GPUQREngine/Include/Kernel/uberKernel.cu``,
``CHOLMOD/GPU/t_cholmod_gpu.c``). Here the panel ops are Pallas kernels tuned
for the supernodal bucket shapes; every kernel has an XLA fallback and is
validated against it in tests.
"""

from .potrf import batched_potrf

__all__ = ["batched_potrf"]
