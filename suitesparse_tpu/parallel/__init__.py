"""Multi-chip / multi-host distribution of the factorization.

The reference has NO distributed backend (SURVEY §5.8 — its parallelism is
intra-node OpenMP/TBB/CUDA-streams); this subsystem is the new dimension the
TPU build adds: the elimination tree is the distribution structure
(subtree-per-device tree parallelism + row-sharded separator fronts), executed
with jax.sharding over a device Mesh.
"""

from .dist import dist_factorize_device, make_solver_mesh

__all__ = ["dist_factorize_device", "make_solver_mesh"]
