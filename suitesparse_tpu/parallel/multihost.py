"""Multi-host (multi-process) execution entry points.

The reference has NO distributed backend (SURVEY §5.8: OpenMP/TBB/CUDA
intra-node only); this is the dimension the TPU build adds. The single-
controller JAX model keeps the solver code identical across 1 chip, 1 host
with N chips, and M hosts: the SAME ``dist_factorize_device`` program runs
over a global mesh, with GSPMD inserting ICI/DCN collectives around the
sharding constraints (tree-batched fronts over 'tree', separator-front rows
over 'panel').

Multi-host bring-up recipe (per host):

    import suitesparse_tpu.parallel.multihost as mh
    mh.initialize(coordinator_address="host0:1234",
                  num_processes=M, process_id=i)      # jax.distributed
    mesh = mh.global_solver_mesh()                    # all M*N chips
    F = mh.factorize(A, S, mesh)                      # same A on every host

Every process must call with the same A/S (the symbolic plan is host-
replicated — it is tiny next to the numeric data). Matrix values are
device_put with a fully-replicated NamedSharding, which is multi-process
legal; outputs are global arrays sharded per the plan's constraints.
"""

from __future__ import annotations

from ..config import Config, DEFAULT
from ..sparse import CSC
from ..symbolic.supernodes import SupernodalSymbolic
from . import dist

__all__ = ["initialize", "global_solver_mesh", "factorize"]


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None, **kw) -> None:
    """jax.distributed.initialize wrapper (no-op if already initialized or
    single-process)."""
    import jax

    if num_processes in (None, 1):
        return
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id, **kw)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def global_solver_mesh(tree: int | None = None, panel: int | None = None):
    """('tree', 'panel') mesh over ALL global devices (every process's chips)."""
    import jax

    return dist.make_solver_mesh(jax.devices(), tree=tree, panel=panel)


def factorize(A: CSC, S: SupernodalSymbolic, mesh=None,
              config: Config = DEFAULT):
    """Globally-sharded supernodal factorization (every process participates)."""
    if mesh is None:
        mesh = global_solver_mesh()
    return dist.dist_factorize_device(A, S, mesh, config)
