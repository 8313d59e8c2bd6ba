"""Multi-host (multi-process) execution: the 2-level (host, chip) topology.

The reference has NO distributed backend (SURVEY §5.8: OpenMP/TBB/CUDA
intra-node only — ``spqr_parallel.cpp:8-94`` is a single-node TBB task
tree); this is the dimension the TPU build adds.  The single-controller JAX
model keeps the solver code identical across 1 chip, 1 host with N chips,
and M hosts: the SAME jitted program runs over a global ('host', 'chip')
mesh, and the schedule is cut so that traffic matches the physical fabric:

  * subtree-per-CHIP at a fine flop grain — leaf extend-adds are
    device-local, ZERO communication;
  * subtree-per-HOST at a coarse grain — each host's MID crown assembles
    its leaf halos with a ``psum`` over the intra-host 'chip' axis (ICI)
    and factors chip-replicated, host-sharded;
  * the global separator crown assembles with ONE global psum — the only
    collective whose bytes cross hosts (DCN) — and factors with front rows
    panel-sharded over the whole fleet.

See ``schedule.partition_tree_topology`` (the 2-level cut),
``dist2._make_v3_fn`` (the program), and ``schedule.model_scaling`` (the
modeled strong-scaling table in docs/MULTICHIP.md).

Multi-host bring-up recipe (per host):

    import suitesparse_tpu.parallel.multihost as mh
    mh.initialize(coordinator_address="host0:1234",
                  num_processes=M, process_id=i)      # jax.distributed
    mesh = mh.host_chip_mesh()                        # all M*N chips
    F = mh.factorize(A, S, mesh)                      # same A on every host
    x = mh.solve(F, b)

Every process must call with the same A/S (the symbolic plan is host-
replicated — it is tiny next to the numeric data).  Matrix values are
device_put with a fully-replicated NamedSharding, which is multi-process
legal; outputs are global arrays sharded per the plan's constraints.

Single-process testing: ``host_chip_mesh(devices, nhost, nchip)`` builds
the same mesh over virtual CPU devices — the topology-parametric tests
(tests/test_multihost.py) run every (nhost, nchip) split of the 8-device
mesh through the identical program.
"""

from __future__ import annotations

import numpy as np

from ..config import Config, DEFAULT
from ..sparse import CSC
from ..symbolic.supernodes import SupernodalSymbolic

__all__ = ["initialize", "host_chip_mesh", "global_solver_mesh",
           "factorize", "solve"]


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


def host_chip_mesh(devices=None, nhost: int | None = None,
                   nchip: int | None = None):
    """('host', 'chip') mesh.  By default the host axis follows the REAL
    process topology (``device.process_index``), so the 'chip' axis is
    exactly the intra-host ICI domain and the 'host' axis is DCN.  Explicit
    (nhost, nchip) overrides support single-process topology-parametric
    testing on virtual devices."""
    import jax
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if nhost is None:
        nproc = len({d.process_index for d in devices})
        nhost = nproc
    if nchip is None:
        assert len(devices) % nhost == 0, \
            f"{len(devices)} devices do not split over {nhost} hosts"
        nchip = len(devices) // nhost
    assert nhost * nchip == len(devices)
    if nhost > 1:
        # host-major order: sort by (process, local id) so each mesh row is
        # one host's chips (the 'chip' axis must ride ICI, never DCN)
        devices = sorted(devices, key=lambda d: (d.process_index, d.id))
    dev_array = np.asarray(devices, dtype=object).reshape(nhost, nchip)
    return Mesh(dev_array, axis_names=("host", "chip"))


def global_solver_mesh(tree: int | None = None, panel: int | None = None):
    """Flat ('tree', 'panel') mesh over ALL global devices (kept for the
    single-host v2 schedule)."""
    import jax

    from . import dist
    return dist.make_solver_mesh(jax.devices(), tree=tree, panel=panel)


def factorize(A: CSC, S: SupernodalSymbolic, mesh=None,
              config: Config = DEFAULT):
    """Topology-scheduled distributed factorization (every process
    participates; on a ('host', 'chip') mesh the DCN/ICI 2-level schedule
    engages automatically)."""
    from .dist2 import dist_factorize_v2

    if mesh is None:
        mesh = host_chip_mesh()
    return dist_factorize_v2(A, S, mesh, config)


def solve(F, b: np.ndarray, config: Config = DEFAULT) -> np.ndarray:
    """Distributed solve over a topology-scheduled factor."""
    from .dist2 import dist_solve_v2

    return dist_solve_v2(F, b, config)
