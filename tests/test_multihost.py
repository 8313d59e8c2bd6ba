"""Topology-parametric multi-host tests (VERDICT r2 item 5).

Every (nhost, nchip) split of the 8-device virtual mesh runs the SAME
2-level program (subtree-per-host DCN grain, subtree-per-chip ICI grain,
host-local MID phase, one global psum): correctness vs the host oracle,
partition invariants, and the modeled scaling table's sanity.  On real
hardware the identical code runs over ``multihost.host_chip_mesh()`` built
from the process topology (reference analog being replaced:
``SPQR/Source/spqr_parallel.cpp:8-94``'s intra-node task tree, elevated
across hosts)."""

import numpy as np
import pytest

import jax

from suitesparse_tpu.io import fixtures
from suitesparse_tpu.ordering.amd import amd_order
from suitesparse_tpu.symbolic.supernodes import analyze_supernodal
from suitesparse_tpu.numeric import supernodal
from suitesparse_tpu.parallel import multihost as mh
from suitesparse_tpu.parallel.dist2 import dist_factorize_v2, dist_solve_v2
from suitesparse_tpu.parallel.schedule import (partition_tree_topology,
                                               model_scaling)
import suitesparse_tpu as sst

TOPOLOGIES = [(2, 4), (4, 2), (8, 1), (2, 2), (1, 8)]


def _mesh(nh, nc):
    devs = jax.devices()
    if len(devs) < nh * nc:
        pytest.skip(f"need {nh * nc} devices")
    return mh.host_chip_mesh(devs[:nh * nc], nh, nc)


@pytest.mark.parametrize("nh,nc", TOPOLOGIES)
def test_topology_factorize_and_solve_match_oracle(nh, nc):
    A = fixtures.laplacian_3d(8)
    S = analyze_supernodal(A, amd_order(A))
    F = dist_factorize_v2(A, S, _mesh(nh, nc))
    assert F.ok
    Fh = supernodal.factorize_host(A, S)
    scale = max(np.abs(Fh.Lx).max(), 1.0)
    assert np.abs(F.lx_host() - Fh.Lx).max() / scale < 1e-5
    b = 1.0 + np.arange(A.ncol) / A.ncol
    x = dist_solve_v2(F, b)
    assert sst.residual_norm(A, x, b) < 1e-6


def test_topology_engages_mid_phase():
    """nhost>1 must produce a real host-local MID phase (not all-TOP)."""
    A = fixtures.laplacian_3d(8)
    S = analyze_supernodal(A, amd_order(A))
    F = dist_factorize_v2(A, S, _mesh(2, 4))
    dist = S._dist2_cache[6]
    v3 = dist["v3"]
    assert dist.get("v3_args") is not None
    assert len(v3["mid_dist"]) > 0, "no MID groups — DCN schedule inert"
    assert v3["f1_cells"] > 0
    # the DCN-crossing buffer must be a PROPER SUBSET of what the flat
    # schedule psums globally: flat puts mid+gtop halos on the one global
    # psum; the topology schedule moves the MID share onto ICI. Compare
    # against the flat partition of the same problem.
    S2 = analyze_supernodal(A, amd_order(A))
    dist_flat = None
    from suitesparse_tpu.parallel.dist2 import build_dist_plan
    C_low = A.symperm(S2.perm).transpose()
    _, _, dist_flat = build_dist_plan(S2, C_low, 8)
    assert v3["f0_cells"] < dist_flat["f0_cells"], (
        v3["f0_cells"], dist_flat["f0_cells"])


def test_topology_partition_invariants():
    """MID snodes: children in the same host, parent MID-same-host or
    global TOP; leaf units never cross chips."""
    A = fixtures.laplacian_3d(12)
    S = analyze_supernodal(A, amd_order(A))
    for (nh, nc) in [(2, 4), (4, 2)]:
        p = partition_tree_topology(S, nh, nc)
        for s in range(S.nsuper):
            pa = int(S.sparent[s])
            if pa < 0:
                continue
            if p.mid_host[pa] >= 0:
                h = p.mid_host[pa]
                if p.mid_host[s] >= 0:
                    assert p.mid_host[s] == h
                else:
                    assert not p.top[s], "global-TOP child of a MID snode"
                    assert p.own[s] // p.nchip == h
            if p.own[s] >= 0 and not p.top[pa] and p.mid_host[pa] < 0:
                assert p.own[s] == p.own[pa], "leaf subtree crosses devices"


def test_flat_mesh_keeps_v2_schedule():
    """('tree','panel') meshes (and 1-host topologies) use the flat v2
    program — no v3 structures, identical numerics."""
    A = fixtures.laplacian_3d(7)
    S = analyze_supernodal(A, amd_order(A))
    F = dist_factorize_v2(A, S, _mesh(1, 8))
    dist = S._dist2_cache[6]
    assert dist.get("v3") is None
    Fh = supernodal.factorize_host(A, S)
    scale = max(np.abs(Fh.Lx).max(), 1.0)
    assert np.abs(F.lx_host() - Fh.Lx).max() / scale < 1e-5


def test_host_chip_mesh_single_process():
    mesh = _mesh(2, 4)
    assert mesh.axis_names == ("host", "chip")
    assert mesh.devices.shape == (2, 4)


def test_model_scaling_table():
    """The modeled strong-scaling rows are internally consistent: leaf
    balance near 1, DCN bytes shrink when hosts get a MID phase, and the
    total modeled time decomposes into the five phases."""
    A = fixtures.laplacian_3d(16)
    S = analyze_supernodal(A, amd_order(A))
    rows = model_scaling(S, [(1, 8), (2, 4), (4, 2)])
    by = {(r["nhost"], r["nchip"]): r for r in rows}
    for r in rows:
        assert r["leaf_balance"] < 2.0
        assert r["t_total_s"] == pytest.approx(
            r["t_leaf_s"] + r["t_mid_s"] + r["t_top_s"]
            + r["t_ici_s"] + r["t_dcn_s"])
    # MID phase moves bytes off DCN: the 2-host split must psum fewer
    # global cells than the same fleet with every crown front global
    assert by[(2, 4)]["dcn_mbytes"] < by[(1, 8)]["dcn_mbytes"]


_WORKER = r'''
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=2, process_id=pid)
import suitesparse_tpu as sst
from suitesparse_tpu.io import fixtures
from suitesparse_tpu.ordering.amd import amd_order
from suitesparse_tpu.symbolic.supernodes import analyze_supernodal
import suitesparse_tpu.parallel.multihost as mh

A = fixtures.laplacian_3d(6)
S = analyze_supernodal(A, amd_order(A))
mesh = mh.host_chip_mesh()          # host axis = REAL process topology
assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {"host": 2, "chip": 2}
F = mh.factorize(A, S, mesh)
assert F.ok
b = 1.0 + np.arange(A.ncol) / A.ncol
x = mh.solve(F, b)
resid = sst.residual_norm(A, x, b)
assert resid < 1e-4, resid
print("MULTIPROCESS_OK", pid, resid, flush=True)
'''


def test_real_two_process_distributed(tmp_path):
    """TRUE >=2-host execution: two OS processes under jax.distributed
    (Gloo CPU collectives = the DCN analog), each owning 2 virtual chips.
    The SAME single-controller dist2 program every process runs; 'host'
    mesh axis follows the real process topology. Regression: sargs/leaf/cut
    index arrays must ride as jit ARGUMENTS (closing over global-mesh
    arrays is illegal in real multi-process runs)."""
    import os
    import socket
    import subprocess
    import sys

    w = tmp_path / "worker.py"
    w.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    # the worker script runs from a tmpdir: put the repo on its path
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_NUM_PROCESSES", None)
    procs = [subprocess.Popen([sys.executable, str(w), str(i), port],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True, env=env)
             for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out[-2000:]}"
        assert "MULTIPROCESS_OK" in out, out[-2000:]


def test_compiled_collective_structure():
    """The DCN invariant, asserted from the compiled HLO (VERDICT r2 weak
    #7): the 2-level factorization lowers to EXACTLY two all-reduces — one
    host-local (chip axis = ICI; replica groups stay within a host's
    devices) and ONE global psum (the only op whose bytes cross hosts) —
    and no other collectives (no all-gather / collective-permute)."""
    import re

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec
    from suitesparse_tpu.numeric import supernodal_device as sd

    A = fixtures.laplacian_3d(6)
    S = analyze_supernodal(A, amd_order(A))
    mesh = _mesh(2, 4)
    F = dist_factorize_v2(A, S, mesh, sst.DEFAULT)
    assert F.ok
    (_, fn, leaf_args, _cut, _plan, _part, dist, m) = S._dist2_cache
    cdev = jax.device_put(jnp.asarray(sd._clow_data(A, S)),
                          NamedSharding(mesh, PartitionSpec()))
    args = (cdev, leaf_args) + tuple(dist.get("v3_args", ()))
    txt = fn.lower(*args).compile().as_text()
    groups = re.findall(r"all-reduce[^\n]*replica_groups=(\{\{[^=]*?\}\})",
                        txt)
    assert len(groups) == 2, groups
    host0 = {d.id for d in mesh.devices[0].ravel()}

    def spans_hosts(g):
        # each inner {…} is one replica group; a collective crosses DCN iff
        # SOME group mixes devices of different hosts
        for grp in re.findall(r"\{([\d,]+)\}", g):
            ids = {int(x) for x in grp.split(",")}
            if ids - host0 and ids & host0:
                return True
        return False

    spanning = [g for g in groups if spans_hosts(g)]
    assert len(spanning) == 1, groups       # ONE DCN collective
    assert "all-gather" not in txt
    assert "collective-permute" not in txt
