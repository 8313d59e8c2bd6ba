"""Distributed-program diagnostics: collective census of the compiled
dist_factorize_v2 program.

VERDICT r2 weak #7 asked whether the top (separator-crown) phase's
XLA-inserted collectives are sane — the dryrun log proves the program
partitions cleanly but says nothing about HOW MANY collectives GSPMD
inserted or what they carry. This module compiles the cached distributed
program and parses its optimized HLO into a per-op-type census (unique op
definitions, payload bytes, and which ops carry the shard_map leaf psum),
so the one-halo-exchange design contract is regression-testable and the
top phase's resharding traffic is visible.

Overlap (the ``t_cholmod_gpu.c:471-511`` double-buffer question) is a TPU
scheduling property: the CPU backend emits synchronous collectives only,
so the census records structure and volume here, and the async-pair count
(`*-start`/`*-done`) becomes meaningful when the same census runs against
a TPU-compiled program.
"""

from __future__ import annotations

import re

__all__ = ["collective_census", "census_from_hlo"]

_COLL = ("all-reduce", "all-gather", "all-to-all", "collective-permute",
         "reduce-scatter")
_DEF_RE = re.compile(
    r"%((?:all-reduce|all-gather|all-to-all|collective-permute|"
    r"reduce-scatter)(?:-start|-done)?[.\d]*) = (.*)")
_SHAPE_RE = re.compile(r"(f64|f32|bf16|f16|s32|u32|s64|pred)\[([\d,]*)\]")
_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
          "s64": 8, "pred": 1}


def _result_bytes(name: str, rhs: str) -> int:
    """Bytes of the op's RESULT only: the shape tokens before the op name
    on the definition line (operand shapes repeat after it and must not be
    counted — they inflated all-reduce 2x in the first census)."""
    base = name.split(".")[0]               # e.g. all-reduce-start
    head = rhs.split(" " + base + "(", 1)[0]
    total = 0
    for dt, dims in _SHAPE_RE.findall(head):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _BYTES[dt]
    return total


def census_from_hlo(hlo_text: str) -> dict:
    """Parse optimized HLO into {op_type: {"count", "bytes"}} plus
    ``psum_all_reduces`` (all-reduce defs whose metadata names the
    shard_map psum — the leaf halo exchange) and ``async_pairs``.

    Async collectives (TPU compiles) count under their base type via the
    ``-start`` def (which carries the payload shape); ``-done`` defs are
    skipped so pairs are not double-counted."""
    out = {k: {"count": 0, "bytes": 0} for k in _COLL}
    async_pairs = 0
    lines = hlo_text.splitlines()
    for line in lines:
        m = _DEF_RE.search(line)
        if not m:
            continue
        name, rhs = m.groups()
        base = next(k for k in _COLL if name.startswith(k))
        if name.startswith(base + "-done"):
            continue
        if name.startswith(base + "-start"):
            async_pairs += 1
        out[base]["count"] += 1
        out[base]["bytes"] += _result_bytes(name, rhs)
    # the leaf halo psum: XLA may fuse several shard_map psums into one
    # tuple all-reduce, and the "psum" op_name metadata lands on the
    # get-tuple-element CONSUMERS — attribute through uses. FULL op names
    # (incl. -start.N suffixes) so distinct async psums stay distinct.
    psum_ops = set()
    for line in lines:
        if "psum" not in line:
            continue
        for ref in re.findall(r"%(all-reduce(?:-start|-done)?[.\d]*)", line):
            psum_ops.add(ref.replace("-done", "-start"))
    out["psum_all_reduces"] = len(psum_ops)
    out["async_pairs"] = async_pairs
    return out


def collective_census(S, A, mesh) -> dict:
    """Compile (AOT) the cached dist_factorize_v2 program for ``mesh`` and
    return its collective census. Requires dist_factorize_v2 to have run
    once on (A, S, mesh) so S._dist2_cache holds the program + args."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec
    from ..numeric import supernodal_device as sd

    cache = getattr(S, "_dist2_cache", None)
    assert cache is not None, "run dist_factorize_v2 first"
    _, fn, leaf_args, cut_args, plan, part, dist, mesh2 = cache
    # the census lowers against the CACHED program — a mismatched mesh
    # would silently return the wrong topology's numbers
    assert (tuple(mesh.axis_names) == tuple(mesh2.axis_names)
            and dict(mesh.shape) == dict(mesh2.shape)), \
        "mesh differs from the cached dist_factorize_v2 mesh; re-run it"
    cdev = jax.device_put(
        sd._clow_data(A, S), NamedSharding(mesh2, PartitionSpec()))
    if dist.get("v3_args") is not None:
        lowered = fn.lower(cdev, leaf_args, *dist["v3_args"])
    else:
        lowered = fn.lower(cdev, leaf_args, cut_args)
    return census_from_hlo(lowered.compile().as_text())
