"""Fill-reducing orderings (reference layer L1: AMD/COLAMD/BTF/ND — SURVEY §2.2)."""

from __future__ import annotations

import numpy as np

from ..config import Config, DEFAULT
from ..sparse import CSC
from .amd import amd_order

__all__ = ["amd_order", "colamd_order", "nested_dissection_order",
           "natural_order", "camd_order", "ccolamd_order", "symamd_order",
           "csymamd_order", "nesdis_order", "edge_cut", "partition_kway"]


def edge_cut(A: CSC, target_split: float = 0.5, tolerance: float = 0.05,
             seed: int = 1, config: Config = DEFAULT):
    from .partition import edge_cut as _e
    return _e(A, target_split, tolerance, seed, config)


def partition_kway(A: CSC, k: int, tolerance: float = 0.05, seed: int = 1,
                   config: Config = DEFAULT):
    from .partition import partition_kway as _p
    return _p(A, k, tolerance, seed, config)


def natural_order(A: CSC, config: Config = DEFAULT) -> np.ndarray:
    return np.arange(A.ncol, dtype=np.int64)


def colamd_order(A: CSC, config: Config = DEFAULT) -> np.ndarray:
    from .colamd import colamd_order as _c
    return _c(A, config)


def nested_dissection_order(A: CSC, config: Config = DEFAULT) -> np.ndarray:
    from .nested_dissection import nested_dissection_order as _nd
    return _nd(A, config)


def nesdis_order(A: CSC, config: Config = DEFAULT):
    from .nested_dissection import nesdis_order as _n
    return _n(A, config)


def ccolamd_order(A: CSC, cset: np.ndarray,
                  config: Config = DEFAULT) -> np.ndarray:
    from .colamd import ccolamd_order as _c
    return _c(A, cset, config)


def symamd_order(A: CSC, config: Config = DEFAULT) -> np.ndarray:
    from .colamd import symamd_order as _s
    return _s(A, config)


def csymamd_order(A: CSC, cset: np.ndarray,
                  config: Config = DEFAULT) -> np.ndarray:
    from .colamd import csymamd_order as _s
    return _s(A, cset, config)


def camd_order(A: CSC, cset: np.ndarray, config: Config = DEFAULT) -> np.ndarray:
    """Constrained AMD (CAMD analog): fill-reducing order of pattern(A+A')
    keeping constraint sets contiguous in ascending set order — the NESDIS
    post-ordering primitive (reference camd.h camd_order)."""
    from .. import native
    n = A.ncol
    if n == 0:
        return np.empty(0, dtype=np.int64)
    S = A.aat_pattern()
    if native.available() and native.has("sstpu_camd"):
        return native.camd(S.indptr, S.indices, n, cset)
    # fallback: order each set independently with the Python MD, concatenate
    from .amd import _amd_python
    cset = np.asarray(cset, dtype=np.int64)
    out = []
    for s in np.unique(cset):
        nodes = np.flatnonzero(cset == s)
        if nodes.size == 1:
            out.append(nodes)
            continue
        from .nested_dissection import _subgraph
        sub = _subgraph(S, nodes)
        out.append(nodes[_amd_python(sub)])
    return np.concatenate(out)
