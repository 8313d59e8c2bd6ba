"""Fill-reducing orderings (reference layer L1: AMD/COLAMD/BTF/ND — SURVEY §2.2)."""

from __future__ import annotations

import numpy as np

from ..config import Config, DEFAULT
from ..sparse import CSC
from .amd import amd_order

__all__ = ["amd_order", "colamd_order", "nested_dissection_order", "natural_order"]


def natural_order(A: CSC, config: Config = DEFAULT) -> np.ndarray:
    return np.arange(A.ncol, dtype=np.int64)


def colamd_order(A: CSC, config: Config = DEFAULT) -> np.ndarray:
    from .colamd import colamd_order as _c
    return _c(A, config)


def nested_dissection_order(A: CSC, config: Config = DEFAULT) -> np.ndarray:
    from .nested_dissection import nested_dissection_order as _nd
    return _nd(A, config)
