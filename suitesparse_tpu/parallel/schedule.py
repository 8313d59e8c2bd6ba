"""Static subtree-per-device schedule for the distributed factorization.

Reference analog: SPQR's TBB task tree (``spqr_parallel.cpp:8-94``; tasks cut
from the front tree by flop grain in ``spqr_analyze.cpp``) and the CHOLMOD GPU
paper's subtree streaming — reborn TPU-first as a STATIC ownership partition
consumed by a ``shard_map`` SPMD program (XLA wants static schedules, not work
stealing):

  * the supernode tree is CUT into subtree roots by a flop grain
    (``total_fl / (D * oversub)``); every supernode below the cut belongs to
    exactly one subtree, each subtree root is assigned to one device by LPT
    (longest-processing-time) bin packing on exact subtree flops;
  * supernodes ABOVE the cut (the ND separator chain) form the TOP set,
    factored cooperatively after an explicit ``psum`` assembles the cut
    contributions (the halo exchange of SURVEY §5.8 (i));
  * each device factors its own subtrees with the SAME group schedule
    (classes unified across devices, per-device batches padded to the class
    maximum — dummy slots factor identity fronts), so the shard_map body is
    one SPMD program.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..symbolic.supernodes import SupernodalSymbolic

__all__ = ["partition_tree", "TreePartition"]


@dataclasses.dataclass
class TreePartition:
    ndev: int
    own: np.ndarray        # snode -> device, or -1 for TOP snodes
    top: np.ndarray        # bool mask of top snodes
    dev_fl: np.ndarray     # per-device leaf flops (balance diagnostic)
    top_fl: float


def _snode_fl(S: SupernodalSymbolic) -> np.ndarray:
    fl = np.zeros(S.nsuper)
    for s in range(S.nsuper):
        nc = S.ncols(s)
        nr = S.nrows(s)
        fl[s] = nc**3 / 3 + (nr - nc) * nc * nc + (nr - nc) ** 2 * nc
    return fl


def partition_tree(S: SupernodalSymbolic, ndev: int,
                   oversub: int = 8) -> TreePartition:
    """Cut the supernode tree into >= ndev subtrees balanced by flops."""
    ns = S.nsuper
    fl = _snode_fl(S)
    sub_fl = fl.copy()
    for s in range(ns):            # postorder: children before parents
        p = S.sparent[s]
        if p >= 0:
            sub_fl[p] += sub_fl[s]
    total = float(sub_fl[np.flatnonzero(S.sparent < 0)].sum()) or 1.0
    grain = total / max(ndev * oversub, 1)

    # top-down cut: a subtree becomes a unit when its flops fit the grain;
    # otherwise its root joins TOP and we recurse into the children
    children: list = [[] for _ in range(ns)]
    roots = []
    for s in range(ns):
        p = S.sparent[s]
        if p >= 0:
            children[p].append(s)
        else:
            roots.append(s)
    top = np.zeros(ns, dtype=bool)
    units = []                      # subtree-root snodes
    stack = list(roots)
    while stack:
        s = stack.pop()
        if sub_fl[s] <= grain or not children[s]:
            units.append(s)
        else:
            top[s] = True
            stack.extend(children[s])
    # LPT assignment of units to devices
    units.sort(key=lambda s: -sub_fl[s])
    load = np.zeros(ndev)
    own = np.full(ns, -1, dtype=np.int64)
    for u in units:
        d = int(np.argmin(load))
        load[d] += sub_fl[u]
        # assign the whole subtree of u
        st = [u]
        while st:
            v = st.pop()
            own[v] = d
            st.extend(children[v])
    return TreePartition(ndev=ndev, own=own, top=top, dev_fl=load,
                         top_fl=float(fl[top].sum()))
