"""Elimination-tree machinery: etree, postorder, column counts, ereach, levels.

TPU-native analogs of the reference's symbolic toolchain:
  etree       — ``CHOLMOD/Cholesky/cholmod_etree.c:81`` / ``CSparse/Source/cs_etree.c``
                (Liu's algorithm with path compression; ata mode gives the column
                elimination tree of A'A without forming it)
  postorder   — ``cholmod_postorder.c`` / ``cs_post.c``
  col_counts  — ``cholmod_rowcolcounts.c:184`` / ``cs_counts.c`` + ``cs_leaf.c``
                (Gilbert–Ng–Peyton O(|A| α(n)) skeleton algorithm)
  ereach      — ``cs_ereach.c`` (pattern of one row of L via etree reach)
  tree_levels — level schedule for batched device execution (no direct reference
                analog; replaces the sequential outer loops)

All implemented from the published algorithms (Liu 1986; Gilbert, Ng, Peyton 1994;
Davis "Direct Methods for Sparse Linear Systems"), not translated from the C.
Python versions here are the correctness oracles; `suitesparse_tpu.native` holds
the C++ fast path used for large matrices.
"""

from __future__ import annotations

import numpy as np

from ..sparse import CSC

__all__ = [
    "etree",
    "postorder",
    "ereach",
    "col_counts",
    "tree_levels",
    "tree_depth",
    "first_descendants",
]


def etree(A: CSC, ata: bool = False) -> np.ndarray:
    """Elimination tree of A (using upper triangle) or of A'A (``ata=True``).

    Returns ``parent`` with parent[root] = -1. Liu's algorithm with path
    compression via an ``ancestor`` array; the ``ata`` variant threads through
    ``prev_col`` so A'A is never formed. Dispatches to the native C++ kernel
    when built (bit-identical result; the Python below is the oracle).
    """
    from .. import native
    if native.available():
        return native.etree(A.ncol, A.indptr, A.indices, ata=ata, nrow=A.nrow)
    if ata:
        AT = A  # we iterate columns of A; rows seen per column
        n = A.ncol
        parent = np.full(n, -1, dtype=np.int64)
        ancestor = np.full(n, -1, dtype=np.int64)
        prev_col = np.full(A.nrow, -1, dtype=np.int64)
        indptr, indices = A.indptr, A.indices
        for k in range(n):
            for t in range(indptr[k], indptr[k + 1]):
                i = prev_col[indices[t]]
                while i != -1 and i < k:
                    nxt = ancestor[i]
                    ancestor[i] = k
                    if nxt == -1:
                        parent[i] = k
                        i = -1
                    else:
                        i = nxt
                prev_col[indices[t]] = k
        return parent

    n = A.ncol
    assert A.nrow == n
    U = A if A.sym == 1 else None
    parent = np.full(n, -1, dtype=np.int64)
    ancestor = np.full(n, -1, dtype=np.int64)
    indptr, indices = A.indptr, A.indices
    for k in range(n):
        for t in range(indptr[k], indptr[k + 1]):
            i = indices[t]
            # use only the upper triangle (i < k); for general storage both
            # triangles are present and the lower entries are skipped
            while i != -1 and i < k:
                nxt = ancestor[i]
                ancestor[i] = k
                if nxt == -1:
                    parent[i] = k
                    i = -1
                else:
                    i = nxt
    _ = U
    return parent


def postorder(parent: np.ndarray, weights: np.ndarray | None = None) -> np.ndarray:
    """Postorder of the forest given by ``parent``.

    Returns ``post`` where ``post[k]`` = node visited k-th. Children are visited
    in ascending node order (matching the convention downstream symbolic code
    assumes). ``weights`` reserved for weighted postorder (cholmod_postorder
    analog); currently ignored beyond tie-breaks.
    """
    from .. import native
    if native.available() and weights is None:
        return native.postorder(parent)
    n = parent.size
    # build child lists: head/next with children pushed in reverse so the
    # pop order is ascending
    head = np.full(n, -1, dtype=np.int64)
    next_ = np.full(n, -1, dtype=np.int64)
    for v in range(n - 1, -1, -1):
        p = parent[v]
        if p != -1:
            next_[v] = head[p]
            head[p] = v
    post = np.empty(n, dtype=np.int64)
    k = 0
    stack = []
    for root in range(n):
        if parent[root] != -1:
            continue
        stack.append(root)
        while stack:
            node = stack[-1]
            child = head[node]
            if child == -1:
                post[k] = node
                k += 1
                stack.pop()
            else:
                head[node] = next_[child]
                stack.append(child)
    assert k == n, "parent array is not a forest (cycle?)"
    return post


def ereach(A: CSC, k: int, parent: np.ndarray, mark: np.ndarray,
           out: np.ndarray) -> int:
    """Pattern of row k of L (nonzeros of L[k, :k]) in topological order.

    ``mark`` is an int workspace (size n, holding the current column number when
    visited); ``out`` a size-n int64 output buffer. Returns ``top`` such that
    ``out[top:]`` holds the pattern. Reference analog: ``cs_ereach.c``.
    """
    n = A.ncol
    top = n
    mark[k] = k
    for t in range(A.indptr[k], A.indptr[k + 1]):
        i = A.indices[t]
        if i > k:
            continue
        # walk up the etree until a marked node
        path_len = 0
        while mark[i] != k:
            out[path_len] = i
            path_len += 1
            mark[i] = k
            i = parent[i]
        # push path onto output stack in reverse (topological order)
        for s in range(path_len - 1, -1, -1):
            top -= 1
            out[top] = out[s]
        # note: out[:path_len] used as scratch; safe because top > path_len
    return top


def first_descendants(parent: np.ndarray, post: np.ndarray) -> np.ndarray:
    """first[j] = smallest postorder index among descendants of j."""
    n = parent.size
    first = np.full(n, -1, dtype=np.int64)
    for k in range(n):
        j = post[k]
        while j != -1 and first[j] == -1:
            first[j] = k
            j = parent[j]
    return first


def col_counts(A: CSC, parent: np.ndarray, post: np.ndarray,
               ata: bool = False) -> np.ndarray:
    """nnz per column of the Cholesky factor L of A (or of A'A).

    Gilbert–Ng–Peyton skeleton/leaf algorithm, O(|A| α(n)): processes nodes in
    postorder; each edge of the skeleton graph contributes along the path to the
    least common ancestor, found with a union-find over previous leaves.
    Reference analog: ``cholmod_rowcolcounts.c`` / ``cs_counts.c`` (+``cs_leaf.c``).
    Counts include the diagonal.
    """
    from .. import native
    if native.available():
        if ata:
            return native.col_counts(A.ncol, A.nrow, A.indptr, A.indices,
                                     parent, post, True)
        Alow = A.transpose(values=False) if A.sym == 1 else A
        return native.col_counts(A.ncol, A.nrow, Alow.indptr, Alow.indices,
                                 parent, post, False)
    n = parent.size
    delta = np.zeros(n, dtype=np.int64)
    # first-descendant computation doubles as leaf detection: node j is a leaf
    # of the etree iff nothing set first[j] before its own postorder visit
    first = np.full(n, -1, dtype=np.int64)
    for k in range(n):
        j = post[k]
        delta[j] = 1 if first[j] == -1 else 0
        while j != -1 and first[j] == -1:
            first[j] = k
            j = parent[j]

    maxfirst = np.full(n, -1, dtype=np.int64)
    prevleaf = np.full(n, -1, dtype=np.int64)
    # union-find with path compression
    uf_parent = np.arange(n, dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while uf_parent[root] != root:
            root = uf_parent[root]
        while uf_parent[x] != root:
            uf_parent[x], x = root, uf_parent[x]
        return root

    if ata:
        # rows of A grouped by their smallest postordered column: build the
        # linked lists head/next over postordered columns
        AT = A.transpose(values=False)
        head = np.full(n + 1, -1, dtype=np.int64)
        next_ = np.full(A.nrow, -1, dtype=np.int64)
        # pinv of post
        ipost = np.empty(n, dtype=np.int64)
        ipost[post] = np.arange(n, dtype=np.int64)
        for i in range(A.nrow):
            lo, hi = AT.indptr[i], AT.indptr[i + 1]
            if hi > lo:
                kmin = ipost[AT.indices[lo:hi]].min()
            else:
                kmin = n
            next_[i] = head[kmin]
            head[kmin] = i
    else:
        # edges (i, j) with i > j come from the lower triangle of A by column:
        # for upper storage that is the transpose; general storage already has
        # both triangles and the i <= j entries are filtered in the loop
        Lw = A.transpose(values=False) if A.sym == 1 else A
    count = delta.copy()

    for k in range(n):
        j = post[k]
        if parent[j] != -1:
            # the parent's pattern inherits this child's pattern minus row j
            count[parent[j]] -= 1
        if ata:
            i = head[k]
            while i != -1:
                # row i of A touches columns; each column c of row i is an edge
                lo, hi = AT.indptr[i], AT.indptr[i + 1]
                for t in range(lo, hi):
                    c = AT.indices[t]
                    _process_edge(c, j, first, maxfirst, prevleaf, uf_parent,
                                  count, find, k)
                i = next_[i]
        else:
            lo, hi = Lw.indptr[j], Lw.indptr[j + 1]
            for t in range(lo, hi):
                i = Lw.indices[t]
                if i > j:
                    _process_edge(i, j, first, maxfirst, prevleaf, uf_parent,
                                  count, find, k)
        if parent[j] != -1:
            uf_parent[j] = parent[j]

    # accumulate counts up the tree: count[parent] += count[child]
    colcount = count.copy()
    for k in range(n):
        j = post[k]
        p = parent[j]
        if p != -1:
            colcount[p] += colcount[j]
    # The pass above computes subtree-accumulated deltas = final col counts.
    return colcount


def _process_edge(i, j, first, maxfirst, prevleaf, uf_parent, count, find, k):
    """Skeleton-edge processing: if (i,j) is a skeleton edge (j is a 'leaf' of
    i's row subtree), add the path contribution: +1 at j, -1 at the LCA with the
    previous leaf of i."""
    if i <= j or first[j] <= maxfirst[i]:
        return
    maxfirst[i] = first[j]
    jprev = prevleaf[i]
    if jprev == -1:
        # first leaf: path from j to root of i's subtree: +1 at j
        count[j] += 1
    else:
        q = find(jprev)
        count[j] += 1
        count[q] -= 1
    prevleaf[i] = j


def tree_levels(parent: np.ndarray) -> tuple[np.ndarray, list[np.ndarray]]:
    """Level schedule: level[j] = 1 + max level of children (leaves = 0).

    Returns (level, levels) where levels[d] is the sorted array of nodes at
    depth d — every node in levels[d] depends only on nodes in levels[<d], so
    each level can execute as one batched device step. This is the TPU analog
    of the reference's sequential supernode loop / OpenMP sections."""
    n = parent.size
    level = np.zeros(n, dtype=np.int64)
    # children finish before parents in any topological order of the tree; node
    # ids are NOT topological in general, so process in postorder
    post = postorder(parent)
    for k in range(n):
        j = post[k]
        p = parent[j]
        if p != -1:
            level[p] = max(level[p], level[j] + 1)
    nlev = int(level.max()) + 1 if n else 0
    levels = [np.sort(np.nonzero(level == d)[0]) for d in range(nlev)]
    return level, levels


def tree_depth(parent: np.ndarray) -> int:
    level, _ = tree_levels(parent)
    return int(level.max()) + 1 if parent.size else 0
