"""Edge-cut partitioning (Mongoose EdgeCut / METIS_PartGraphRecursive analogs)."""

import numpy as np

from suitesparse_tpu.io import fixtures
from suitesparse_tpu.ordering.partition import edge_cut, partition_kway


def test_edgecut_grid_quality():
    # 12^3 grid: ideal bisection cut = 12^2 = 144; allow 1.5x
    A = fixtures.laplacian_3d(12)
    ec = edge_cut(A)
    assert set(np.unique(ec.partition)) <= {0, 1}
    assert ec.cut_size <= 1.5 * 144
    assert abs(ec.w0 - A.ncol // 2) <= 0.1 * A.ncol


def test_edgecut_target_split():
    A = fixtures.laplacian_2d(24)
    ec = edge_cut(A, target_split=0.25, tolerance=0.05)
    frac = ec.w0 / A.ncol
    assert 0.15 <= frac <= 0.35


def test_partition_kway():
    A = fixtures.laplacian_3d(10)
    for k in (3, 4, 8):
        pk = partition_kway(A, k)
        sizes = np.bincount(pk.partition, minlength=k)
        assert sizes.size == k and sizes.min() > 0
        assert sizes.max() <= 1.6 * A.ncol / k
        assert pk.cut_size > 0


def test_edgecut_empty_and_tiny():
    from suitesparse_tpu.sparse import from_triplets
    A0 = from_triplets(0, 0, [], [], [], sym=1)
    assert edge_cut(A0).partition.size == 0
    A2 = from_triplets(2, 2, [0, 0, 1], [0, 1, 1], [2.0, 1.0, 2.0], sym=1)
    ec = edge_cut(A2)
    assert ec.partition.size == 2


def test_edge_cut_quality_with_qp_refinement():
    """Grid cuts must stay within ~10% of the plane-optimal cut (the QP
    gradient-projection waterdance pass backs the Mongoose-parity claim)."""
    from suitesparse_tpu.io import fixtures
    from suitesparse_tpu.ordering.partition import edge_cut

    for nx, ideal in ((10, 100), (14, 196)):
        A = fixtures.laplacian_3d(nx)
        ec = edge_cut(A.to_full_storage())
        assert ec.cut_size <= ideal * 1.15, (nx, ec.cut_size)
        assert ec.imbalance <= 0.06
