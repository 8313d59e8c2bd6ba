"""ssget-analog local collection manager."""

import numpy as np
import pytest

from suitesparse_tpu.io import fixtures
from suitesparse_tpu.io.collection import Collection, default_collection


def test_put_get_roundtrip(tmp_path):
    c = Collection(str(tmp_path))
    A = fixtures.laplacian_2d(6)
    e = c.put("LOCAL", "lap2d_6", A, kind="model problem", posdef=True)
    assert e.full_name == "LOCAL/lap2d_6"
    B = c.get("LOCAL/lap2d_6")
    assert B.shape == A.shape
    np.testing.assert_allclose(B.to_dense(), A.to_dense())
    # by id and by bare name
    assert c.lookup(1).name == "lap2d_6"
    assert c.get("lap2d_6").shape == A.shape


def test_search_filters(tmp_path):
    c = Collection(str(tmp_path))
    c.put("G", "a", fixtures.laplacian_2d(4), kind="model", posdef=True)
    c.put("G", "b", fixtures.random_sparse(10, 8, seed=1), kind="rect")
    hits = c.search(posdef=True)
    assert [e.name for e in hits] == ["a"]
    assert [e.name for e in c.search(kind="rect")] == ["b"]
    assert c.search(max_n=16) and not c.search(min_n=100)


def test_cache_miss_raises(tmp_path):
    c = Collection(str(tmp_path))
    c.put("G", "x", fixtures.laplacian_2d(4))
    import os
    os.remove(c.path_of(c.lookup("G/x")))
    with pytest.raises(FileNotFoundError):
        c.get("G/x")


def test_reference_index_parses():
    c = default_collection()
    idx = c.index()
    if not idx:
        pytest.skip("no reference ssget index mounted")
    assert len(idx) > 2000
    e = c.lookup("HB/1138_bus")
    assert e.nrow == 1138 and e.posdef in (True, False)
    spd = c.search(posdef=True, max_n=2000)
    assert any(x.group == "HB" for x in spd)
