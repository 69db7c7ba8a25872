"""Packed per-partition node index (Arrow UDF local level) — parity with
the JVM batch join path and with numpy brute force."""

import numpy as np
import pandas as pd
import pytest

from libspatialindex_spark.operators import batch_query, index_build, local_index
from libspatialindex_spark.sources import testdata as td
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def windows(spark):
    td.register_views(spark, SF_DIR)
    return spark.sql(td.WINDOWS_SQL).toPandas()


def test_pack_nodes_cover_rows():
    rng = np.random.default_rng(3)
    x0 = rng.random(1000)
    y0 = rng.random(1000)
    x1, y1 = x0 + 0.01, y0 + 0.01
    starts, nx0, ny0, nx1, ny1 = local_index.pack_nodes(x0, y0, x1, y1, 64)
    ends = np.append(starts[1:], 1000)
    for i, (s, e) in enumerate(zip(starts, ends)):
        assert nx0[i] == x0[s:e].min() and nx1[i] == x1[s:e].max()
        assert ny0[i] == y0[s:e].min() and ny1[i] == y1[s:e].max()


def test_query_packed_matches_bruteforce():
    rng = np.random.default_rng(11)
    n = 5000
    x0 = rng.random(n)
    y0 = rng.random(n)
    x1 = x0 + rng.random(n) * 0.02
    y1 = y0 + rng.random(n) * 0.02
    ids = np.arange(n, dtype=np.int64)
    queries = np.array(
        [[q, 0.1 + 0.013 * q % 0.9, 0.2 + 0.029 * q % 0.7,
          0.1 + 0.013 * q % 0.9 + 0.05, 0.2 + 0.029 * q % 0.7 + 0.05]
         for q in range(20)]
    )
    got_q, got_i = local_index.query_packed(ids, x0, y0, x1, y1, queries, 128)
    got = set(zip(got_q.tolist(), got_i.tolist()))
    want = set()
    for qid, qx0, qy0, qx1, qy1 in queries:
        hit = ~((x0 > qx1) | (x1 < qx0) | (y0 > qy1) | (y1 < qy0))
        want |= {(int(qid), int(i)) for i in ids[hit]}
    assert got == want


def test_local_batch_matches_jvm_batch(spark, conf, tmp_path, windows):
    idx = index_build.build_index(
        td.rects(spark, SF_DIR), str(tmp_path / "idx"), conf
    )
    rel = idx.relation()
    got = {
        (r.qid, r.id)
        for r in local_index.local_batch_intersects(rel, windows).collect()
    }
    wdf = spark.createDataFrame(windows)
    want = {
        (r.qid, r.id)
        for r in batch_query.batch_intersects(rel, wdf).collect()
    }
    assert got == want and got
