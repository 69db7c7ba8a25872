"""Mixed-ops golden replay — the reference's test2 gate
(``test/rtree/test2/run``: replay an INSERT/DELETE/QUERY op stream against
the live index, diff every query against Exhaustive.cc's scan of the live
set).  VERDICT r2 #4.

The distributed analog batches the ops BETWEEN query points into epochs
(an epoch's inserts → one ``insert_batch``; its deletes → one
``delete_rows``) — mutation batching is exactly how a log-structured
distributed index ingests an op log — and at every query point answers
range + kNN queries through the stored index, diffing against a pandas
exhaustive scan of the live multiset (Exhaustive.cc:51-59 closed-interval
semantics, multiplicity preserved)."""

from collections import Counter

import pandas as pd
import pytest
from pyspark.sql import functions as F

from libspatialindex_spark.operators import index_build, knn, mutations, range_query
from libspatialindex_spark.sources import testdata as td
from tests.conftest import SF_DIR

WINDOWS = [
    (0.25, 0.25, 0.30, 0.30),
    (0.40, 0.40, 0.43, 0.43),
    (0.70, 0.10, 0.80, 0.20),
]
KNN_PT, K = (0.5, 0.5), 10


@pytest.fixture(scope="module")
def all_rows(spark):
    return td.rects(spark, SF_DIR).limit(3000).toPandas()


def _live_hits(live, w):
    qx0, qy0, qx1, qy1 = w
    m = ~(
        (live.xmin > qx1) | (live.xmax < qx0)
        | (live.ymin > qy1) | (live.ymax < qy0)
    )
    return Counter(live.id[m].tolist())


def _live_knn(live, px, py, k):
    dx = (live.xmin - px).clip(lower=0).combine((px - live.xmax).clip(lower=0), max)
    dy = (live.ymin - py).clip(lower=0).combine((py - live.ymax).clip(lower=0), max)
    d2 = dx * dx + dy * dy
    if len(d2) == 0:
        return Counter()
    kth = d2.sort_values().iloc[: min(k, len(d2))].max()
    return Counter(live.id[d2 <= kth].tolist())


def test_mixed_ops_replay_matches_exhaustive(spark, conf, all_rows, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mix") / "idx")
    spark_all = spark.createDataFrame(all_rows)

    # epoch 0: initial bulk load of ids % 5 == 0
    live = all_rows[all_rows.id % 5 == 0]
    idx = index_build.build_index(
        spark_all.filter(F.col("id") % 5 == 0), path, conf, build_id="epoch-0"
    )

    for epoch in range(1, 5):
        # INSERT the epoch's batch
        batch = all_rows[all_rows.id % 5 == epoch]
        mutations.insert_batch(
            idx, spark_all.filter(F.col("id") % 5 == epoch),
            build_id=f"epoch-{epoch}", idempotent=True,
        )
        live = pd.concat([live, batch])
        # DELETE an interleaved victim set (ids % 7 == epoch among live)
        victim_ids = sorted(set(live.id[live.id % 7 == epoch].tolist()))
        if victim_ids:
            mutations.delete_rows(
                idx,
                spark.createDataFrame([(i,) for i in victim_ids], ["id"]),
                build_id=f"del-{epoch}",
            )
            live = live[~live.id.isin(victim_ids)]

        # QUERY checkpoint: every window + kNN, exact multiset diff
        rel = idx.relation()
        for w in WINDOWS:
            got = Counter(
                r.id for r in range_query.intersects_query(rel, *w).collect()
            )
            assert got == _live_hits(live, w), (epoch, w)
        gotk = Counter(
            r.id for r in knn.knn_query(rel, *KNN_PT, K).collect()
        )
        assert gotk == _live_knn(live, *KNN_PT, K), epoch
        assert idx.validate(), epoch

    # final sanity: the replay genuinely interleaved (something deleted,
    # something survived)
    assert 0 < len(live) < len(all_rows)
