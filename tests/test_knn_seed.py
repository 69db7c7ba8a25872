"""Manifest-seeded kNN on the stored index (VERDICT r1 #7): the radius
derived from bucket row counts must be certified (≥ k rows inside) and the
single-pass result must equal both the ring-loop answer and brute force."""

import numpy as np
import pytest

from libspatialindex_spark.operators import index_build, knn
from libspatialindex_spark.operators.relation import SpatialRelation
from libspatialindex_spark.sources import testdata as td
from tests.conftest import SF_DIR

P, K = (0.5, 0.5), 10


@pytest.fixture(scope="module")
def stored(spark, conf, tmp_path_factory):
    df = td.rects(spark, SF_DIR)
    path = str(tmp_path_factory.mktemp("knnidx") / "idx")
    return index_build.build_index(df, path, conf), df


def test_seed_radius_is_certified(stored, rects_pdf):
    idx, _ = stored
    rel = idx.relation()
    r = rel.seed_knn_radius(*P, K)
    assert r is not None and r > 0
    p = rects_pdf
    dx = np.maximum.reduce([p.xmin - P[0], P[0] - p.xmax, np.zeros(len(p))])
    dy = np.maximum.reduce([p.ymin - P[1], P[1] - p.ymax, np.zeros(len(p))])
    d2 = np.asarray(dx * dx + dy * dy)
    assert int((d2 <= r * r).sum()) >= K  # the radius really holds ≥ k rows


def test_seeded_knn_matches_bruteforce(stored, rects_pdf, conf):
    idx, df = stored
    got = {r.id for r in knn.knn_query(idx.relation(), *P, K).collect()}
    # brute force with tie inclusion
    p = rects_pdf
    dx = np.maximum.reduce([p.xmin - P[0], P[0] - p.xmax, np.zeros(len(p))])
    dy = np.maximum.reduce([p.ymin - P[1], P[1] - p.ymax, np.zeros(len(p))])
    d2 = np.asarray(dx * dx + dy * dy)
    kth = np.sort(d2)[K - 1]
    assert got == set(p.id[d2 <= kth])
    # and equals the unseeded (derived-relation) path
    rel2 = SpatialRelation(df, conf, max_extent=(td.MAX_EXTENT,) * 2)
    assert got == {r.id for r in knn.knn_query(rel2, *P, K).collect()}


def test_knn_cache_released(stored, spark):
    """The kNN candidate persist must be released per call: over 3 calls
    the persistent-RDD count may grow only by the (tiny) localCheckpoint
    blocks (≤ 1 each), never by the full candidate caches too (2 each)."""
    idx, _ = stored
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    before = jmap.size()
    rel = idx.relation()
    for _ in range(3):
        knn.knn_query(rel, *P, K).collect()
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after - before <= 3


def test_knn_join_matches_per_query_bruteforce(spark, conf, rects_pdf):
    """Batch kNN join ≡ per-query tie-inclusive brute force."""
    from pyspark.sql import functions as F

    df = td.rects(spark, SF_DIR)
    rel = SpatialRelation(df, conf, max_extent=(td.MAX_EXTENT,) * 2)
    qs = spark.createDataFrame(
        [(1, 0.5, 0.5), (2, 0.05, 0.95), (3, 0.99, 0.01)],
        "qid long, qx double, qy double",
    )
    got = {}
    for r in knn.knn_join(rel, qs, 10).collect():
        got.setdefault(r.qid, set()).add((r.id, r.dist2))
    p = rects_pdf
    for qid, qx, qy in [(1, 0.5, 0.5), (2, 0.05, 0.95), (3, 0.99, 0.01)]:
        dx = np.maximum.reduce([p.xmin - qx, qx - p.xmax, np.zeros(len(p))])
        dy = np.maximum.reduce([p.ymin - qy, qy - p.ymax, np.zeros(len(p))])
        d2 = np.asarray(dx * dx + dy * dy)
        kth = np.sort(d2)[9]
        want = set(zip(p.id[d2 <= kth], d2[d2 <= kth]))
        assert got[qid] == want, qid


def test_knn_join_fallback_min_k_n(spark):
    """k > N: every query still gets all N rows (no-cap fallback)."""
    from libspatialindex_spark.config import EngineConfig

    rows = [(1, 0.1, 0.1, 0.2, 0.2), (2, 0.8, 0.8, 0.9, 0.9)]
    df = spark.createDataFrame(
        rows, "id long, xmin double, ymin double, xmax double, ymax double"
    )
    rel = SpatialRelation(df, EngineConfig(), max_extent=(0.1, 0.1))
    qs = spark.createDataFrame(
        [(7, 0.0, 0.0), (8, 1.0, 1.0)], "qid long, qx double, qy double"
    )
    got = {}
    for r in knn.knn_join(rel, qs, 5).collect():
        got.setdefault(r.qid, set()).add(r.id)
    assert got == {7: {1, 2}, 8: {1, 2}}


def test_knn_join_non_unit_world_terminates_complete(spark):
    """ADVICE r2: on a non-unit world (1000 wide) the absolute r0 =
    knn_ring_init needs ~16+ doublings to reach world_r — the loop must
    keep going until every query resolves (no silent drops)."""
    from libspatialindex_spark.config import EngineConfig

    rows = [
        (i, 100.0 * i, 100.0 * i, 100.0 * i + 1.0, 100.0 * i + 1.0)
        for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, "id long, xmin double, ymin double, xmax double, ymax double"
    )
    rel = SpatialRelation(
        df, EngineConfig(world=(0.0, 0.0, 1000.0, 1000.0)),
        max_extent=(1.0, 1.0),
    )
    qs = spark.createDataFrame(
        [(7, 0.0, 0.0), (8, 950.0, 950.0)], "qid long, qx double, qy double"
    )
    got = {}
    for r in knn.knn_join(rel, qs, 3).collect():
        got.setdefault(r.qid, set()).add(r.id)
    # every query resolved with exactly its true 3NN
    assert set(got) == {7, 8}
    assert got[7] == {0, 1, 2}
    assert got[8] == {9, 8, 7}


BOXQ = (0.48, 0.47, 0.53, 0.52)


def _brute_box_knn(p, q, k):
    """Numpy oracle: Region↔Region min dist (Region.cc:314-338), tie-incl."""
    qxmin, qymin, qxmax, qymax = q
    dx = np.maximum.reduce(
        [p.xmin - qxmax, qxmin - p.xmax, np.zeros(len(p))]
    )
    dy = np.maximum.reduce(
        [p.ymin - qymax, qymin - p.ymax, np.zeros(len(p))]
    )
    d2 = np.asarray(dx * dx + dy * dy)
    kth = np.sort(d2)[k - 1]
    return set(p.id[d2 <= kth])


def test_box_knn_matches_bruteforce(stored, rects_pdf, conf):
    """VERDICT r3 #4: nearestNeighborQuery with a Region query shape
    (Index_NearestNeighbors_obj passes a min/max box) — seeded stored path
    AND plain-relation ring path both equal the numpy oracle."""
    idx, df = stored
    want = _brute_box_knn(rects_pdf, BOXQ, K)
    got = {r.id for r in knn.knn_box_query(idx.relation(), *BOXQ, K).collect()}
    assert got == want
    rel = SpatialRelation(df, conf, max_extent=(td.MAX_EXTENT,) * 2)
    got2 = {r.id for r in knn.knn_box_query(rel, *BOXQ, K).collect()}
    assert got2 == want


def test_box_knn_ties_inside_box(stored, rects_pdf):
    """Every entry intersecting the query box has distance 0 — with a box
    big enough to contain > k entries, ALL of them are coincident at the
    k-th distance and must be returned (the RTree.cc:760-762 tie rule)."""
    idx, _ = stored
    big = (0.3, 0.3, 0.7, 0.7)
    p = rects_pdf
    inside = (
        ~((p.xmin > big[2]) | (p.xmax < big[0])
          | (p.ymin > big[3]) | (p.ymax < big[1]))
    )
    n_inside = int(inside.sum())
    assert n_inside > K  # the tie group genuinely exceeds k
    out = knn.knn_box_query(idx.relation(), *big, K)
    got = {r.id for r in out.collect()}
    assert got == set(p.id[inside])  # all zero-distance ties kept


def test_point_knn_is_degenerate_box(stored):
    idx, _ = stored
    rel = idx.relation()
    a = {(r.id, r.dist2) for r in knn.knn_query(rel, *P, K).collect()}
    b = {
        (r.id, r.dist2)
        for r in knn.knn_box_query(rel, P[0], P[1], P[0], P[1], K).collect()
    }
    assert a == b


def test_knn_custom_comparator(stored, rects_pdf):
    """INearestNeighborComparator overload: rank by a caller-supplied
    metric (here: distance of the box CENTER to P under L1) — checked
    against numpy, tie-inclusive."""
    from pyspark.sql import functions as F

    idx, _ = stored
    rel = idx.relation()
    expr = (
        F.abs((F.col("xmin") + F.col("xmax")) / 2 - P[0])
        + F.abs((F.col("ymin") + F.col("ymax")) / 2 - P[1])
    )
    got = {r.id for r in knn.knn_query_custom(rel, expr, K).collect()}
    p = rects_pdf
    d = np.abs((p.xmin + p.xmax) / 2 - P[0]) + np.abs((p.ymin + p.ymax) / 2 - P[1])
    d = np.asarray(d)
    kth = np.sort(d)[K - 1]
    assert got == set(p.id[d <= kth])


def test_knn_join_driver_and_distributed_tiers_agree(spark):
    """r6 two-tier seed: driver-side radii (queries ≤ driver_seed_cap)
    and the distributed pandas-UDF path must produce the identical
    tie-inclusive result set."""
    from libspatialindex_spark.operators import knn
    from libspatialindex_spark.operators.relation import SpatialRelation
    from libspatialindex_spark.config import EngineConfig
    from libspatialindex_spark.sources import testdata as td

    sf = "/root/testdata/sf0.001"
    rel = SpatialRelation(
        td.rects(spark, sf), EngineConfig(),
        max_extent=(td.MAX_EXTENT, td.MAX_EXTENT),
    )
    td.register_views(spark, sf)
    q = spark.sql(
        f"SELECT qid, qxmin AS qx, qymin AS qy FROM ({td.WINDOWS_SQL.strip()})"
    )
    a = {(r.qid, r.id, r.dist2) for r in knn.knn_join(rel, q, 5).collect()}
    b = {
        (r.qid, r.id, r.dist2)
        for r in knn.knn_join(rel, q, 5, driver_seed_cap=0).collect()
    }
    assert a == b and len(a) >= 5


def test_knn_join_no_extent_fallback_matches(spark, conf):
    """r6: _knn_join_candidates has two shapes — single-cell entry keying
    when max_extent is known, both-side explode + corner dedup otherwise.
    Both must produce the identical kNN-join result."""
    df = td.rects(spark, SF_DIR)
    q = spark.sql(
        "SELECT qid, qxmin AS qx, qymin AS qy FROM (" + td.WINDOWS_SQL + ")"
    ).limit(40)
    with_ext = SpatialRelation(
        df, conf, max_extent=(td.MAX_EXTENT, td.MAX_EXTENT)
    )
    no_ext = SpatialRelation(df, conf, max_extent=None)
    a = {
        (r.qid, r.id, r.dist2)
        for r in knn.knn_join(with_ext, q, K).collect()
    }
    b = {
        (r.qid, r.id, r.dist2)
        for r in knn.knn_join(no_ext, q, K).collect()
    }
    assert a == b and len(a) >= K
