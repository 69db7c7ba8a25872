"""The sidx_api.h-shaped facade: lifecycle, queries, paging, mutations."""

import pytest
from pyspark.sql import functions as F

from libspatialindex_spark.api import Index
from libspatialindex_spark.sources import testdata as td
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def idx(spark, conf, tmp_path_factory):
    df = td.rects(spark, SF_DIR)
    return Index.create(
        df, str(tmp_path_factory.mktemp("api") / "idx"), conf
    ), df


def test_intersects_and_counts(idx, rects_pdf):
    index, df = idx
    w = (0.25, 0.25, 0.30, 0.30)
    rows = index.intersects(w).collect()
    assert index.intersects_count(w) == len(rows)
    assert index.contains_count(w) <= len(rows)


def test_paging(idx):
    index, _ = idx
    w = (0.2, 0.2, 0.5, 0.5)
    full = [r.id for r in index.intersects(w, order_by="id").collect()]
    page = [r.id for r in index.intersects(w, offset=10, limit=5).collect()]
    assert page == sorted(full)[10:15]


def test_nearest_and_bounds(idx, rects_pdf):
    index, _ = idx
    nn = index.nearest(0.5, 0.5, 5)
    assert nn.count() >= 5
    b = index.bounds()
    assert b[0] == rects_pdf.xmin.min() and b[3] == rects_pdf.ymax.max()


def test_leaves_and_mutations(spark, conf, tmp_path):
    df = td.rects(spark, SF_DIR)
    keep = df.filter(F.col("id") % 5 != 0)
    extra = df.filter(F.col("id") % 5 == 0)
    index = Index.create(keep, str(tmp_path / "idx"), conf)
    n_leaves = index.leaves().count()
    assert n_leaves > 1
    index.insert(extra)
    assert index.is_valid()
    total = index.leaves().agg(F.sum("n_rows")).collect()[0][0]
    assert total == df.count()
    # NOTE: the fixture's ids are NOT unique (the synthetic lineitem has
    # duplicate (orderkey, linenumber) pairs) — delete-by-id removes every
    # row carrying a victim id, like the reference's exact-(mbr,id) delete
    # applied per match.
    victim_ids = {r.id for r in extra.limit(50).collect()}
    n_victim_rows = df.filter(F.col("id").isin([*victim_ids])).count()
    index.delete(spark.createDataFrame([(i,) for i in victim_ids], ["id"]))
    assert index.is_valid()
    total2 = index.leaves().agg(F.sum("n_rows")).collect()[0][0]
    assert total2 == df.count() - n_victim_rows


def test_load_existing(spark, conf, tmp_path):
    df = td.rects(spark, SF_DIR)
    Index.create(df, str(tmp_path / "idx"), conf)
    reloaded = Index.load(spark, str(tmp_path / "idx"), conf)
    assert reloaded.is_valid()
    assert reloaded.intersects_count((0.0, 0.0, 1.0, 1.0)) == df.count()


def test_offset_limit_traversal_order(idx):
    """order_by='traversal' pages in the stored index's own DFS order
    (bucket, z, id) — the sidx_api.cc:583-584 traversal-order analog."""
    from libspatialindex_spark.operators import range_query

    index, _ = idx
    W = (0.2, 0.2, 0.6, 0.6)
    hits = range_query.intersects_query(index.stored.relation(), *W)
    full = [
        (r.bucket, r.z, r.id)
        for r in range_query.with_offset_limit(
            hits, order_by="traversal"
        ).collect()
    ]
    assert full == sorted(full)  # really (bucket, z, id)-ordered
    page = [
        (r.bucket, r.z, r.id)
        for r in range_query.with_offset_limit(
            hits, order_by="traversal", offset=7, limit=5
        ).collect()
    ]
    assert page == full[7:12]


def test_nearest_shapes_facade(idx):
    """r4 query-shape surface: box (Index_NearestNeighbors_obj), segment,
    and custom-comparator kNN all flow through the facade and agree with
    the operator-level functions."""
    from pyspark.sql import functions as F2

    from libspatialindex_spark.operators import knn

    index, _ = idx
    rel = index._rel()
    w = (0.48, 0.47, 0.53, 0.52)
    a = {r.id for r in index.nearest_box(w, 5).collect()}
    assert a == {r.id for r in knn.knn_box_query(rel, *w, 5).collect()}
    seg = (0.2, 0.3, 0.7, 0.6)
    s = {r.id for r in index.nearest_segment(*seg, 5).collect()}
    assert s == {r.id for r in knn.knn_segment_query(rel, *seg, 5).collect()}
    expr = F2.abs((F2.col("xmin") + F2.col("xmax")) / 2 - 0.5)
    c = {r.id for r in index.nearest_custom(expr, 5).collect()}
    assert c == {r.id for r in knn.knn_query_custom(rel, expr, 5).collect()}
    assert len(a) >= 5 and len(s) >= 5 and len(c) >= 5
