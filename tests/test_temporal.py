"""Q9/Q10 temporal query tests vs pandas brute force."""

import numpy as np
import pytest

from libspatialindex_spark.operators import temporal
from libspatialindex_spark.operators.relation import SpatialRelation
from libspatialindex_spark.sources import testdata as td
from tests.conftest import SF_DIR

W = (0.25, 0.25, 0.45, 0.45)


@pytest.fixture(scope="module")
def rt(spark):
    td.register_views(spark, SF_DIR)
    return spark.sql(td.RECTS_T_SQL)


@pytest.fixture(scope="module")
def mov(spark):
    td.register_views(spark, SF_DIR)
    return spark.sql(td.MOVING_SQL)


def test_time_range_query(rt, conf):
    rel = SpatialRelation(rt, conf, max_extent=(td.MAX_EXTENT,) * 2)
    got = {
        r.id
        for r in temporal.time_range_query(rel, *W, 100.0, 300.0).collect()
    }
    pdf = rt.toPandas()
    m = (
        (pdf.tstart < 300.0) & (pdf.tend > 100.0)
        & ~(
            (pdf.xmin > W[2]) | (pdf.xmax < W[0])
            | (pdf.ymin > W[3]) | (pdf.ymax < W[1])
        )
    )
    assert got == set(pdf.id[m])
    assert got  # non-trivial


def test_time_range_rightopen_boundary(rt, conf):
    """[tstart, tend) is right-open: a query starting exactly at tend must
    NOT match that entry; one ending exactly at tstart must not either."""
    rel = SpatialRelation(rt, conf, max_extent=(td.MAX_EXTENT,) * 2)
    row = rt.first()
    full = (0.0, 0.0, 1.1, 1.1)
    hit = {
        r.id
        for r in temporal.time_range_query(
            rel, *full, row.tend, row.tend + 0.5
        ).collect()
    }
    assert row.id not in hit
    hit2 = {
        r.id
        for r in temporal.time_range_query(
            rel, *full, row.tstart - 0.5, row.tstart
        ).collect()
    }
    assert row.id not in hit2


def test_moving_range_query(mov):
    t0, t1 = 0.0, 512.0
    got = {r.id for r in temporal.moving_range_query(mov, *W, t0, t1).collect()}
    pdf = mov.toPandas()
    want = set()
    for _, r in pdf.iterrows():
        tx = _axis(r.x, r.vx, W[0], W[2])
        ty = _axis(r.y, r.vy, W[1], W[3])
        enter = max(tx[0], ty[0], t0)
        leave = min(tx[1], ty[1], t1)
        if enter <= leave:
            want.add(r.id)
    assert got == want
    assert got


def _axis(p, v, lo, hi):
    if v == 0.0:
        return (-1e18, 1e18) if lo <= p <= hi else (1e18, -1e18)
    ta, tb = (lo - p) / v, (hi - p) / v
    return (min(ta, tb), max(ta, tb))


def test_moving_stationary_point_inside(spark):
    df = spark.createDataFrame(
        [(1, 0.3, 0.3, 0.0, 0.0), (2, 0.9, 0.9, 0.0, 0.0)],
        ["id", "x", "y", "vx", "vy"],
    )
    got = {r.id for r in temporal.moving_range_query(df, *W, 0.0, 10.0).collect()}
    assert got == {1}


def test_moving_enters_window_later(spark):
    # starts outside, velocity carries it into the window within [0, 100]
    df = spark.createDataFrame(
        [(1, 0.0, 0.3, 0.004, 0.0), (2, 0.0, 0.3, -0.004, 0.0)],
        ["id", "x", "y", "vx", "vy"],
    )
    got = {r.id for r in temporal.moving_range_query(df, *W, 0.0, 100.0).collect()}
    assert got == {1}

# ------------------------------------------------------- MVR multi-version --


def test_versions_from_ops_fold(spark):
    """Insert/delete timeline folds into validity intervals; re-insert of
    the same id with a different box is a distinct version; an entry never
    deleted stays open."""
    rows = [
        (1, 7, 0.1, 0.1, 0.2, 0.2, 10.0),   # op=1 insert v1
        (0, 7, 0.1, 0.1, 0.2, 0.2, 20.0),   # delete v1
        (1, 7, 0.3, 0.3, 0.4, 0.4, 20.0),   # re-insert (v2, moved box)
        (0, 7, 0.3, 0.3, 0.4, 0.4, 50.0),   # delete v2
        (1, 8, 0.5, 0.5, 0.6, 0.6, 5.0),    # never deleted
    ]
    ops = spark.createDataFrame(
        rows, "op int, id long, xmin double, ymin double, "
              "xmax double, ymax double, t double"
    )
    v = {
        (r.id, r.tstart): (r.tend, r.xmin)
        for r in temporal.versions_from_ops(ops).collect()
    }
    assert v[(7, 10.0)] == (20.0, 0.1)
    assert v[(7, 20.0)] == (50.0, 0.3)
    assert v[(8, 5.0)][0] > 1e17  # open interval
    assert len(v) == 3


def test_mvr_query_dedups_across_versions(spark, conf):
    """An id whose v1 AND v2 both match the (time, window) query appears
    exactly once (MVRTree.cc:1283-1291 visitedData semantics)."""
    rows = [
        (1, 7, 0.30, 0.30, 0.35, 0.35, 10.0),
        (0, 7, 0.30, 0.30, 0.35, 0.35, 30.0),
        (1, 7, 0.31, 0.31, 0.36, 0.36, 30.0),  # both versions hit W below
        (0, 7, 0.31, 0.31, 0.36, 0.36, 60.0),
        (1, 9, 0.90, 0.90, 0.95, 0.95, 10.0),  # spatially out
        (0, 9, 0.90, 0.90, 0.95, 0.95, 60.0),
    ]
    ops = spark.createDataFrame(
        rows, "op int, id long, xmin double, ymin double, "
              "xmax double, ymax double, t double"
    )
    vers = temporal.versions_from_ops(ops)
    rel = SpatialRelation(vers, conf)
    got = temporal.time_range_query(rel, *W, 0.0, 100.0).select("id").collect()
    assert [r.id for r in got] == [7]  # once, despite two matching versions


def test_mvr_fixture_has_multiversion_ids(spark):
    """The derived op-stream fixture must actually exercise versioning."""
    td.register_views(spark, SF_DIR)
    vers = temporal.versions_from_ops(spark.sql(td.MVR_OPS_SQL))
    from pyspark.sql import functions as F

    multi = (
        vers.groupBy("id").count().filter(F.col("count") > 1).count()
    )
    assert multi > 0


# ----------------------------------------------------- MovingRegion algebra --


def test_moving_region_vs_pandas(spark):
    td.register_views(spark, SF_DIR)
    mr = spark.sql(td.MOVING_REGIONS_SQL)
    t0, t1 = 0.0, 512.0
    got = {
        r.id
        for r in temporal.moving_region_range_query(mr, *W, t0, t1).collect()
    }
    pdf = mr.toPandas()
    want = set()
    for _, r in pdf.iterrows():
        iv = [t0, t1]
        for c0, c1, bound, upper in (
            (r.xmin, r.vxlo, W[2], True),
            (r.xmax, r.vxhi, W[0], False),
            (r.ymin, r.vylo, W[3], True),
            (r.ymax, r.vyhi, W[1], False),
        ):
            if c1 == 0.0:
                ok = c0 <= bound if upper else c0 >= bound
                lo, hi = (-1e18, 1e18) if ok else (1e18, -1e18)
            else:
                t = (bound - c0) / c1
                if (c1 > 0) == upper:
                    lo, hi = -1e18, t
                else:
                    lo, hi = t, 1e18
            iv = [max(iv[0], lo), min(iv[1], hi)]
        if iv[0] <= iv[1]:
            want.add(r.id)
    assert got == want and got


def test_moving_region_growing_box_enters_late(spark):
    """A box whose high edge grows (vhi > vlo = 0) reaches the window even
    though its low edge never moves — the velocity-MBR algebra, not a
    point trajectory."""
    rows = [(1, 0.0, 0.3, 0.05, 0.35, 0.0, 0.0, 0.004, 0.0),
            (2, 0.0, 0.3, 0.05, 0.35, 0.0, 0.0, 0.0, 0.0)]
    df = spark.createDataFrame(
        rows, "id long, xmin double, ymin double, xmax double, ymax double, "
              "vxlo double, vylo double, vxhi double, vyhi double"
    )
    got = {
        r.id
        for r in temporal.moving_region_range_query(
            df, *W, 0.0, 100.0
        ).collect()
    }
    assert got == {1}  # id 2's static box never reaches x ≥ 0.25


def test_tpr_horizon_guard(spark):
    """TPRTree.cc:1211-1212 — queries outside [now, now+horizon) rejected."""
    df = spark.createDataFrame(
        [(1, 0.3, 0.3, 0.0, 0.0)], ["id", "x", "y", "vx", "vy"]
    )
    with pytest.raises(ValueError):
        temporal.moving_range_query(df, *W, 0.0, 600.0, horizon=512.0)
    # inside the horizon: fine
    temporal.moving_range_query(df, *W, 0.0, 100.0, horizon=512.0).collect()


def test_versions_from_ops_identical_box_reinsert(spark):
    """ADVICE r2: an id deleted and RE-inserted with an IDENTICAL box must
    fold into two clean versions via rank matching — the naive (id, mbr)
    join would cross-match (inverted [20, 20) / [10, 50) intervals).  Also
    covers the delete+insert-at-the-same-timestamp tie: the delete closes
    the OLD version."""
    rows = [
        (1, 7, 0.1, 0.1, 0.2, 0.2, 10.0),   # insert v1
        (0, 7, 0.1, 0.1, 0.2, 0.2, 20.0),   # delete v1
        (1, 7, 0.1, 0.1, 0.2, 0.2, 20.0),   # re-insert SAME box at t=20
        (0, 7, 0.1, 0.1, 0.2, 0.2, 50.0),   # delete v2
    ]
    ops = spark.createDataFrame(
        rows, "op int, id long, xmin double, ymin double, "
              "xmax double, ymax double, t double"
    )
    got = sorted(
        (r.tstart, r.tend) for r in temporal.versions_from_ops(ops).collect()
    )
    assert got == [(10.0, 20.0), (20.0, 50.0)]


def test_versions_sql_matches_engine_fold(spark):
    """MVR_VERSIONS_SQL (the shared oracle fold) and versions_from_ops must
    stay semantically identical — both rank-matched."""
    td.register_views(spark, SF_DIR)
    eng = temporal.versions_from_ops(spark.sql(td.MVR_OPS_SQL)).select(
        "id", "xmin", "tstart", "tend"
    )
    sql = spark.sql(td.MVR_VERSIONS_SQL).select("id", "xmin", "tstart", "tend")
    assert eng.exceptAll(sql).count() == 0
    assert sql.exceptAll(eng).count() == 0


def test_mvr_ops_builder_matches_sql(spark):
    """r6: the DataFrame op-stream builder (base CTE computed once) must be
    row-identical to the SQL text the DuckDB oracle embeds."""
    from libspatialindex_spark.sources import testdata as td
    from tests.conftest import SF_DIR

    a = td.mvr_ops(spark, SF_DIR)
    b = spark.sql(td.MVR_OPS_SQL)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
