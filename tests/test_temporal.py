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