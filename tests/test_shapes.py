"""Ball / LineSegment / touches predicates vs numpy brute force, and kNN
through the stored-index pruning path."""

import numpy as np
import pytest

from libspatialindex_spark.operators import index_build, knn, range_query
from libspatialindex_spark.sources import testdata as td
from tests.conftest import SF_DIR


def test_ball_query_matches_numpy(rects_rel, rects_pdf):
    cx, cy, r = 0.5, 0.5, 0.08
    got = {r_.id for r_ in range_query.ball_query(rects_rel, cx, cy, r).collect()}
    dx = np.maximum.reduce(
        [rects_pdf.xmin - cx, cx - rects_pdf.xmax, np.zeros(len(rects_pdf))]
    )
    dy = np.maximum.reduce(
        [rects_pdf.ymin - cy, cy - rects_pdf.ymax, np.zeros(len(rects_pdf))]
    )
    want = set(rects_pdf.id[(dx * dx + dy * dy) <= r * r])
    assert got == want and got


def _seg_hits(pdf, x1, y1, x2, y2):
    # Liang-Barsky reference implementation
    out = set()
    dx, dy = x2 - x1, y2 - y1
    for _, r in pdf.iterrows():
        t0, t1 = 0.0, 1.0
        ok = True
        for p, d, lo, hi in ((x1, dx, r.xmin, r.xmax), (y1, dy, r.ymin, r.ymax)):
            if d == 0:
                if not (lo <= p <= hi):
                    ok = False
                    break
            else:
                ta, tb = (lo - p) / d, (hi - p) / d
                t0, t1 = max(t0, min(ta, tb)), min(t1, max(ta, tb))
        if ok and t0 <= t1:
            out.add(r.id)
    return out


def test_segment_query_matches_reference_clipper(rects_rel, rects_pdf):
    seg = (0.1, 0.9, 0.9, 0.1)
    got = {r.id for r in range_query.segment_query(rects_rel, *seg).collect()}
    want = _seg_hits(rects_pdf, *seg)
    assert got == want and got


def test_touches_query_boundary_only(spark, conf):
    from libspatialindex_spark.operators.relation import SpatialRelation

    df = spark.createDataFrame(
        [
            # Region.cc:292-309: touch = low-low or high-high coincidence on
            # any dim; low↔high contact (row 1) does NOT count.
            (1, 0.0, 0.0, 0.5, 0.5),   # its xmax meets window xmin — no
            (2, 0.5, 0.2, 0.7, 0.4),   # shares low x = 0.5 — yes
            (3, 0.6, 0.6, 0.8, 0.8),   # inside, no coincident bound — no
            (4, 0.2, 0.3, 1.0, 0.45),  # shares high x = 1.0 — yes
        ],
        ["id", "xmin", "ymin", "xmax", "ymax"],
    )
    rel = SpatialRelation(df, conf)
    got = {
        r.id
        for r in range_query.touches_query(rel, 0.5, 0.5, 1.0, 1.0).collect()
    }
    assert got == {2, 4}


def test_knn_through_stored_index(spark, conf, tmp_path, rects_pdf):
    idx = index_build.build_index(
        td.rects(spark, SF_DIR), str(tmp_path / "idx"), conf
    )
    rel = idx.relation()
    px, py, k = 0.31, 0.77, 12
    got = {r.id for r in knn.knn_query(rel, px, py, k).collect()}
    dx = np.maximum.reduce(
        [rects_pdf.xmin - px, px - rects_pdf.xmax, np.zeros(len(rects_pdf))]
    )
    dy = np.maximum.reduce(
        [rects_pdf.ymin - py, py - rects_pdf.ymax, np.zeros(len(rects_pdf))]
    )
    d2 = dx * dx + dy * dy
    kth = np.sort(d2)[k - 1]
    assert got == set(rects_pdf.id[d2 <= kth])
