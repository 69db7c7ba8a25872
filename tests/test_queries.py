"""Differential tests: engine operators vs a pandas brute-force oracle.

Port of the reference's golden-diff methodology
(``test/rtree/Exhaustive.cc`` + ``test/rtree/test{1..4}/run``): sorted
result sets must be identical.  Closed-interval semantics throughout
(``src/spatialindex/Region.cc:264-429``).
"""

import numpy as np
import pytest

from libspatialindex_spark.operators import knn, range_query, spatial_join

WINDOWS = [
    (0.25, 0.25, 0.30, 0.30),
    (0.0, 0.0, 1.0, 1.0),
    (0.5, 0.5, 0.5, 0.5),  # degenerate point window
    (0.9, 0.9, 1.5, 1.5),  # reaches past the world edge
]


def _oracle_intersects(pdf, q):
    m = ~(
        (pdf.xmin > q[2]) | (pdf.xmax < q[0])
        | (pdf.ymin > q[3]) | (pdf.ymax < q[1])
    )
    return set(pdf.id[m])


@pytest.mark.parametrize("q", WINDOWS)
def test_intersects(rects_rel, rects_pdf, q):
    got = {r.id for r in range_query.intersects_query(rects_rel, *q).collect()}
    assert got == _oracle_intersects(rects_pdf, q)


@pytest.mark.parametrize("q", WINDOWS[:2])
def test_contains_what(rects_rel, rects_pdf, q):
    got = {
        r.id for r in range_query.contains_what_query(rects_rel, *q).collect()
    }
    m = (
        (q[0] <= rects_pdf.xmin) & (rects_pdf.xmax <= q[2])
        & (q[1] <= rects_pdf.ymin) & (rects_pdf.ymax <= q[3])
    )
    assert got == set(rects_pdf.id[m])


def test_point_location(rects_rel, rects_pdf):
    px, py = 0.5, 0.5
    got = {
        r.id
        for r in range_query.point_location_query(rects_rel, px, py).collect()
    }
    m = (
        (rects_pdf.xmin <= px) & (px <= rects_pdf.xmax)
        & (rects_pdf.ymin <= py) & (py <= rects_pdf.ymax)
    )
    assert got == set(rects_pdf.id[m])


def _oracle_knn(pdf, px, py, k):
    """Exhaustive kNN with the reference tie rule (Exhaustive.cc:157-188):
    keep everything at distance ≤ the k-th smallest."""
    dx = np.maximum.reduce([pdf.xmin - px, px - pdf.xmax, np.zeros(len(pdf))])
    dy = np.maximum.reduce([pdf.ymin - py, py - pdf.ymax, np.zeros(len(pdf))])
    d2 = dx * dx + dy * dy
    kth = np.sort(d2)[min(k, len(d2)) - 1]
    return set(pdf.id[d2 <= kth])


@pytest.mark.parametrize(
    "px,py,k", [(0.5, 0.5, 10), (0.0, 0.0, 3), (0.999, 0.999, 25), (0.5, 0.5, 1)]
)
def test_knn_with_ties(rects_rel, rects_pdf, px, py, k):
    got = {r.id for r in knn.knn_query(rects_rel, px, py, k).collect()}
    want = _oracle_knn(rects_pdf, px, py, k)
    assert got == want
    assert len(got) >= min(k, len(rects_pdf))  # ties can only ADD rows


def test_knn_k_exceeds_n(rects_rel, rects_pdf):
    got = knn.knn_query(rects_rel, 0.5, 0.5, len(rects_pdf) + 50).count()
    assert got == len(rects_pdf)


def _oracle_self_join(pdf, q):
    """Exhaustive.cc:190-210 — both orders, id1 != id2, both intersect q."""
    w = pdf[
        ~(
            (pdf.xmin > q[2]) | (pdf.xmax < q[0])
            | (pdf.ymin > q[3]) | (pdf.ymax < q[1])
        )
    ]
    a = w.reset_index(drop=True)
    pairs = set()
    arr = a[["id", "xmin", "ymin", "xmax", "ymax"]].to_numpy()
    for i in range(len(arr)):
        ii = arr[i]
        hit = ~(
            (arr[:, 1] > ii[3]) | (arr[:, 3] < ii[1])
            | (arr[:, 2] > ii[4]) | (arr[:, 4] < ii[2])
        )
        for j in np.nonzero(hit)[0]:
            if arr[j][0] != ii[0]:
                pairs.add((int(ii[0]), int(arr[j][0])))
    return pairs


def test_self_join_both_orders(rects_rel, rects_pdf):
    q = (0.40, 0.40, 0.43, 0.43)
    got = {
        (r.id1, r.id2)
        for r in spatial_join.self_join_query(rects_rel, *q).collect()
    }
    want = _oracle_self_join(rects_pdf, q)
    assert got == want
    # both-order emission: for every (a,b) the mirror (b,a) is present
    assert all((b, a) in got for a, b in got)


def test_bounds(rects_rel, rects_pdf):
    b = range_query.bounds(rects_rel).collect()[0]
    assert b["xmin"] == rects_pdf.xmin.min()
    assert b["ymax"] == rects_pdf.ymax.max()


def test_offset_limit(rects_rel):
    df = range_query.intersects_query(rects_rel, 0.25, 0.25, 0.30, 0.30)
    full = [r.id for r in range_query.with_offset_limit(df, "id").collect()]
    page = [
        r.id
        for r in range_query.with_offset_limit(df, "id", offset=5, limit=10).collect()
    ]
    assert page == full[5:15]
