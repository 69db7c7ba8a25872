"""Segment×segment predicate: the reference's own geometry truth table
(``test/geometry/Intersection.cc``) plus the orientation/collinearity edge
cases of ``LineSegment.cc:427-483`` (VERDICT r2 #8)."""

import pytest
from pyspark.sql import functions as F

from libspatialindex_spark.functions import geometry as G


def _eval(spark, cases):
    """cases: list of (ax, ay, bx, by, cx, cy, dx, dy); returns bools."""
    df = spark.createDataFrame(
        [(i, *[float(v) for v in c]) for i, c in enumerate(cases)],
        "i long, ax double, ay double, bx double, by double, "
        "cx double, cy double, dx double, dy double",
    )
    pred = G.segment_intersects_segment(
        F.col("ax"), F.col("ay"), F.col("bx"), F.col("by"),
        F.col("cx"), F.col("cy"), F.col("dx"), F.col("dy"),
    )
    rows = df.select("i", pred.alias("hit")).collect()
    return [r.hit for r in sorted(rows, key=lambda r: r.i)]


def test_reference_truth_table(spark):
    """Intersection.cc's segment block verbatim: ls1=(1,0)-(3,2),
    ls2=(2,0)-(2,4) → true; ls1 vs ls3=(2,3)-(2,4) → false."""
    got = _eval(spark, [
        (1, 0, 3, 2, 2, 0, 2, 4),   # proper crossing   → True
        (1, 0, 3, 2, 2, 3, 2, 4),   # above, no touch   → False
    ])
    assert got == [True, False]


def test_collinear_and_touch_edges(spark):
    got = _eval(spark, [
        # collinear overlap on a diagonal
        (0, 0, 2, 2, 1, 1, 3, 3),            # True
        # collinear, disjoint
        (0, 0, 1, 1, 2, 2, 3, 3),            # False
        # touch exactly at a shared endpoint (endpoints inclusive)
        (0, 0, 1, 1, 1, 1, 2, 0),            # True
        # endpoint ON the interior of the other segment (T-shape)
        (0, 0, 2, 0, 1, 0, 1, 5),            # True
        # parallel, never meet
        (0, 0, 2, 0, 0, 1, 2, 1),            # False
        # vertical base segment: between() must compare on the y axis
        (1, 0, 1, 4, 1, 2, 1, 3),            # collinear sub-segment → True
        (1, 0, 1, 4, 1, 5, 1, 6),            # collinear beyond      → False
        # degenerate segment (a point) lying on the other segment
        (1, 1, 1, 1, 0, 0, 2, 2),            # True
        # degenerate segment OFF the other segment: the reference's
        # between() (LineSegment.cc:454-465) takes the "vertical" branch
        # for a point segment (pA[0]==pB[0]) and compares ONLY y — so
        # (3,0) vs (0,0)-(2,2) reports True.  Matched bit-for-bit.
        (3, 0, 3, 0, 0, 0, 2, 2),            # True (reference semantics)
    ])
    assert got == [True, False, True, True, False, True, False, True, True]


def test_reference_region_segment_block(spark):
    """Intersection.cc's Region×LineSegment block through
    segment_intersects_box: r1=(1,1)-(2.5,3) hits ls1; r2=(1,2)-(2.5,3)
    misses; r3=(0,-1)-(4,3) CONTAINS ls1 (containment counts)."""
    df = spark.range(1)
    ls1 = (1.0, 0.0, 3.0, 2.0)

    def hit(box):
        pred = G.segment_intersects_box(*ls1, *box)
        return df.select(pred.alias("h")).collect()[0].h

    assert hit((1.0, 1.0, 2.5, 3.0)) is True
    assert hit((1.0, 2.0, 2.5, 3.0)) is False
    assert hit((0.0, -1.0, 4.0, 3.0)) is True


def test_matches_shapely_free_bruteforce(spark):
    """Exhaustive cross-check against an independent pure-python oracle
    (orientation + on-segment, the CLRS formulation) over a 5-point
    lattice — every sign/collinearity branch.  Degenerate (point) segments
    are excluded: there the reference's one-axis between() intentionally
    diverges from the bbox formulation (covered above)."""
    import itertools

    def py_seg(a, b, c, d):
        def area(p, q, r):
            return (q[0] - p[0]) * (r[1] - p[1]) - (r[0] - p[0]) * (q[1] - p[1])

        def onseg(p, q, r):  # r collinear with pq: is it within the bbox?
            return (
                min(p[0], q[0]) <= r[0] <= max(p[0], q[0])
                and min(p[1], q[1]) <= r[1] <= max(p[1], q[1])
            )

        d1, d2 = area(c, d, a), area(c, d, b)
        d3, d4 = area(a, b, c), area(a, b, d)
        if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)) and all(
            x != 0 for x in (d1, d2, d3, d4)
        ):
            return True
        if d3 == 0 and onseg(a, b, c):
            return True
        if d4 == 0 and onseg(a, b, d):
            return True
        if d1 == 0 and onseg(c, d, a):
            return True
        if d2 == 0 and onseg(c, d, b):
            return True
        return False

    pts = [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0), (2.0, 1.0)]
    cases, want = [], []
    for a, b, c, d in itertools.product(pts, repeat=4):
        if a == b or c == d:
            continue
        cases.append((*a, *b, *c, *d))
        want.append(py_seg(a, b, c, d))
    got = _eval(spark, cases)
    assert got == want


# ---------------------------------------------------- segment distances --


def _np_pt_seg_d2(px, py, x1, y1, x2, y2):
    import numpy as np

    dx, dy = x2 - x1, y2 - y1
    l2 = dx * dx + dy * dy
    if l2 == 0.0:
        t = np.zeros_like(px)
    else:
        t = np.clip(((px - x1) * dx + (py - y1) * dy) / l2, 0.0, 1.0)
    ex, ey = x1 + t * dx, y1 + t * dy
    return (px - ex) ** 2 + (py - ey) ** 2


def _rand_boxes(n=400, seed=7):
    import numpy as np

    rng = np.random.default_rng(seed)
    x0 = rng.uniform(0, 1, n)
    y0 = rng.uniform(0, 1, n)
    w = rng.uniform(0, 0.2, n)
    h = rng.uniform(0, 0.2, n)
    return x0, y0, x0 + w, y0 + h


def test_point_segment_distance_matches_numpy(spark):
    """min_dist2_segment_point (true clamped metric) vs a numpy oracle,
    incl. a degenerate (zero-length) segment."""
    import numpy as np

    rng = np.random.default_rng(3)
    px, py = rng.uniform(-0.5, 1.5, 500), rng.uniform(-0.5, 1.5, 500)
    for seg in [(0.2, 0.3, 0.7, 0.6), (0.4, 0.9, 0.4, 0.1), (0.5, 0.5, 0.5, 0.5)]:
        want = _np_pt_seg_d2(px, py, *seg)
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(px, py)], "px double, py double"
        )
        got = (
            df.select(
                G.min_dist2_segment_point(
                    *seg, F.col("px"), F.col("py")
                ).alias("d2")
            ).toPandas()["d2"].to_numpy()
        )
        assert np.allclose(got, want, rtol=0, atol=1e-12), seg


def test_line_dist_point_reference_quirks(spark):
    """line_dist_point reproduces the reference's getMinimumDistance(Point)
    exactly (LineSegment.cc:246-273): vertical → |px−x1| (y IGNORED),
    horizontal → |py−y1|, else unclamped perpendicular line distance."""
    rows = [
        # vertical segment x=0.4: point far beyond the endpoint still
        # measures |px−0.4| — the documented quirk
        ((0.4, 0.0, 0.4, 0.2), (0.9, 50.0), 0.5),
        # horizontal segment y=0.3
        ((0.1, 0.3, 0.8, 0.3), (-20.0, 0.8), 0.5),
        # diagonal: perpendicular to the infinite line, NOT clamped
        ((0.0, 0.0, 1.0, 1.0), (2.0, 0.0), 2.0 ** 0.5),
    ]
    for seg, (px, py), want in rows:
        df = spark.range(1)
        got = df.select(
            G.line_dist_point(*seg, F.lit(px), F.lit(py)).alias("d")
        ).collect()[0]["d"]
        assert abs(got - want) < 1e-12, (seg, px, py, got, want)


@pytest.mark.parametrize("seg", [
    (0.2, 0.3, 0.7, 0.6),    # generic diagonal
    (0.4, 0.1, 0.4, 0.9),    # vertical
    (0.1, 0.55, 0.9, 0.55),  # horizontal
    (0.5, 0.5, 0.5, 0.5),    # degenerate (point)
    (0.9, 0.8, 0.1, 0.2),    # reversed orientation
])
def test_segment_box_distance_matches_numpy(spark, seg):
    """min_dist2_segment_box vs a brute-force numpy oracle (dense sampling
    of the segment → point↔box distances, plus corner↔segment), over 400
    random boxes; zero iff the Liang-Barsky clip reports a hit."""
    import numpy as np
    x0, y0, x1b, y1b = _rand_boxes()
    # oracle: min over (segment endpoints → box, box corners → segment,
    # dense segment sample → box) — sampling only TIGHTENS the upper
    # bound; the first two families make it exact for disjoint pairs
    t = np.linspace(0, 1, 2001)
    sx = seg[0] + t * (seg[2] - seg[0])
    sy = seg[1] + t * (seg[3] - seg[1])
    want = np.empty(len(x0))
    for i in range(len(x0)):
        dx = np.maximum.reduce([x0[i] - sx, sx - x1b[i], np.zeros_like(sx)])
        dy = np.maximum.reduce([y0[i] - sy, sy - y1b[i], np.zeros_like(sy)])
        d2_samp = (dx * dx + dy * dy).min()
        corners = np.array(
            [[x0[i], y0[i]], [x0[i], y1b[i]], [x1b[i], y0[i]], [x1b[i], y1b[i]]]
        )
        d2_corn = _np_pt_seg_d2(corners[:, 0], corners[:, 1], *seg).min()
        want[i] = min(d2_samp, d2_corn)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c), float(d))
         for a, b, c, d in zip(x0, y0, x1b, y1b)],
        "xmin double, ymin double, xmax double, ymax double",
    )
    got = (
        df.select(
            G.min_dist2_segment_box(
                *seg, F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax")
            ).alias("d2")
        ).toPandas()["d2"].to_numpy()
    )
    assert np.allclose(got, want, rtol=0, atol=1e-7)
    assert (got == 0.0).any() and (got > 0).any()  # both branches exercised


def test_knn_segment_query_matches_bruteforce(spark, conf):
    """Segment-query kNN (seeded stored path + plain ring path) vs the
    numpy oracle, tie-inclusive."""
    import numpy as np

    from libspatialindex_spark.operators import index_build, knn
    from libspatialindex_spark.operators.relation import SpatialRelation
    from libspatialindex_spark.sources import testdata as td
    from tests.conftest import SF_DIR

    seg, k = (0.2, 0.3, 0.7, 0.6), 10
    df = td.rects(spark, SF_DIR)
    p = df.toPandas()
    t = np.linspace(0, 1, 4001)
    sx = seg[0] + t * (seg[2] - seg[0])
    sy = seg[1] + t * (seg[3] - seg[1])
    d2 = np.empty(len(p))
    for i in range(len(p)):
        dx = np.maximum.reduce(
            [p.xmin[i] - sx, sx - p.xmax[i], np.zeros_like(sx)]
        )
        dy = np.maximum.reduce(
            [p.ymin[i] - sy, sy - p.ymax[i], np.zeros_like(sy)]
        )
        corners = np.array(
            [[p.xmin[i], p.ymin[i]], [p.xmin[i], p.ymax[i]],
             [p.xmax[i], p.ymin[i]], [p.xmax[i], p.ymax[i]]]
        )
        d2[i] = min(
            (dx * dx + dy * dy).min(),
            _np_pt_seg_d2(corners[:, 0], corners[:, 1], *seg).min(),
        )
    kth = np.sort(d2)[k - 1]
    want = set(p.id[d2 <= kth + 1e-12])
    rel = SpatialRelation(df, conf, max_extent=(td.MAX_EXTENT,) * 2)
    got = {r.id for r in knn.knn_segment_query(rel, *seg, k).collect()}
    assert got == want
    import tempfile

    idx = index_build.build_index(df, tempfile.mkdtemp() + "/segidx", conf)
    got2 = {
        r.id for r in knn.knn_segment_query(idx.relation(), *seg, k).collect()
    }
    assert got2 == want
