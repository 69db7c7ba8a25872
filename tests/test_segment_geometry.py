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
