"""Exact convex-ring point-in-polygon refinement (beyond MBR parity)."""

import math

import pytest
from pyspark.sql import functions as F

from libspatialindex_spark.config import EngineConfig
from libspatialindex_spark.operators import spatial_join
from libspatialindex_spark.operators.relation import BoxCols


@pytest.fixture(scope="module")
def layers(spark):
    # A CCW triangle and a CCW hexagon, each with its MBR.
    tri = [(0.2, 0.2), (0.6, 0.2), (0.4, 0.6)]
    hexa = [
        (0.7 + 0.1 * math.cos(a), 0.7 + 0.1 * math.sin(a))
        for a in [i * math.pi / 3 for i in range(6)]
    ]

    def row(pid, ring):
        xs = [p[0] for p in ring]
        ys = [p[1] for p in ring]
        return (
            pid, min(xs), min(ys), max(xs), max(ys),
            [{"x": float(x), "y": float(y)} for x, y in ring],
        )

    polys = spark.createDataFrame(
        [row(1, tri), row(2, hexa)],
        "poly_id long, pxmin double, pymin double, pxmax double, "
        "pymax double, vertices array<struct<x:double,y:double>>",
    )
    pts = spark.createDataFrame(
        [
            (1, 0.4, 0.3),    # inside triangle
            (2, 0.21, 0.55),  # inside triangle MBR, outside the ring
            (3, 0.7, 0.7),    # hexagon center
            (4, 0.78, 0.75),  # inside hexagon MBR, outside the ring
            (5, 0.05, 0.05),  # outside everything
        ],
        ["id", "x", "y"],
    )
    return pts, polys


def test_mbr_stage_then_convex_refine(layers):
    pts, polys = layers
    conf = EngineConfig()
    box = BoxCols("pxmin", "pymin", "pxmax", "pymax")
    mbr_hits = spatial_join.point_in_box_join(
        pts, polys, "x", "y", box, conf, broadcast_boxes=True
    )
    assert {(r.id, r.poly_id) for r in mbr_hits.select("id", "poly_id").collect()} == {
        (1, 1), (2, 1), (3, 2), (4, 2)
    }
    exact = spatial_join.convex_pip_refine(mbr_hits, "x", "y")
    assert {(r.id, r.poly_id) for r in exact.select("id", "poly_id").collect()} == {
        (1, 1), (3, 2)
    }
