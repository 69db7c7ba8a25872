"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry runs a libspatialindex_spark engine operator over a
spatial fixture *derived deterministically* from the shared testdata tables
(see ``libspatialindex_spark/sources/testdata.py`` — exact dyadic-rational
coordinates, so Spark and the DuckDB oracle agree bit-for-bit).  The oracle
SQL implements the reference semantics (closed intervals, kNN ties,
both-order self-join pairs) as an independent brute-force query — a direct
port of the reference's differential-testing methodology
(``test/rtree/Exhaustive.cc``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from libspatialindex_spark.config import EngineConfig
from libspatialindex_spark.functions import curves
from libspatialindex_spark.operators import knn, range_query, spatial_join
from libspatialindex_spark.operators.relation import BoxCols, SpatialRelation
from libspatialindex_spark.sources import testdata as td

CONF = EngineConfig()

# Fixed query constants (all parse to identical doubles in both engines).
W = (0.25, 0.25, 0.30, 0.30)  # range window
P = (0.5, 0.5)  # point-location / kNN query point
K = 10  # kNN k (test/rtree/test1/run uses 10NN)
SJW = (0.40, 0.40, 0.43, 0.43)  # self-join restriction window
GK_LO, GK_HI = 524288, 525311  # grid-key strip (ix=512) for Q8
POLY_BOX = BoxCols("pxmin", "pymin", "pxmax", "pymax")


def _rects_rel(spark: SparkSession, sf_dir: str) -> SpatialRelation:
    # No z column here: Z-prune only pays when z is a *materialized* column
    # of a stored index (parquet attribute + zone maps).  On a derived
    # relation the data is scanned anyway, and filtering on a computed z
    # would make Catalyst substitute the deep Morton expression into every
    # BETWEEN (expression blow-up).  Exact codegen predicates only.
    df = td.rects(spark, sf_dir)
    return SpatialRelation(df, CONF, max_extent=(td.MAX_EXTENT, td.MAX_EXTENT))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: range-intersection query over the indexed rect fixture."""
    rel = _rects_rel(spark, "/root/testdata/sf0.001")
    return range_query.intersects_query(rel, *W).select(
        "id", "xmin", "ymin", "xmax", "ymax"
    )


# --------------------------------------------------------------- queries ---


def q01_range_intersects(spark, sf_dir):
    rel = _rects_rel(spark, sf_dir)
    return range_query.intersects_query(rel, *W).select(
        "id", "xmin", "ymin", "xmax", "ymax"
    )


def q02_containment(spark, sf_dir):
    rel = _rects_rel(spark, sf_dir)
    return range_query.contains_what_query(rel, *W).select("id")


def q03_point_location(spark, sf_dir):
    rel = _rects_rel(spark, sf_dir)
    return range_query.point_location_query(rel, *P).select("id")


def q04_knn(spark, sf_dir):
    rel = _rects_rel(spark, sf_dir)
    return knn.knn_query(rel, P[0], P[1], K).select("id", "dist2")


def q05_self_join(spark, sf_dir):
    rel = _rects_rel(spark, sf_dir)
    return spatial_join.self_join_query(rel, *SJW)


def q06_bounds(spark, sf_dir):
    rel = _rects_rel(spark, sf_dir)
    return range_query.bounds(rel)


def q07_count_range(spark, sf_dir):
    rel = _rects_rel(spark, sf_dir)
    return range_query.count_intersects(rel, *W)


def q08_key_range(spark, sf_dir):
    """Learned-index range query analog (SURVEY.md Q8): a sort-key range
    predicate on the grid key — `LearnedIndex.cc:450-453` routes to exactly
    this once the 'model' is the monotone curve key."""
    df = td.rects(spark, sf_dir)
    gkey = curves.cell_id(F.col("xmin"), F.col("ymin"), CONF, bits=10)
    return (
        df.withColumn("gkey", gkey)
        .filter(F.col("gkey").between(GK_LO, GK_HI))
        .select("id", "gkey")
    )


def q20_pip_join(spark, sf_dir):
    pts = td.points(spark, sf_dir)
    pol = td.polys(spark, sf_dir)
    return spatial_join.point_in_box_join(
        pts, pol, "x", "y", POLY_BOX, CONF, broadcast_boxes=True
    ).select("id", "poly_id")


def q21_tile_assign(spark, sf_dir):
    pts = td.points(spark, sf_dir)
    tile = curves.cell_id(F.col("x"), F.col("y"), CONF, bits=CONF.tile_bits)
    return pts.withColumn("tile_id", tile).select("id", "tile_id")


def q22_pip_count_by_poly(spark, sf_dir):
    j = q20_pip_join(spark, sf_dir)
    return j.groupBy("poly_id").agg(F.count(F.lit(1)).alias("n"))


def q23_pip_join_salted(spark, sf_dir):
    """Same result set as q20 via the salted shuffle-join path (skew
    handling: LISA tie-advance precedent)."""
    pts = td.points(spark, sf_dir)
    pol = td.polys(spark, sf_dir)
    return spatial_join.point_in_box_join(
        pts, pol, "x", "y", POLY_BOX, CONF,
        broadcast_boxes=False, salt=8,
    ).select("id", "poly_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_range_intersects": q01_range_intersects,
        "q02_containment": q02_containment,
        "q03_point_location": q03_point_location,
        "q04_knn": q04_knn,
        "q05_self_join": q05_self_join,
        "q06_bounds": q06_bounds,
        "q07_count_range": q07_count_range,
        "q08_key_range": q08_key_range,
        "q20_pip_join": q20_pip_join,
        "q21_tile_assign": q21_tile_assign,
        "q22_pip_count_by_poly": q22_pip_count_by_poly,
        "q23_pip_join_salted": q23_pip_join_salted,
    }


# ---------------------------------------------------------------- oracles --

_R = td.RECTS_SQL.strip()
_P = td.POINTS_SQL.strip()
_G = td.POLYS_SQL.strip()

_INTERSECTS_W = (
    f"NOT (xmin > {W[2]} OR xmax < {W[0]}) AND "
    f"NOT (ymin > {W[3]} OR ymax < {W[1]})"
)


def oracle_sql() -> dict[str, str]:
    return {
        "q01_range_intersects": f"""
            WITH rects AS ({_R})
            SELECT id, xmin, ymin, xmax, ymax FROM rects
            WHERE {_INTERSECTS_W}
        """,
        "q02_containment": f"""
            WITH rects AS ({_R})
            SELECT id FROM rects
            WHERE {W[0]} <= xmin AND xmax <= {W[2]}
              AND {W[1]} <= ymin AND ymax <= {W[3]}
        """,
        "q03_point_location": f"""
            WITH rects AS ({_R})
            SELECT id FROM rects
            WHERE xmin <= {P[0]} AND {P[0]} <= xmax
              AND ymin <= {P[1]} AND {P[1]} <= ymax
        """,
        "q04_knn": f"""
            WITH rects AS ({_R}),
            d AS (
              SELECT id,
                GREATEST(xmin - {P[0]}, {P[0]} - xmax, 0.0) AS dx,
                GREATEST(ymin - {P[1]}, {P[1]} - ymax, 0.0) AS dy
              FROM rects
            ),
            dd AS (SELECT id, dx * dx + dy * dy AS dist2 FROM d),
            kth AS (
              SELECT MAX(dist2) AS kd
              FROM (SELECT dist2 FROM dd ORDER BY dist2 LIMIT {K})
            )
            SELECT id, dist2 FROM dd WHERE dist2 <= (SELECT kd FROM kth)
        """,
        "q05_self_join": f"""
            WITH rects AS ({_R}),
            w AS (
              SELECT * FROM rects
              WHERE NOT (xmin > {SJW[2]} OR xmax < {SJW[0]})
                AND NOT (ymin > {SJW[3]} OR ymax < {SJW[1]})
            )
            SELECT a.id AS id1, b.id AS id2
            FROM w a, w b
            WHERE a.id <> b.id
              AND NOT (a.xmin > b.xmax OR a.xmax < b.xmin)
              AND NOT (a.ymin > b.ymax OR a.ymax < b.ymin)
        """,
        "q06_bounds": f"""
            WITH rects AS ({_R})
            SELECT MIN(xmin) AS xmin, MIN(ymin) AS ymin,
                   MAX(xmax) AS xmax, MAX(ymax) AS ymax
            FROM rects
        """,
        "q07_count_range": f"""
            WITH rects AS ({_R})
            SELECT CAST(COUNT(*) AS BIGINT) AS n FROM rects
            WHERE {_INTERSECTS_W}
        """,
        "q08_key_range": f"""
            WITH rects AS ({_R}),
            keyed AS (
              SELECT id,
                CAST(FLOOR(xmin * 1024.0) AS BIGINT) * 1024
                  + CAST(FLOOR(ymin * 1024.0) AS BIGINT) AS gkey
              FROM rects
            )
            SELECT id, gkey FROM keyed WHERE gkey BETWEEN {GK_LO} AND {GK_HI}
        """,
        "q20_pip_join": f"""
            WITH pts AS ({_P}), pol AS ({_G})
            SELECT pts.id, pol.poly_id
            FROM pts, pol
            WHERE pxmin <= x AND x <= pxmax AND pymin <= y AND y <= pymax
        """,
        "q21_tile_assign": f"""
            WITH pts AS ({_P})
            SELECT id,
              CAST(FLOOR(x * 64.0) AS BIGINT) * 64
                + CAST(FLOOR(y * 64.0) AS BIGINT) AS tile_id
            FROM pts
        """,
        "q22_pip_count_by_poly": f"""
            WITH pts AS ({_P}), pol AS ({_G})
            SELECT pol.poly_id, CAST(COUNT(*) AS BIGINT) AS n
            FROM pts, pol
            WHERE pxmin <= x AND x <= pxmax AND pymin <= y AND y <= pymax
            GROUP BY pol.poly_id
        """,
        "q23_pip_join_salted": f"""
            WITH pts AS ({_P}), pol AS ({_G})
            SELECT pts.id, pol.poly_id
            FROM pts, pol
            WHERE pxmin <= x AND x <= pxmax AND pymin <= y AND y <= pymax
        """,
    }
