"""Stored-index tests: build, validate, prune-correctness, crash-resume."""

import os

import pytest
from pyspark.sql import functions as F

from libspatialindex_spark.operators import index_build, range_query
from libspatialindex_spark.operators.relation import SpatialRelation
from libspatialindex_spark.sources import testdata as td
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def built(spark, conf, tmp_path_factory):
    df = td.rects(spark, SF_DIR)
    path = str(tmp_path_factory.mktemp("index") / "idx")
    idx = index_build.build_index(df, path, conf, build_id="t1")
    return idx, df


def test_validate(built):
    idx, _ = built
    assert idx.validate()


def test_manifest_has_lineage_and_metrics(built):
    idx, df = built
    m = idx.manifest().toPandas()
    assert m.n_rows.sum() == df.count()
    assert (m.build_id == "t1").all()
    assert (m.zmin <= m.zmax).all()
    # skew metrics: per-bucket row counts exist and are positive
    assert (m.n_rows > 0).all()


@pytest.mark.parametrize(
    "q",
    [(0.25, 0.25, 0.30, 0.30), (0.0, 0.0, 0.1, 0.9), (0.9, 0.0, 1.0, 1.0)],
)
def test_pruned_query_equals_full_scan(built, conf, q):
    idx, df = built
    rel = idx.relation()
    got = {r.id for r in range_query.intersects_query(rel, *q).collect()}
    want = {
        r.id
        for r in range_query.intersects_query(
            SpatialRelation(df, conf, max_extent=(td.MAX_EXTENT,) * 2), *q
        ).collect()
    }
    assert got == want


def test_plan_prunes_partitions(built):
    """The physical plan must show bucket-directory pruning AND pushed
    z-range filters — the distributed analog of MBR tree descent."""
    idx, _ = built
    q = range_query.intersects_query(idx.relation(), 0.25, 0.25, 0.30, 0.30)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters", 1)[1][:300]
    assert "PushedFilters: [IsNotNull" in plan


def test_resume_skips_committed_and_sweeps_stale(spark, conf, tmp_path):
    df = td.rects(spark, SF_DIR)
    path = str(tmp_path / "idx")

    # Simulate a crashed first attempt: only half the buckets committed.
    shift = index_build._bucket_shift(conf)
    from libspatialindex_spark.functions import curves

    cx = (F.col("xmin") + F.col("xmax")) / 2
    cy = (F.col("ymin") + F.col("ymax")) / 2
    keyed = df.withColumn("z", curves.z_key(cx, cy, conf)).withColumn(
        "bucket", F.shiftright("z", shift)
    )
    buckets = sorted(
        r.bucket for r in keyed.select("bucket").distinct().collect()
    )
    half = set(buckets[: len(buckets) // 2])
    index_build.build_index(
        df.withColumn("z", curves.z_key(cx, cy, conf))
        .withColumn("bucket", F.shiftright("z", shift))
        .filter(F.col("bucket").isin([*half]))
        .drop("z", "bucket"),
        path, conf, build_id="attempt-1",
    )
    # Plant a stale uncommitted dir (data written, no manifest row).
    stale = os.path.join(path, "data", f"bucket={max(buckets) + 99}")
    os.makedirs(stale)
    with open(os.path.join(stale, "junk.parquet"), "w") as f:
        f.write("not parquet")

    idx = index_build.build_index(
        df, path, conf, build_id="attempt-2", resume=True
    )
    assert not os.path.exists(stale)  # crash debris swept
    assert idx.validate()
    m = idx.manifest().toPandas()
    assert m.n_rows.sum() == df.count()
    # committed buckets were NOT rebuilt
    assert set(m[m.build_id == "attempt-1"].bucket) == half
    # and the resumed index answers queries identically to a full scan
    got = {
        r.id
        for r in range_query.intersects_query(
            idx.relation(), 0.2, 0.2, 0.4, 0.4
        ).collect()
    }
    want = {
        r.id
        for r in range_query.intersects_query(
            SpatialRelation(df, conf, max_extent=(td.MAX_EXTENT,) * 2),
            0.2, 0.2, 0.4, 0.4,
        ).collect()
    }
    assert got == want
