"""Per-partition lineage manifests — the driver-side "upper tree levels".

The reference persists a header page (rootID, capacities, stats —
``src/rtree/RTree.cc:1445-1551``) plus an index-node hierarchy whose entries
are (child MBR, child page id).  The distributed analog is a small manifest
table with one row per range bucket:

    bucket, zmin, zmax, xmin, ymin, xmax, ymax, n_rows, n_bytes,
    max_ex, max_ey, build_id

It serves four roles at once (SURVEY.md §2.2 M3/M4, §2.5 A3):
* **root/index nodes** — driver prunes buckets whose [zmin, zmax] misses the
  query's Z cover before Spark even plans the scan;
* **lineage / checkpoint** — a bucket is committed iff its manifest row
  exists; resume anti-joins planned buckets against the manifest;
* **metrics** — rows/bytes per bucket expose skew (Statistics.cc analog);
* **validity check** — recomputing per-bucket aggregates and diffing against
  the manifest is ``isIndexValid()`` (``SpatialIndex.h:209``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from libspatialindex_spark.plans import fs as FS

MANIFEST_COLS = [
    "bucket", "zmin", "zmax", "xmin", "ymin", "xmax", "ymax",
    "n_rows", "n_bytes", "max_ex", "max_ey", "build_id",
]

# Explicit schema — pandas round-trips (manifest rewrite on delete) must not
# depend on inference, which fails on an empty frame.
MANIFEST_SCHEMA = (
    "bucket long, zmin long, zmax long, "
    "xmin double, ymin double, xmax double, ymax double, "
    "n_rows long, n_bytes long, max_ex double, max_ey double, "
    "build_id string"
)


def manifest_for(
    df: DataFrame,
    bucket_col: str = "bucket",
    z_col: str = "z",
    box=("xmin", "ymin", "xmax", "ymax"),
    bytes_col: str | None = None,
    build_id: str = "build-0",
) -> DataFrame:
    """Aggregate the manifest row set for ``df`` (one row per bucket).

    A single map-side-combined groupBy — no extra shuffle beyond the
    aggregation itself.
    """
    xmin, ymin, xmax, ymax = box
    nbytes = (
        F.sum(F.length(F.col(bytes_col))) if bytes_col else F.lit(0)
    ).cast("long")
    # Cast: a re-read bucket is a partition-dir column (int32) while a
    # pre-write bucket is int64 — normalize so manifest files never mix.
    return df.groupBy(F.col(bucket_col).cast("long").alias("bucket")).agg(
        F.min(z_col).alias("zmin"),
        F.max(z_col).alias("zmax"),
        F.min(xmin).alias("xmin"),
        F.min(ymin).alias("ymin"),
        F.max(xmax).alias("xmax"),
        F.max(ymax).alias("ymax"),
        F.count(F.lit(1)).alias("n_rows"),
        nbytes.alias("n_bytes"),
        F.max(F.col(xmax) - F.col(xmin)).alias("max_ex"),
        F.max(F.col(ymax) - F.col(ymin)).alias("max_ey"),
        F.lit(build_id).alias("build_id"),
    )


def manifest_path(index_path: str) -> str:
    return FS.join(index_path, "manifest")


def read_manifest(spark: SparkSession, index_path: str) -> DataFrame | None:
    p = manifest_path(index_path)
    fs = FS.get_fs(spark, index_path)
    if not fs.isdir(p) or not any(
        f.endswith(".parquet") for f in fs.listdir(p)
    ):
        return None
    return spark.read.parquet(p)


def committed_buckets(spark: SparkSession, index_path: str) -> set[int]:
    m = read_manifest(spark, index_path)
    if m is None:
        return set()
    return {r["bucket"] for r in m.select("bucket").distinct().collect()}
