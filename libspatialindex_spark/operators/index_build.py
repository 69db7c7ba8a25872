"""Distributed index build — the STR / SFC bulk-load analog (SURVEY.md §2.3).

Reference: ``src/rtree/BulkLoader.cc`` sorts all entries (external merge
sort with spill, ``:119-326``), packs leaves, and builds upper levels until
a single root (``:328-387``).  The SFC variant consumes entries in
pre-sorted curve order (``:392-453``).

Spark-first shape — each reference stage maps to a built-in:

====================  =====================================================
reference             here
====================  =====================================================
external merge sort   ``repartitionByRange(z)`` shuffle (spill built-in)
leaf packing          ``sortWithinPartitions(z)`` + parquet row groups
upper tree levels     quadtree-aligned **bucket** directories + manifest
root / header page    ``boundaries.json`` + manifest table on the driver
====================  =====================================================

Buckets are Z-prefix (quadtree-block) aligned: ``bucket = z >> shift``.
Every bucket is a contiguous Z range ⇒ directory-level partition pruning
composes exactly with the quadtree query cover.  Buckets are deterministic
(no sampling), which makes the build **resumable at bucket granularity**: a
bucket is committed iff its manifest row exists; a re-run plans only the
missing buckets and sweeps stale data from a crashed attempt.

At 100 TB: buckets ≈ 4× executor count keeps every reducer busy; hot
quadtree blocks simply hold more files and Spark splits them on read
(``spark.sql.files.maxPartitionBytes``), so skew degrades smoothly instead
of stalling a reducer.
"""

from __future__ import annotations

import math
import os
import shutil
from dataclasses import dataclass, replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from libspatialindex_spark.config import EngineConfig
from libspatialindex_spark.functions import curves
from libspatialindex_spark.operators.relation import BoxCols, SpatialRelation
from libspatialindex_spark.plans import manifest as M
from libspatialindex_spark.plans.cover import Cover


def _bucket_shift(conf: EngineConfig) -> int:
    """Z right-shift so that #buckets = 4^L ≥ 4 × target_partitions."""
    level = max(1, math.ceil(math.log(4 * conf.target_partitions, 4)))
    level = min(level, conf.grid_bits)
    return 2 * (conf.grid_bits - level)


@dataclass
class StoredIndex:
    """A persisted two-level spatial index (data dirs + manifest)."""

    spark: SparkSession
    path: str
    conf: EngineConfig
    bucket_shift: int

    @property
    def data_path(self) -> str:
        return os.path.join(self.path, "data")

    def manifest(self) -> DataFrame:
        m = M.read_manifest(self.spark, self.path)
        if m is None:
            raise FileNotFoundError(f"no manifest under {self.path}")
        return m

    def relation(self, box: BoxCols | None = None) -> SpatialRelation:
        """Queryable relation: z + bucket are *materialized* columns, so the
        cover predicate prunes parquet row groups and bucket dirs."""
        stats = (
            self.manifest()
            .agg(F.max("max_ex").alias("ex"), F.max("max_ey").alias("ey"))
            .collect()[0]
        )
        df = self.spark.read.parquet(self.data_path)
        return StoredRelation(
            df=df,
            conf=self.conf,
            box=box or BoxCols(),
            z_col="z",
            max_extent=(stats["ex"] or 0.0, stats["ey"] or 0.0),
            bucket_shift=self.bucket_shift,
        )

    def manifest_totals(self) -> DataFrame:
        """Per-bucket totals (a bucket may have several manifest rows after
        incremental inserts — totals are the roll-up)."""
        return self.manifest().groupBy("bucket").agg(
            F.min("zmin").alias("zmin"),
            F.max("zmax").alias("zmax"),
            F.min("xmin").alias("xmin"),
            F.min("ymin").alias("ymin"),
            F.max("xmax").alias("xmax"),
            F.max("ymax").alias("ymax"),
            F.sum("n_rows").alias("n_rows"),
        )

    def validate(self) -> bool:
        """``isIndexValid()`` analog (``SpatialIndex.h:209``): recompute
        per-bucket aggregates from data and diff against manifest totals."""
        cols = ["bucket", "zmin", "zmax", "xmin", "ymin", "xmax", "ymax", "n_rows"]
        got = M.manifest_for(
            self.spark.read.parquet(self.data_path), build_id="check"
        ).select(cols)
        want = self.manifest_totals().select(cols)
        diff = (
            got.exceptAll(want).count() + want.exceptAll(got).count()
        )
        return diff == 0


@dataclass
class StoredRelation(SpatialRelation):
    """SpatialRelation over a stored index: adds bucket-directory pruning."""

    bucket_shift: int = 0

    def pruned(self, cov: Cover) -> DataFrame:
        pred = self.z_range_predicate(cov)
        if pred is None:
            return self.df
        buckets: set[int] = set()
        for lo, hi in cov.coalesced(max_ranges=16):
            b0, b1 = lo >> self.bucket_shift, hi >> self.bucket_shift
            if b1 - b0 > 4096:  # cover too wide to enumerate — skip dir prune
                return self.df.filter(pred)
            buckets.update(range(b0, b1 + 1))
        # `bucket` is a partition directory column → file-listing-level prune.
        return self.df.filter(
            F.col("bucket").isin([*buckets]) & pred
        )


def build_index(
    df: DataFrame,
    path: str,
    conf: EngineConfig,
    box: BoxCols | None = None,
    bytes_col: str | None = None,
    build_id: str = "build-1",
    resume: bool = False,
) -> StoredIndex:
    """Bulk-load ``df`` into a stored index at ``path``.

    ``resume=True`` skips buckets already committed to the manifest and
    removes stale uncommitted bucket directories first (crash cleanup) —
    partition-granular checkpoint/resume per the north rule.
    """
    spark = df.sparkSession
    box = box or BoxCols()
    shift = _bucket_shift(conf)
    data_path = os.path.join(path, "data")

    cx = (F.col(box.xmin) + F.col(box.xmax)) / 2
    cy = (F.col(box.ymin) + F.col(box.ymax)) / 2
    keyed = df.withColumn("z", curves.z_key(cx, cy, conf)).withColumn(
        "bucket", F.shiftright(F.col("z"), shift)
    )

    done: set[int] = set()
    if resume:
        done = M.committed_buckets(spark, path)
        _sweep_uncommitted(data_path, done)
        if done:
            keyed = keyed.filter(~F.col("bucket").isin([*done]))
    elif os.path.isdir(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    M.save_boundaries(path, [shift])

    # The "external sort": one range shuffle on z, then in-partition sort —
    # rows land clustered so parquet row-group zone maps on z are tight.
    (
        keyed.repartitionByRange(conf.target_partitions, "z")
        .sortWithinPartitions("z")
        .write.partitionBy("bucket")
        .mode("append")
        .parquet(data_path)
    )

    # Commit point: manifest rows are derived from the *written* files, so a
    # manifest row certifies durable data (write data → then commit).  Read
    # only the newly-written bucket dirs — on resume the committed ones may
    # dwarf them.
    new_dirs = [
        os.path.join(data_path, name)
        for name in os.listdir(data_path)
        if name.startswith("bucket=")
        and int(name.split("=", 1)[1]) not in done
    ]
    if not new_dirs:
        return StoredIndex(spark=spark, path=path, conf=conf, bucket_shift=shift)
    written = spark.read.option("basePath", data_path).parquet(*new_dirs)
    mdf = M.manifest_for(written, bytes_col=bytes_col, build_id=build_id)
    mdf.write.mode("append").parquet(M.manifest_path(path))

    return StoredIndex(spark=spark, path=path, conf=conf, bucket_shift=shift)


def load_index(spark: SparkSession, path: str, conf: EngineConfig) -> StoredIndex:
    b = M.load_boundaries(path)
    shift = b[0] if b else _bucket_shift(conf)
    return StoredIndex(spark=spark, path=path, conf=conf, bucket_shift=shift)


def _sweep_uncommitted(data_path: str, committed: set[int]) -> None:
    """Remove bucket dirs written by a crashed attempt (no manifest row)."""
    if not os.path.isdir(data_path):
        return
    for name in os.listdir(data_path):
        if not name.startswith("bucket="):
            continue
        try:
            b = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if b not in committed:
            shutil.rmtree(os.path.join(data_path, name), ignore_errors=True)
