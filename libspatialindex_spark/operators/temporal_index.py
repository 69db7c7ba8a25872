"""Stored temporal layouts — pruned MVR / TPR queries (VERDICT r2 #3).

Round 2's Q9/Q10/Q18 answered correctly but scanned EVERY row per query;
the reference's MVR- and TPR-trees exist precisely to avoid that
(``src/mvrtree/MVRTree.cc:1295-1304`` live-root selection routes a time
query to the roots whose version interval can match;
``src/tprtree/TPRTree.cc:1207-1252`` descends velocity-expanded node MBRs).
The distributed analogs:

* **version index** (:func:`build_version_index`) — validity-interval
  entries partitioned by a ``tstart`` time bucket; the manifest keeps each
  bucket's [min tstart, max tend) envelope plus its spatial MBR.  A query
  ([window] × [qt0, qt1)) prunes, driver-side, every bucket whose time
  envelope cannot overlap the query interval or whose MBR misses the
  window — the live-root selection — and compiles the survivors into a
  partition filter.
* **moving index** (:func:`build_moving_index`) — trajectory entries
  partitioned by a position grid cell at reference time 0; the manifest
  keeps, per bucket, the t=0 box envelope AND the velocity envelope
  (min/max edge velocity per axis) — exactly a TPR internal node's
  velocity-MBR (``src/spatialindex/MovingRegion.cc`` ``getMBRAtTime``
  lifted to the node level).  A query over [t0, t1] expands each bucket's
  box by its velocity envelope over the interval and prunes buckets whose
  expanded box misses the window.  Works for moving POINTS (degenerate
  boxes, vlo = vhi) and moving REGIONS (per-edge velocities) alike.

Both manifests are driver-sized JSON (one row per bucket); the exact
predicates after the prune are the same codegen Column expressions
``operators/temporal.py`` always used, so results are unchanged — only
the rows touched shrink.  At 100 TB the partition filter keeps whole
bucket directories unread, the same mechanics as the spatial stored index.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from libspatialindex_spark.functions import geometry as G
from libspatialindex_spark.operators import temporal
from libspatialindex_spark.operators.relation import BoxCols
from libspatialindex_spark.plans import fs as FS

_FAR = temporal._FAR


# ---------------------------------------------------------- version index --


@dataclass
class StoredVersionIndex:
    """Time-bucketed validity-interval entries + per-bucket envelopes."""

    spark: SparkSession
    path: str
    buckets: list[dict]  # per-bucket {tb, ts_min, te_max, xmin..ymax, n_rows}

    @property
    def data_path(self) -> str:
        return FS.join(self.path, "data")

    def df(self) -> DataFrame:
        return self.spark.read.parquet(self.data_path)

    def hit_buckets(
        self, qxmin: float, qymin: float, qxmax: float, qymax: float,
        qt0: float, qt1: float,
    ) -> list[int]:
        """Live-root selection: buckets whose [ts_min, te_max) envelope
        overlaps [qt0, qt1) AND whose MBR meets the window."""
        return [
            b["tb"]
            for b in self.buckets
            if b["ts_min"] < qt1 and b["te_max"] > qt0
            and not (
                b["xmin"] > qxmax or b["xmax"] < qxmin
                or b["ymin"] > qymax or b["ymax"] < qymin
            )
        ]

    def total_rows(self) -> int:
        return sum(b["n_rows"] for b in self.buckets)

    def hit_rows(self, hit: list[int]) -> int:
        s = set(hit)
        return sum(b["n_rows"] for b in self.buckets if b["tb"] in s)


def build_version_index(
    versions: DataFrame,
    path: str,
    n_tbuckets: int = 16,
    tstart: str = "tstart",
    tend: str = "tend",
    box: BoxCols | None = None,
) -> StoredVersionIndex:
    """Partition validity-interval entries by a ``tstart`` bucket.

    Bucket width = the data's tstart span / n_tbuckets (equal-width — the
    MVR tree's roots are likewise born in insert-time order).  The manifest
    records each bucket's exact [min tstart, max tend) envelope and MBR, so
    pruning is lossless.  Data-then-manifest commit order, like every
    other stored layout here."""
    spark = versions.sparkSession
    box = box or BoxCols()
    fs = FS.get_fs(spark, path)
    data_path = FS.join(path, "data")

    rng = versions.agg(
        F.min(tstart).alias("lo"), F.max(tstart).alias("hi")
    ).collect()[0]
    t_lo, t_hi = float(rng["lo"]), float(rng["hi"])
    width = max((t_hi - t_lo) / n_tbuckets, 1e-12)
    tb = F.least(
        F.lit(n_tbuckets - 1),
        F.floor((F.col(tstart) - F.lit(t_lo)) / F.lit(width)),
    ).cast("long")

    if fs.isdir(path):
        fs.delete(path)
    fs.mkdirs(path)
    keyed = versions.withColumn("tb", tb)
    keyed.repartition("tb").sortWithinPartitions(tstart).write.partitionBy(
        "tb"
    ).mode("overwrite").parquet(data_path)

    written = spark.read.parquet(data_path)
    rows = (
        written.groupBy(F.col("tb").cast("long").alias("tb"))
        .agg(
            F.min(tstart).alias("ts_min"),
            F.max(tend).alias("te_max"),
            F.min(box.xmin).alias("xmin"),
            F.min(box.ymin).alias("ymin"),
            F.max(box.xmax).alias("xmax"),
            F.max(box.ymax).alias("ymax"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()
    )
    buckets = [
        {
            "tb": int(r["tb"]), "ts_min": float(r["ts_min"]),
            "te_max": float(r["te_max"]), "xmin": float(r["xmin"]),
            "ymin": float(r["ymin"]), "xmax": float(r["xmax"]),
            "ymax": float(r["ymax"]), "n_rows": int(r["n_rows"]),
        }
        for r in rows
    ]
    fs.write_text(
        FS.join(path, "temporal.json"),
        json.dumps({"kind": "versions", "buckets": buckets}),
    )
    return StoredVersionIndex(spark=spark, path=path, buckets=buckets)


def load_version_index(spark: SparkSession, path: str) -> StoredVersionIndex:
    fs = FS.get_fs(spark, path)
    mpath = FS.join(path, "temporal.json")
    if not fs.exists(mpath):
        raise FileNotFoundError(f"no temporal.json under {path}")
    d = json.loads(fs.read_text(mpath))
    return StoredVersionIndex(spark=spark, path=path, buckets=d["buckets"])


def time_range_query_stored(
    idx: StoredVersionIndex,
    qxmin: float, qymin: float, qxmax: float, qymax: float,
    qt0: float, qt1: float,
    id_col: str = "id",
) -> tuple[DataFrame, dict]:
    """Q9 over the stored layout: driver-side bucket prune → partition
    filter → the exact interval+window predicates → id dedup.  Returns
    ``(result, io)`` where io reports the prune (rows_possible vs total).
    Result ≡ ``temporal.time_range_query`` on the raw version table."""
    hit = idx.hit_buckets(qxmin, qymin, qxmax, qymax, qt0, qt1)
    io = {
        "buckets_total": len(idx.buckets),
        "buckets_scanned": len(hit),
        "rows_total": idx.total_rows(),
        "rows_scanned_bound": idx.hit_rows(hit),
    }
    df = idx.df()
    if not hit:
        return df.filter(F.lit(False)), io
    pruned = df.filter(F.col("tb").isin(hit))
    b = BoxCols()
    out = pruned.filter(
        temporal.interval_overlaps(F.col("tstart"), F.col("tend"), qt0, qt1)
        & G.intersects(
            F.col(b.xmin), F.col(b.ymin), F.col(b.xmax), F.col(b.ymax),
            qxmin, qymin, qxmax, qymax,
        )
    ).dropDuplicates([id_col])
    return out, io


# ------------------------------------------------------------ moving index --


@dataclass
class StoredMovingIndex:
    """Position-bucketed trajectories + per-bucket velocity envelopes."""

    spark: SparkSession
    path: str
    buckets: list[dict]
    cols: dict  # lo/hi/vlo/vhi column names per axis

    @property
    def data_path(self) -> str:
        return FS.join(self.path, "data")

    def df(self) -> DataFrame:
        return self.spark.read.parquet(self.data_path)

    def hit_buckets(
        self, qxmin: float, qymin: float, qxmax: float, qymax: float,
        t0: float, t1: float,
    ) -> list[int]:
        """TPR node visit: expand each bucket's t=0 box envelope by its
        velocity envelope over [t0, t1]; prune buckets whose expanded box
        misses the window.  ``lo + v·t`` over t ∈ [t0, t1] with signed v
        reaches min(v·t0, v·t1) below and max(v·t0, v·t1) above —
        conservative (a bucket may survive without a common-t hit) but
        never lossy."""
        out = []
        for b in self.buckets:
            xlo = b["xlo"] + min(b["vxlo"] * t0, b["vxlo"] * t1)
            xhi = b["xhi"] + max(b["vxhi"] * t0, b["vxhi"] * t1)
            ylo = b["ylo"] + min(b["vylo"] * t0, b["vylo"] * t1)
            yhi = b["yhi"] + max(b["vyhi"] * t0, b["vyhi"] * t1)
            if not (xlo > qxmax or xhi < qxmin or ylo > qymax or yhi < qymin):
                out.append(b["mb"])
        return out

    def total_rows(self) -> int:
        return sum(b["n_rows"] for b in self.buckets)

    def hit_rows(self, hit: list[int]) -> int:
        s = set(hit)
        return sum(b["n_rows"] for b in self.buckets if b["mb"] in s)


def build_moving_index(
    entries: DataFrame,
    path: str,
    bits: int = 3,
    world: tuple[float, float, float, float] = (0.0, 0.0, 1.0, 1.0),
    lo: tuple[str, str] = ("x", "y"),
    hi: tuple[str, str] | None = None,
    vlo: tuple[str, str] = ("vx", "vy"),
    vhi: tuple[str, str] | None = None,
) -> StoredMovingIndex:
    """Partition moving entries by the grid cell of their t=0 center
    (``2**bits`` cells per axis) and record per-bucket box + velocity
    envelopes.  Moving POINTS pass only ``lo``/``vlo`` (hi = lo, vhi =
    vlo); moving REGIONS pass all four (per-edge velocities — the
    MovingRegion algebra)."""
    hi = hi or lo
    vhi = vhi or vlo
    spark = entries.sparkSession
    fs = FS.get_fs(spark, path)
    data_path = FS.join(path, "data")
    wx0, wy0, wx1, wy1 = world
    n = 1 << bits
    cx = (F.col(lo[0]) + F.col(hi[0])) / 2
    cy = (F.col(lo[1]) + F.col(hi[1])) / 2
    ix = F.least(
        F.lit(n - 1),
        F.greatest(
            F.lit(0),
            F.floor((cx - F.lit(wx0)) / F.lit((wx1 - wx0) / n)),
        ),
    ).cast("long")
    iy = F.least(
        F.lit(n - 1),
        F.greatest(
            F.lit(0),
            F.floor((cy - F.lit(wy0)) / F.lit((wy1 - wy0) / n)),
        ),
    ).cast("long")
    mb = ix * n + iy

    if fs.isdir(path):
        fs.delete(path)
    fs.mkdirs(path)
    keyed = entries.withColumn("mb", mb)
    keyed.repartition("mb").write.partitionBy("mb").mode("overwrite").parquet(
        data_path
    )

    written = spark.read.parquet(data_path)
    rows = (
        written.groupBy(F.col("mb").cast("long").alias("mb"))
        .agg(
            F.min(lo[0]).alias("xlo"), F.max(hi[0]).alias("xhi"),
            F.min(lo[1]).alias("ylo"), F.max(hi[1]).alias("yhi"),
            F.min(vlo[0]).alias("vxlo"), F.max(vhi[0]).alias("vxhi"),
            F.min(vlo[1]).alias("vylo"), F.max(vhi[1]).alias("vyhi"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()
    )
    buckets = [
        {k: (int(r[k]) if k in ("mb", "n_rows") else float(r[k]))
         for k in ("mb", "xlo", "xhi", "ylo", "yhi",
                   "vxlo", "vxhi", "vylo", "vyhi", "n_rows")}
        for r in rows
    ]
    cols = {
        "lo": list(lo), "hi": list(hi), "vlo": list(vlo), "vhi": list(vhi)
    }
    fs.write_text(
        FS.join(path, "temporal.json"),
        json.dumps({"kind": "moving", "buckets": buckets, "cols": cols}),
    )
    return StoredMovingIndex(spark=spark, path=path, buckets=buckets, cols=cols)


def load_moving_index(spark: SparkSession, path: str) -> StoredMovingIndex:
    fs = FS.get_fs(spark, path)
    mpath = FS.join(path, "temporal.json")
    if not fs.exists(mpath):
        raise FileNotFoundError(f"no temporal.json under {path}")
    d = json.loads(fs.read_text(mpath))
    return StoredMovingIndex(
        spark=spark, path=path, buckets=d["buckets"], cols=d["cols"]
    )


def moving_range_query_stored(
    idx: StoredMovingIndex,
    qxmin: float, qymin: float, qxmax: float, qymax: float,
    t0: float, t1: float,
    horizon: float | None = None,
    now: float = 0.0,
) -> tuple[DataFrame, dict]:
    """Q10/Q18 over the stored layout: velocity-envelope bucket prune →
    partition filter → the exact closed-form t-interval predicate.
    Dispatches points vs regions from the stored column spec.  Result ≡
    the corresponding ``temporal.moving_*_range_query`` full scan."""
    hit = idx.hit_buckets(qxmin, qymin, qxmax, qymax, t0, t1)
    io = {
        "buckets_total": len(idx.buckets),
        "buckets_scanned": len(hit),
        "rows_total": idx.total_rows(),
        "rows_scanned_bound": idx.hit_rows(hit),
    }
    df = idx.df()
    if not hit:
        temporal._check_horizon(t0, t1, horizon, now)
        return df.filter(F.lit(False)), io
    pruned = df.filter(F.col("mb").isin(hit))
    c = idx.cols
    if c["lo"] == c["hi"] and c["vlo"] == c["vhi"]:  # moving points
        out = temporal.moving_range_query(
            pruned, qxmin, qymin, qxmax, qymax, t0, t1,
            x=c["lo"][0], y=c["lo"][1], vx=c["vlo"][0], vy=c["vlo"][1],
            horizon=horizon, now=now,
        )
    else:  # moving regions (per-edge velocities)
        out = temporal.moving_region_range_query(
            pruned, qxmin, qymin, qxmax, qymax, t0, t1,
            box=(c["lo"][0], c["lo"][1], c["hi"][0], c["hi"][1]),
            vel=(c["vlo"][0], c["vlo"][1], c["vhi"][0], c["vhi"][1]),
            horizon=horizon, now=now,
        )
    return out, io
