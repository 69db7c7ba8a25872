"""Deterministic spatial derivations over the driver's TPC-H-ish testdata.

The correctness gate compares the Spark engine against a DuckDB oracle that
only sees the shared parquet tables, so the spatial fixture is *derived*
inside the query from `lineitem` / `part` with pure integer arithmetic and
divisions by powers of two.  Every coordinate is an exact dyadic rational
(k / 2^20 with k < 2^21), so Spark and DuckDB produce bit-identical doubles
and closed-interval comparisons agree exactly.

This mirrors the reference's randomized fixture generator
(``test/rtree/Generator.cc:66-91``: uniform points + small boxes, op file
``op id xmin ymin xmax ymax``) — same shape, reproducible from shared data
instead of a seed.

The SQL texts below run unmodified on BOTH Spark SQL and DuckDB — one
source of truth, zero drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)

# 2^20 coordinate lattice; extents < 2^16/2^20 = 1/16 per axis.
SCALE = 1048576  # 2^20
MAX_EXTENT = 65536 / 1048576.0  # 0.0625 — analytic bound used for pruning

# One entry per lineitem row: id + MBR on the unit square.  Multipliers are
# odd 32-bit constants (Knuth/Fibonacci-style); all intermediates stay far
# below 2^63 for any realistic orderkey range.
RECTS_SQL = f"""
SELECT
  l_orderkey * 8 + l_linenumber AS id,
  CAST((l_orderkey * 2654435761 + l_partkey * 40503
        + l_linenumber * 7919) % {SCALE} AS DOUBLE) / {SCALE}.0 AS xmin,
  CAST((l_suppkey * 2246822519 + l_orderkey * 1779033703
        + l_linenumber * 104729) % {SCALE} AS DOUBLE) / {SCALE}.0 AS ymin,
  CAST((l_orderkey * 2654435761 + l_partkey * 40503
        + l_linenumber * 7919) % {SCALE} AS DOUBLE) / {SCALE}.0
    + CAST((l_partkey * 2654435761 + l_suppkey * 7919 + 97) % 65536
           AS DOUBLE) / {SCALE}.0 AS xmax,
  CAST((l_suppkey * 2246822519 + l_orderkey * 1779033703
        + l_linenumber * 104729) % {SCALE} AS DOUBLE) / {SCALE}.0
    + CAST((l_suppkey * 2654435761 + l_partkey * 104729 + 31) % 65536
           AS DOUBLE) / {SCALE}.0 AS ymax
FROM lineitem
"""

# Point layer (degenerate boxes): the same centers as RECTS_SQL lower-left.
POINTS_SQL = f"""
SELECT
  l_orderkey * 8 + l_linenumber AS id,
  CAST((l_orderkey * 2654435761 + l_partkey * 40503
        + l_linenumber * 7919) % {SCALE} AS DOUBLE) / {SCALE}.0 AS x,
  CAST((l_suppkey * 2246822519 + l_orderkey * 1779033703
        + l_linenumber * 104729) % {SCALE} AS DOUBLE) / {SCALE}.0 AS y
FROM lineitem
"""

# Polygon(MBR) dimension layer derived from `part` — widths up to 1/32.
POLYS_SQL = f"""
SELECT
  p_partkey AS poly_id,
  CAST((p_partkey * 2654435761 + 13) % {SCALE} AS DOUBLE) / {SCALE}.0 AS pxmin,
  CAST((p_partkey * 2246822519 + 29) % {SCALE} AS DOUBLE) / {SCALE}.0 AS pymin,
  CAST((p_partkey * 2654435761 + 13) % {SCALE} AS DOUBLE) / {SCALE}.0
    + CAST((p_partkey * 40503 + 11) % 32768 AS DOUBLE) / {SCALE}.0 AS pxmax,
  CAST((p_partkey * 2246822519 + 29) % {SCALE} AS DOUBLE) / {SCALE}.0
    + CAST((p_partkey * 104729 + 17) % 32768 AS DOUBLE) / {SCALE}.0 AS pymax
FROM part
"""

# Time-versioned layer (MVR analog, SURVEY.md Q9): right-open [tstart, tend).
RECTS_T_SQL = f"""
SELECT r.*,
  CAST((r.id * 7919 + 3) % 1000 AS DOUBLE) AS tstart,
  CAST((r.id * 7919 + 3) % 1000 AS DOUBLE)
    + 1.0 + CAST((r.id * 104729 + 5) % 64 AS DOUBLE) AS tend
FROM ({RECTS_SQL.strip()}) r
"""

# 3-D entry layer (the fork's 3-D test families: RTreeQuery3d, ZMQuery3d,
# LISAQuery3d — ``test/CMakeLists.txt``): RECTS_SQL plus a third axis
# (wmin, wmax) on the same dyadic lattice.
RECTS3D_SQL = f"""
SELECT r.*,
  CAST((r.id * 2654435761 + 51) % {SCALE} AS DOUBLE) / {SCALE}.0 AS wmin,
  CAST((r.id * 2654435761 + 51) % {SCALE} AS DOUBLE) / {SCALE}.0
    + CAST((r.id * 104729 + 23) % 65536 AS DOUBLE) / {SCALE}.0 AS wmax
FROM ({RECTS_SQL.strip()}) r
"""

# MVR op-stream (SURVEY.md Q9, ``test/mvrtree/Generator.cc:79-81``): a
# timestamped insert/delete timeline.  Every id is inserted at t0 and
# deleted at t0+lifespan; every third id is additionally deleted mid-life
# and RE-INSERTED with a shifted box (a second version) — so the version
# table genuinely holds multiple versions per id and the query-side dedup
# (MVRTree.cc:1283-1291 visitedData) is exercised, not vacuous.
# All times are integer-valued doubles, all shifts dyadic — exact in both
# engines.  op: 1=INSERT, 0=DELETE (the reference's op-file encoding).
MVR_OPS_SQL = f"""
WITH r AS ({RECTS_SQL.strip()}),
base AS (
  SELECT DISTINCT id, xmin, ymin, xmax, ymax,
    CAST((id * 7919 + 3) % 1000 AS DOUBLE) AS t0,
    CAST(2 + (id * 104729 + 5) % 64 AS DOUBLE) AS lifespan,
    CAST(1 + (id * 40503 + 7) % (1 + (id * 104729 + 5) % 64) AS DOUBLE)
      AS mid_off,
    (id % 3 = 0) AS has_v2,
    CAST((id * 2246822519 + 41) % 4096 AS DOUBLE) / {SCALE}.0 AS dx,
    CAST((id * 1779033703 + 59) % 4096 AS DOUBLE) / {SCALE}.0 AS dy
  FROM r
)
SELECT 1 AS op, id, t0 AS t, xmin, ymin, xmax, ymax FROM base
UNION ALL
SELECT 0 AS op, id,
       CASE WHEN has_v2 THEN t0 + mid_off ELSE t0 + lifespan END AS t,
       xmin, ymin, xmax, ymax FROM base
UNION ALL
SELECT 1 AS op, id, t0 + mid_off AS t,
       xmin + dx, ymin + dy, xmax + dx, ymax + dy FROM base WHERE has_v2
UNION ALL
SELECT 0 AS op, id, t0 + lifespan AS t,
       xmin + dx, ymin + dy, xmax + dx, ymax + dy FROM base WHERE has_v2
"""

def mvr_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-side builder of the MVR op stream — row-identical to
    ``spark.sql(MVR_OPS_SQL)`` (pinned by a pytest), but the ``base`` CTE
    is constructed ONCE as a DataFrame and the four op branches are cheap
    projections of it, instead of the SQL text's four-way union each
    re-deriving (and re-DISTINCTing) the full base (guide §2.4: Spark
    inlines WITH subqueries, so the SQL form pays 4 scans + 4 distinct
    shuffles of the whole table).  As DataFrame branches, a downstream
    per-box filter also pushes into every branch below the DISTINCT —
    the q09 group-key pushdown relies on that."""
    register_views(spark, sf_dir)
    base = spark.sql(f"""
WITH r AS ({RECTS_SQL.strip()})
SELECT DISTINCT id, xmin, ymin, xmax, ymax,
  CAST((id * 7919 + 3) % 1000 AS DOUBLE) AS t0,
  CAST(2 + (id * 104729 + 5) % 64 AS DOUBLE) AS lifespan,
  CAST(1 + (id * 40503 + 7) % (1 + (id * 104729 + 5) % 64) AS DOUBLE)
    AS mid_off,
  (id % 3 = 0) AS has_v2,
  CAST((id * 2246822519 + 41) % 4096 AS DOUBLE) / {SCALE}.0 AS dx,
  CAST((id * 1779033703 + 59) % 4096 AS DOUBLE) / {SCALE}.0 AS dy
FROM r
""")
    box = [F.col(c) for c in ("xmin", "ymin", "xmax", "ymax")]
    shifted = [
        (F.col("xmin") + F.col("dx")).alias("xmin"),
        (F.col("ymin") + F.col("dy")).alias("ymin"),
        (F.col("xmax") + F.col("dx")).alias("xmax"),
        (F.col("ymax") + F.col("dy")).alias("ymax"),
    ]
    v2 = base.filter(F.col("has_v2"))
    b1 = base.select(F.lit(1).alias("op"), "id", F.col("t0").alias("t"), *box)
    b2 = base.select(
        F.lit(0).alias("op"), "id",
        F.when(F.col("has_v2"), F.col("t0") + F.col("mid_off"))
        .otherwise(F.col("t0") + F.col("lifespan")).alias("t"),
        *box,
    )
    b3 = v2.select(
        F.lit(1).alias("op"), "id",
        (F.col("t0") + F.col("mid_off")).alias("t"), *shifted
    )
    b4 = v2.select(
        F.lit(0).alias("op"), "id",
        (F.col("t0") + F.col("lifespan")).alias("t"), *shifted
    )
    return b1.unionByName(b2).unionByName(b3).unionByName(b4)


# The fold of the op stream into validity intervals: a DELETE matches the
# exact (mbr, id) it inserts — precisely ``deleteData``'s contract
# (``RTree.cc:599-608`` findLeaf by exact (mbr, id)).  Pairing is
# RANK-matched within each (id, mbr) group (k-th insert ↔ k-th delete by
# time, FIFO) so an id re-inserted with an *identical* box never
# cross-matches a later insert with an earlier delete; never-deleted
# entries stay open (tend = 1e18, the engine's +inf sentinel).  Shared by
# the DuckDB oracle; the engine-side fold is ``temporal.versions_from_ops``.
MVR_VERSIONS_SQL = f"""
WITH ops AS ({MVR_OPS_SQL.strip()}),
ins AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY id, xmin, ymin, xmax, ymax ORDER BY t) AS rk
  FROM ops WHERE op = 1
),
del AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY id, xmin, ymin, xmax, ymax ORDER BY t) AS rk
  FROM ops WHERE op = 0
)
SELECT ins.id, ins.xmin, ins.ymin, ins.xmax, ins.ymax,
       ins.t AS tstart, COALESCE(del.t, 1e18) AS tend
FROM ins LEFT JOIN del
  ON ins.id = del.id AND ins.xmin = del.xmin AND ins.ymin = del.ymin
 AND ins.xmax = del.xmax AND ins.ymax = del.ymax AND ins.rk = del.rk
"""

# Moving points (TPR analog, SURVEY.md Q10): position + velocity per axis,
# reference time 0.  Velocities are dyadic (k - 32)/2^20 with k in [0, 64).
MOVING_SQL = f"""
SELECT p.*,
  (CAST((p.id * 40503 + 7) % 64 AS DOUBLE) - 32.0) / {SCALE}.0 AS vx,
  (CAST((p.id * 104729 + 19) % 64 AS DOUBLE) - 32.0) / {SCALE}.0 AS vy
FROM ({POINTS_SQL.strip()}) p
"""


# Moving REGIONS (MovingRegion.cc velocity-MBR algebra): each box's low
# and high edges move linearly with separate velocities (vhi = vlo + a
# non-negative dyadic delta, so boxes never invert).  Reference time 0.
MOVING_REGIONS_SQL = f"""
SELECT r.*,
  (CAST((r.id * 40503 + 7) % 64 AS DOUBLE) - 32.0) / {SCALE}.0 AS vxlo,
  (CAST((r.id * 104729 + 19) % 64 AS DOUBLE) - 32.0) / {SCALE}.0 AS vylo,
  (CAST((r.id * 40503 + 7) % 64 AS DOUBLE) - 32.0) / {SCALE}.0
    + CAST((r.id * 7919 + 13) % 16 AS DOUBLE) / {SCALE}.0 AS vxhi,
  (CAST((r.id * 104729 + 19) % 64 AS DOUBLE) - 32.0) / {SCALE}.0
    + CAST((r.id * 2654435761 + 29) % 16 AS DOUBLE) / {SCALE}.0 AS vyhi
FROM ({RECTS_SQL.strip()}) r
"""

# Query-workload layer (the reference's 1000×0.01-window workload shape,
# ``test/rtree/Generator.cc:86-91``), derived from `orders`.
WINDOWS_SQL = f"""
SELECT
  o_orderkey AS qid,
  CAST((o_orderkey * 2654435761 + 7) % {SCALE} AS DOUBLE) / {SCALE}.0 AS qxmin,
  CAST((o_orderkey * 2246822519 + 3) % {SCALE} AS DOUBLE) / {SCALE}.0 AS qymin,
  CAST((o_orderkey * 2654435761 + 7) % {SCALE} AS DOUBLE) / {SCALE}.0 + 0.01 AS qxmax,
  CAST((o_orderkey * 2246822519 + 3) % {SCALE} AS DOUBLE) / {SCALE}.0 + 0.01 AS qymax
FROM orders
WHERE o_orderkey % 307 = 1
"""


# Per-session registration memo: ``register_views`` is called by every
# derived-table helper (rects/points/polys/…), typically several times per
# query, and each call used to re-read all 10 parquet footers (~1.1 s of
# driver-side schema/listing latency at sf0.1 — measured, guide §1).  The
# views themselves are session-scoped and lazy, so re-registering the same
# (session, sf_dir) is pure waste; memoize on the application id and only
# re-register when the sf_dir changes (or ``force=True`` for callers that
# mutated the files under the path).
_REGISTERED: dict[str, str] = {}


def register_views(spark: SparkSession, sf_dir: str, force: bool = False) -> None:
    """Register every testdata table as a temp view (idempotent, memoized
    per (session, sf_dir) — pass ``force=True`` after changing the files)."""
    key = spark.sparkContext.applicationId
    if not force and _REGISTERED.get(key) == sf_dir:
        return
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    _REGISTERED[key] = sf_dir


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def rects(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(RECTS_SQL)


def points(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(POINTS_SQL)


def polys(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(POLYS_SQL)


def spread(df: DataFrame, key: str) -> DataFrame:
    """Give a codec ``mapInPandas`` stage full parallelism when the source
    collapses to fewer splits than cores (single-file/single-row-group
    parquet — the bench testdata shape).  A no-op whenever the scan is
    already at least core-wide, so at real scale (input partitions ≫
    cores) no shuffle is added; locally it moves only the projected key
    column (guide §2.6/§4.2: keep every core busy under a CPU-bound
    Arrow stage)."""
    dp = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= dp:
        return df
    return df.repartition(dp, F.col(key))


def audio_clips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic WAV clip table derived from ``documents``: one mono
    PCM-16 clip per doc_id, synthesized by the closed-form integer
    generator (``sources/wav.synth_pcm``) and encoded by the real WAV
    codec INSIDE an Arrow-batched stage — so downstream audio operators
    exercise a true binary decode path while the q57 DuckDB oracle can
    reproduce every sample from (doc_id, i) alone.

    Columns: (clip_id long, bytes binary, codec string)."""
    from collections.abc import Iterator

    import pandas as pd

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from libspatialindex_spark.sources import wav as wavcodec

        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            blobs = [
                wavcodec.wav_encode(
                    wavcodec.synth_pcm(int(cid)), wavcodec.SYNTH_RATE
                )
                for cid in ids
            ]
            yield pd.DataFrame(
                {"clip_id": ids, "bytes": blobs, "codec": "wav"}
            )

    docs = spread(load(spark, sf_dir, "documents").select("doc_id"), "doc_id")
    return docs.mapInPandas(work, "clip_id long, bytes binary, codec string")


# video synth constants — mirrored verbatim in the q58 oracle SQL
VIDEO_W = VIDEO_H = 16
VIDEO_MUL, VIDEO_FMUL, VIDEO_YMUL, VIDEO_XMUL, VIDEO_CMUL, VIDEO_ADD = (
    1_103_515_245, 97, 31, 17, 7, 5
)


def synth_frames(video_id: int) -> "np.ndarray":
    """Deterministic RGB frames — every pixel a closed-form integer
    function of (video_id, frame, y, x, channel), so a DuckDB
    ``generate_series`` query reproduces per-frame statistics exactly
    while the engine path exercises the real AVI encode → decode → PNG
    round trip (all lossless)."""
    import numpy as np

    nf = 4 + video_id % 8
    f = np.arange(nf, dtype=np.int64)[:, None, None, None]
    y = np.arange(VIDEO_H, dtype=np.int64)[None, :, None, None]
    x = np.arange(VIDEO_W, dtype=np.int64)[None, None, :, None]
    c = np.arange(3, dtype=np.int64)[None, None, None, :]
    v = (
        video_id * VIDEO_MUL + f * VIDEO_FMUL + y * VIDEO_YMUL
        + x * VIDEO_XMUL + c * VIDEO_CMUL + VIDEO_ADD
    ) % 256
    return v.astype("uint8")


def video_clips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic AVI clip table derived from ``documents``: one
    uncompressed-DIB video per doc_id (4-11 frames of 16×16 RGB),
    encoded by the real RIFF/AVI codec inside an Arrow-batched stage.

    Columns: (video_id string, bytes binary, fmt string)."""
    from collections.abc import Iterator

    import pandas as pd

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from libspatialindex_spark.sources import avi as avicodec

        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            blobs = [
                avicodec.avi_encode(synth_frames(int(d)), fps=10)
                for d in ids
            ]
            yield pd.DataFrame(
                {"video_id": ids.astype(str), "bytes": blobs, "fmt": "avi"}
            )

    docs = spread(load(spark, sf_dir, "documents").select("doc_id"), "doc_id")
    return docs.mapInPandas(work, "video_id string, bytes binary, fmt string")
