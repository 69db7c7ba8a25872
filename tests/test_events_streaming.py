"""Event operators: batch vs streaming-with-watermark equivalence, and the
MVR multi-version dedup guard."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from libspatialindex_spark.operators import events, temporal
from libspatialindex_spark.operators.relation import SpatialRelation
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def ev(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def test_hourly_rollup_totals(ev):
    out = events.hourly_rollup(ev).toPandas()
    assert out.n.sum() == ev.count()
    assert (out.min_value <= out.max_value).all()


def test_sessionize_invariants(ev):
    s = events.sessionize(ev, gap_seconds=1800).toPandas()
    assert s.n_events.sum() == ev.count()
    # sessions are disjoint, ordered, and within-gap
    for uid, grp in s.groupby("user_id"):
        g = grp.sort_values("session_id")
        assert (g.start_epoch <= g.end_epoch).all()
        prev_end = None
        for _, r in g.iterrows():
            if prev_end is not None:
                assert r.start_epoch - prev_end > 1800
            prev_end = r.end_epoch


def test_streaming_windowed_agg_matches_batch(spark, ev, tmp_path):
    """Structured Streaming (file source, watermark, update-mode windowed
    count) over the same events must converge to the batch rollup."""
    src = str(tmp_path / "stream_src")
    ev.limit(2000).repartition(4).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql(
        "SELECT CAST(unix_timestamp(window.start) / 3600 AS LONG) AS hour_epoch,"
        " event_type, n FROM rollup_test"
    ).toPandas()
    want = events.hourly_rollup(
        spark.read.parquet(src)
    ).select("hour_epoch", "event_type", "n").toPandas()
    g = got.sort_values(["hour_epoch", "event_type"]).reset_index(drop=True)
    w = want.sort_values(["hour_epoch", "event_type"]).reset_index(drop=True)
    assert g.equals(w)


def test_mvr_multi_version_dedup(spark, conf):
    """MVRTree.cc:1283-1291 visitedData semantics: an id stored as several
    time-versions matching the same query must be emitted ONCE."""
    df = spark.createDataFrame(
        [
            (7, 0.4, 0.4, 0.45, 0.45, 0.0, 50.0),
            (7, 0.4, 0.4, 0.45, 0.45, 50.0, 100.0),  # same id, next version
            (8, 0.4, 0.4, 0.45, 0.45, 90.0, 100.0),
            (9, 0.9, 0.9, 0.95, 0.95, 0.0, 100.0),  # outside window
        ],
        ["id", "xmin", "ymin", "xmax", "ymax", "tstart", "tend"],
    )
    rel = SpatialRelation(df, conf)
    got = sorted(
        r.id
        for r in temporal.time_range_query(
            rel, 0.3, 0.3, 0.5, 0.5, 0.0, 100.0
        ).collect()
    )
    assert got == [7, 8]


# -------------------------------------------- stateful streaming sessions --


def test_stateful_streaming_sessions_match_batch(spark, ev, tmp_path):
    """applyInPandasWithState sessionizer: closed sessions emitted by the
    stream equal the batch sessionize() output minus each user's final
    (still-open) session — including sessions that SPAN micro-batches."""
    import os
    import time

    from libspatialindex_spark.streaming.sessions import (
        stateful_sessionize_stream,
    )

    sub = ev.filter(F.col("user_id") % 7 == 0)
    # two time-ordered files => two micro-batches; sessions crossing the
    # cut must be stitched by the state store, not split
    pdf = sub.toPandas().sort_values(["ts", "event_id"])
    cut = len(pdf) // 2
    src = tmp_path / "sess_src"
    os.makedirs(src)
    first, second = pdf.iloc[:cut], pdf.iloc[cut:]
    spark.createDataFrame(first).coalesce(1).write.parquet(str(src / "a"))
    time.sleep(1.1)  # file-source ordering is by modification time
    spark.createDataFrame(second).coalesce(1).write.parquet(str(src / "b"))

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    out = stateful_sessionize_stream(stream, gap_seconds=1800)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.start_epoch, r.end_epoch, r.n_events)
        for r in spark.sql("SELECT * FROM sess_stream").collect()
    }

    batch = events.sessionize(sub, gap_seconds=1800).toPandas()
    # drop each user's final session (stays open in the state store)
    last = batch.sort_values("session_id").groupby("user_id").tail(1)
    closed = batch.merge(
        last[["user_id", "session_id"]],
        on=["user_id", "session_id"],
        how="left",
        indicator=True,
    ).query("_merge == 'left_only'")
    want = {
        (int(r.user_id), int(r.start_epoch), int(r.end_epoch), int(r.n_events))
        for _, r in closed.iterrows()
    }
    assert got == want and len(want) > 0


# ---------------------------------------- stateful moving-object tracking --


def test_streaming_moving_tracker_matches_batch(spark, tmp_path, conf):
    """applyInPandasWithState latest-position tracker (the streaming TPR
    feed): after draining an update stream, the last emit per object
    equals the batch latest_positions() oracle — across micro-batch
    boundaries — and the TPR range query over the drained snapshot equals
    the batch path."""
    from libspatialindex_spark.sources import testdata as td
    from libspatialindex_spark.streaming.moving import (
        latest_positions,
        track_moving_stream,
    )

    td.register_views(spark, SF_DIR)
    base = spark.sql(td.MOVING_SQL).limit(3000)
    # three reports per object at epochs 0/1/2, drifting positions — the
    # epoch-2 report must win everywhere
    updates = None
    for e in range(3):
        u = base.select(
            "id",
            F.lit(e).cast("long").alias("epoch"),
            (F.col("x") + 0.01 * e).alias("x"),
            (F.col("y") + 0.005 * e).alias("y"),
            "vx", "vy",
        )
        updates = u if updates is None else updates.unionByName(u)
    src = str(tmp_path / "mov_src")
    # shuffle updates across many files so an object's reports span
    # micro-batches (maxFilesPerTrigger=2)
    updates.orderBy(F.rand(7)).repartition(8).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "id long, epoch long, x double, y double, vx double, vy double"
    ).option("maxFilesPerTrigger", 2).parquet(src)
    q = (
        track_moving_stream(stream)
        .writeStream.format("memory")
        .queryName("mov_track")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    emitted = spark.sql("SELECT * FROM mov_track")
    # reduce emits to the last per object (emits advance monotonically)
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy("id").orderBy(
            *[F.desc(c) for c in ("epoch", "x", "y", "vx", "vy")]
        )
    )
    got = emitted.withColumn("_rn", rn).filter(F.col("_rn") == 1).drop("_rn")
    want = latest_positions(spark.read.parquet(src))
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w
    # one surviving report per OBJECT (ids repeat in the fixture slice)
    assert len(g) == base.select("id").distinct().count()
    # every object advanced at least once but was not re-emitted per report
    assert emitted.count() >= len(g)
    # TPR query over the drained snapshot ≡ batch path on the oracle
    win = (0.25, 0.25, 0.35, 0.35)
    a = {
        r.id
        for r in temporal.moving_range_query(got, *win, 0.0, 256.0).collect()
    }
    b = {
        r.id
        for r in temporal.moving_range_query(want, *win, 0.0, 256.0).collect()
    }
    assert a == b and a


def test_observed_rollup_accounting(ev):
    out, io = events.observed_rollup(ev)
    rows = out.collect()
    acct = io()
    assert acct["rows_scanned"] == ev.count()
    assert acct["groups_out"] == len(rows)
    assert acct["reduction_factor"] >= 1
    # same results as the plain rollup
    plain = {
        (r.hour_epoch, r.event_type, r.n)
        for r in events.hourly_rollup(ev).collect()
    }
    assert {(r.hour_epoch, r.event_type, r.n) for r in rows} == plain
