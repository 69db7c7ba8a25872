"""Event-stream operators: tumbling-window aggregation and sessionization.

The reference has no stream/window operators (SURVEY.md §2.6 — "free from
Spark"); these exist because the engine's temporal layer (Q9/Q10) plus a
training-data pipeline need them.  Batch forms here are oracle-checkable;
``streaming/windowed.py`` runs the same aggregation under Structured
Streaming with a watermark.

Determinism notes (differential-oracle discipline):
* windows key on integer epoch-hours (``unix_ts DIV 3600``) — engine- and
  timezone-agnostic;
* aggregates are order-independent exact values (counts, min/max) — no
  float summation whose order could differ between engines;
* session ordering ties broken by (ts, event_id) so session ids are a
  pure function of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour windows × event_type: count + exact value extremes."""
    hour = (F.unix_timestamp("ts") / F.lit(3600)).cast("long")
    return (
        events.withColumn("hour_epoch", hour)
        .groupBy("hour_epoch", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the time
    since the previous event exceeds ``gap_seconds``.  Returns one row per
    session: (user_id, session_id, n_events, start_epoch, end_epoch)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp("ts")
    gap = epoch - F.lag(epoch).over(w)
    new_session = F.when(
        gap.isNull() | (gap > gap_seconds), F.lit(1)
    ).otherwise(F.lit(0))
    with_sid = events.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return with_sid.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.unix_timestamp("ts")).alias("start_epoch"),
        F.max(F.unix_timestamp("ts")).alias("end_epoch"),
    )


def session_counts(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Sessions per user (the compact oracle surface)."""
    return sessionize(events, gap_seconds).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
    )


def observed_rollup(events: DataFrame):
    """:func:`hourly_rollup` with in-flight IO accounting (the A4 pattern
    the spatial/temporal layers have, extended to the event layer): rows
    scanned vs groups emitted — the map-side-combine reduction factor
    that tells you the shuffle is aggregate-sized, not data-sized, at any
    scale.  Returns ``(result_df, io)``; call ``io()`` after an action."""
    from pyspark.sql import Observation

    in_obs, out_obs = Observation(), Observation()
    src = events.observe(
        in_obs, F.count(F.lit(1)).alias("rows_scanned")
    )
    out = hourly_rollup(src).observe(
        out_obs, F.count(F.lit(1)).alias("groups_out")
    )

    def io() -> dict:
        scanned = in_obs.get["rows_scanned"]
        groups = out_obs.get["groups_out"]
        return {
            "rows_scanned": scanned,
            "groups_out": groups,
            "reduction_factor": round(scanned / max(groups, 1), 1),
        }

    return out, io
