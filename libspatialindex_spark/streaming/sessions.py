"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The reference has no streaming (its "stream" is the bulk-load pull
iterator, ``SpatialIndex.h:134-139``); this is engine-side surface the
task mandates for a training-data pipeline.  Semantics mirror the batch
``operators/events.sessionize`` exactly: per user, a new session starts
when the gap since the previous event exceeds ``gap_seconds``; ties break
on (epoch, event_id) so session boundaries are a pure function of the
data.

Shape notes (100 TB / real cluster):
* state is keyed by user_id — the shuffle key — and holds O(1) per user
  (open-session start/last/count), not the event history;
* CLOSED sessions are emitted as soon as the closing event arrives
  (append mode); the open tail session stays in the state store and
  survives restarts via the checkpoint — exactly-once on the emitted
  rows comes from the streaming commit log;
* a production job would add ``GroupStateTimeout.ProcessingTimeTimeout``
  to flush abandoned sessions; the drain-mode tests keep NoTimeout so
  results are a deterministic function of the input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUT_SCHEMA = (
    "user_id long, start_epoch long, end_epoch long, n_events long"
)
STATE_SCHEMA = "start_epoch long, last_epoch long, n_events long"


def _session_fold(gap_seconds: int):
    def fn(key, pdfs, state):  # type: ignore[no-untyped-def]
        import pandas as pd

        chunks = [p for p in pdfs]
        rows = pd.concat(chunks) if chunks else pd.DataFrame(
            columns=["epoch", "event_id"]
        )
        rows = rows.sort_values(["epoch", "event_id"])
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        uid = key[0]
        closed = []
        for e in rows["epoch"].to_numpy():
            e = int(e)
            if last is None:
                start, last, n = e, e, 1
            elif e - last > gap_seconds:
                closed.append((uid, start, last, n))
                start, last, n = e, e, 1
            else:
                last, n = e, n + 1
        if last is not None:
            state.update((int(start), int(last), int(n)))
        yield pd.DataFrame(
            closed,
            columns=["user_id", "start_epoch", "end_epoch", "n_events"],
        )

    return fn


def stateful_sessionize_stream(
    events_stream: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Streaming gap-sessionizer: emits one row per CLOSED session.

    ``events_stream`` is a streaming DataFrame with (user, ts, event id);
    the open tail session per user lives in the state store.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    prepared = events_stream.select(
        F.col(user_col).alias("user_id"),
        F.unix_timestamp(F.col(ts_col)).alias("epoch"),
        F.col(id_col).alias("event_id"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _session_fold(gap_seconds),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
