"""Custom stateful streaming operator: moving-object position tracking
with ``applyInPandasWithState`` — the streaming FEED of the TPR layer.

The reference's TPR tree answers "where are the objects during [t0, t1]"
from each object's LATEST (position, velocity) report
(``src/tprtree/TPRTree.cc:1207-1252`` extrapolates from the stored
reference time); keeping that latest report current as updates arrive is
exactly a streaming upsert.  This operator maintains, per object id, the
newest report in the state store and EMITS a row whenever an object's
latest report advances — so a downstream ``foreachBatch`` (or the batch
``operators/temporal.moving_range_query`` over the drained snapshot) sees
the same relation the TPR tree would index.

Determinism: reports are ordered by (epoch, x, y, vx, vy), so the
surviving report for any set of same-epoch duplicates is a pure function
of the data (the same rule as :func:`latest_positions` in batch).

Shape notes (100 TB / real cluster):
* state is keyed by object id — the shuffle key — and holds O(1) per
  object (one report), never the report history;
* emits are append-mode CHANGES (an object advances at most once per
  micro-batch), so downstream consumers reduce by max epoch per id;
* the state store survives restarts via the checkpoint — exactly-once on
  emitted rows from the streaming commit log;
* a production job would add a ProcessingTimeTimeout to retire objects
  that stop reporting; the drain-mode tests keep NoTimeout so results
  are a deterministic function of the input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OUT_SCHEMA = (
    "id long, epoch long, x double, y double, vx double, vy double"
)
STATE_SCHEMA = (
    "epoch long, x double, y double, vx double, vy double"
)

_COLS = ["epoch", "x", "y", "vx", "vy"]


def _latest_fold():
    def fn(key, pdfs, state):  # type: ignore[no-untyped-def]
        import pandas as pd

        chunks = [p for p in pdfs]
        rows = pd.concat(chunks) if chunks else pd.DataFrame(columns=_COLS)
        if len(rows) == 0:
            yield pd.DataFrame(columns=["id"] + _COLS)
            return
        rows = rows.sort_values(_COLS)
        best = tuple(rows.iloc[-1][c] for c in _COLS)
        cur = tuple(state.get) if state.exists else None
        if cur is not None and tuple(cur) >= best:
            yield pd.DataFrame(columns=["id"] + _COLS)
            return
        state.update((
            int(best[0]), float(best[1]), float(best[2]),
            float(best[3]), float(best[4]),
        ))
        oid = key[0]
        yield pd.DataFrame(
            [(oid,) + best], columns=["id"] + _COLS
        )

    return fn


def track_moving_stream(
    updates: DataFrame,
    id_col: str = "id",
    epoch_col: str = "epoch",
    x_col: str = "x",
    y_col: str = "y",
    vx_col: str = "vx",
    vy_col: str = "vy",
) -> DataFrame:
    """Streaming latest-report tracker: emits (id, epoch, x, y, vx, vy)
    whenever an object's newest report advances.  ``updates`` is a
    streaming DataFrame of position reports.

    Object ids are LONG in the output (``OUT_SCHEMA``): the id column is
    cast explicitly so integer-family ids of any width work; string or
    decimal object ids are not supported by this operator (map them to a
    dense long id upstream — standard practice for a state-store key,
    which hashes and serializes per row) (ADVICE r4)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    prepared = updates.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(epoch_col).cast("long").alias("epoch"),
        F.col(x_col).alias("x"),
        F.col(y_col).alias("y"),
        F.col(vx_col).alias("vx"),
        F.col(vy_col).alias("vy"),
    )
    return prepared.groupBy("id").applyInPandasWithState(
        _latest_fold(),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def latest_positions(
    df: DataFrame,
    id_col: str = "id",
    epoch_col: str = "epoch",
    x_col: str = "x",
    y_col: str = "y",
    vx_col: str = "vx",
    vy_col: str = "vy",
) -> DataFrame:
    """Batch analog (the parity oracle): one row per object — its newest
    report under the same deterministic (epoch, x, y, vx, vy) ordering."""
    w = Window.partitionBy(id_col).orderBy(
        *[F.desc(c) for c in (epoch_col, x_col, y_col, vx_col, vy_col)]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(id_col).alias("id"),
            F.col(epoch_col).cast("long").alias("epoch"),
            F.col(x_col).alias("x"),
            F.col(y_col).alias("y"),
            F.col(vx_col).alias("vx"),
            F.col(vy_col).alias("vy"),
        )
    )
