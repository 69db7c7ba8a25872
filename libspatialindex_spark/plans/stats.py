"""Index statistics and query-latency instrumentation — A3/A4 (SURVEY §2.5).

A3 mirrors ``IStatistics`` (``SpatialIndex.h:183-191`` /
``src/rtree/Statistics.cc:41-50``): reads/writes/splits become bucket and
manifest counters; tree height is structurally 2 (global manifest level +
bucket leaves); utilization is rows-per-bucket balance (the skew metric).

A4 mirrors the reference driver's latency report
(``test/rtree/RTreeQuery.cc:354-414``): per-query wall times → mean /
variance / stddev + P1..P100 percentiles, computed with
``percentile_approx`` when aggregated in Spark or numpy when driver-side.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from libspatialindex_spark.operators.index_build import StoredIndex


def index_statistics(idx: StoredIndex) -> dict:
    """Structural stats of a stored index (Statistics.cc analog)."""
    m = idx.manifest_totals().toPandas()
    rows = m.n_rows.to_numpy(dtype=np.float64)
    return {
        "tree_height": 2,  # driver manifest level + bucket leaves
        "n_index_entries": int(len(m)),  # "index nodes" = buckets
        "n_data_rows": int(rows.sum()),
        "bucket_rows_min": int(rows.min()),
        "bucket_rows_p50": float(np.percentile(rows, 50)),
        "bucket_rows_max": int(rows.max()),
        "skew_max_over_median": float(
            rows.max() / max(np.percentile(rows, 50), 1.0)
        ),
        "utilization": float(rows.mean() / rows.max()) if rows.max() else 1.0,
        "world_bounds": (
            float(m.xmin.min()), float(m.ymin.min()),
            float(m.xmax.max()), float(m.ymax.max()),
        ),
    }


@dataclass
class LatencyRecorder:
    """Per-query latency collection → the reference's percentile report."""

    samples: list[tuple[str, float, int]] = field(default_factory=list)

    def timed(self, name: str, df) -> int:
        t0 = time.time()
        n = df.count()
        self.samples.append((name, time.time() - t0, n))
        return n

    def report(self) -> pd.DataFrame:
        pdf = pd.DataFrame(self.samples, columns=["query", "sec", "rows"])
        return pdf

    def percentiles(self) -> dict:
        lat = np.array([s for _, s, _ in self.samples], dtype=np.float64)
        if len(lat) == 0:
            return {}
        out = {
            "n": len(lat),
            "mean_sec": float(lat.mean()),
            "var_sec": float(lat.var()),
            "stddev_sec": float(lat.std()),
        }
        for p in (1, 25, 50, 75, 90, 99, 100):
            out[f"p{p}_sec"] = float(np.percentile(lat, p))
        return out


def latency_percentiles_spark(df, value_col: str = "sec"):
    """Spark-side percentile aggregation for large timing tables."""
    pcts = [0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    return df.agg(
        F.mean(value_col).alias("mean_sec"),
        F.variance(value_col).alias("var_sec"),
        F.stddev(value_col).alias("stddev_sec"),
        F.percentile_approx(value_col, pcts).alias("percentiles"),
    )
