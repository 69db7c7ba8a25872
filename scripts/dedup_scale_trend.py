"""Dedup-flank scale trend (VERDICT r5 #7): q35/q36/q37 pipelines at
sf0.1 vs a deterministic ×F document expansion, one session, interleaved
medians.

The banded minhash/simhash paths are designed to scale ~linearly in the
corpus (shingle/signature stages are per-row; candidate buckets stay
bounded because rows only meet when a whole band matches).  This script
evidences that: the expansion applies a per-replica CHARACTER
SUBSTITUTION cipher (injective per char, so k-gram equality — and hence
the intra-replica near-dup pair structure — is preserved exactly, while
cross-replica gram overlap collapses to ~0), so the true pair count
grows exactly linearly and any super-linear runtime is the engine's own
doing.

Results merge into ab_last.json under ``dedup_scale_trend`` (bench.py
folds that file into the BENCH record's ``ab`` key).
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _ab_record import record
from libspatialindex_spark.operators import dedup
from libspatialindex_spark.session import get_spark

from pyspark.sql import functions as F

FACTOR = int(os.environ.get("SCALE_FACTOR", "4"))
TRIALS = int(os.environ.get("AB_TRIALS", "2"))
DOC_OFF = 10_000_000
ALPHA = "abcdefghijklmnopqrstuvwxyz"


def expanded(spark, src_dir: str, dst: str):
    if not os.path.isdir(os.path.join(dst, "_done")):
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        docs = spark.read.parquet(f"{src_dir}/documents.parquet")
        parts = []
        for r in range(FACTOR):
            rot = ALPHA[r:] + ALPHA[:r]
            parts.append(
                docs.select(
                    (F.col("doc_id") + F.lit(r * DOC_OFF)).alias("doc_id"),
                    F.translate(F.col("text"), ALPHA, rot).alias("text"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(os.path.join(dst, "documents.parquet"))
        os.makedirs(os.path.join(dst, "_done"), exist_ok=True)
    return spark.read.parquet(os.path.join(dst, "documents.parquet"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("dedup_scale_trend", cores=cpus, shuffle_partitions=cpus)
    jvm = spark.sparkContext._jvm

    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    big = expanded(spark, sf_dir, f"/tmp/spark_graft_dedup_x{FACTOR}")
    n_base, n_big = base.count(), big.count()

    def minhash_pairs(d):
        return dedup.minhash_lsh_pairs(
            d, k=8, n_hashes=16, bands=4, threshold=0.4, portable=True
        )

    ops = {
        "minhash_pairs": lambda d: minhash_pairs(d),
        "simhash_pairs": lambda d: dedup.simhash_near_pairs(d, max_hamming=8),
        "dedup_groups": lambda d: dedup.connected_components(minhash_pairs(d)),
    }

    times: dict[str, dict[str, list[float]]] = {
        op: {"base": [], "x": []} for op in ops
    }
    rows: dict[str, dict[str, int]] = {op: {} for op in ops}
    for _ in range(TRIALS):
        for op, fn in ops.items():
            for scale, d in (("base", base), ("x", big)):
                spark.catalog.clearCache()
                jvm.System.gc()
                t0 = time.time()
                out = fn(d)
                n = out.count()
                times[op][scale].append(time.time() - t0)
                rows[op][scale] = n

    payload = {
        "factor": FACTOR,
        "trials": TRIALS,
        "cpus": cpus,
        "n_docs": {"base": n_base, "x": n_big},
        "ops": {},
    }
    for op in ops:
        tb = statistics.median(times[op]["base"])
        tx = statistics.median(times[op]["x"])
        payload["ops"][op] = {
            "base_sec": round(tb, 3),
            "x_sec": round(tx, 3),
            "time_ratio": round(tx / max(tb, 1e-9), 2),
            "rows": rows[op],
            "rows_ratio": round(
                rows[op]["x"] / max(rows[op]["base"], 1), 2
            ),
        }
        print(op, payload["ops"][op])
    record("dedup_scale_trend", payload)


if __name__ == "__main__":
    main()
