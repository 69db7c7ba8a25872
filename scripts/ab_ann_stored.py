"""Same-session A/B: stored-ANN paths vs the in-flight operators they
replaced (VERDICT r3 #1 done-criterion: "stored ≤ in-flight" must be shown
in one session, since cross-round numbers are VM-weather-dominated).

Legs, interleaved per trial:
  * q42 stored (sig-partitioned projection) vs in-flight ann_lsh_cosine;
  * q44 stored (materialized band keys)     vs in-flight lsh_near_dup_pairs;
  * q45 stored (IVF partition pruning)      vs in-flight ann_ivf_cosine.

The one-time index build is timed separately (build-once/query-many — the
whole point of the stored layout).  Prints one JSON line for BENCH.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from libspatialindex_spark.operators import ann_index, similarity
from libspatialindex_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    trials = int(os.environ.get("AB_TRIALS", "3"))
    spark = get_spark("ab-ann", cores=cpus, shuffle_partitions=cpus)
    jvm = spark.sparkContext._jvm

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = entrymod._qvec(spark, sf_dir)
    k = entrymod.ANN_K

    t0 = time.time()
    idx = entrymod._ann_index(spark, sf_dir)
    build_sec = round(time.time() - t0, 3)

    legs = {
        "q42_lsh": {
            "stored": lambda: ann_index.ann_lsh_cosine_stored(idx, qvec, k),
            "inflight": lambda: similarity.ann_lsh_cosine(emb, qvec, k),
        },
        "q44_near_dup": {
            "stored": lambda: ann_index.lsh_near_dup_pairs_stored(idx, 0.4),
            "inflight": lambda: similarity.lsh_near_dup_pairs(
                emb, 0.4, bands=entrymod.LSH_BANDS,
                rows_per_band=entrymod.LSH_ROWS, seed=42,
            ),
        },
        "q45_ivf": {
            "stored": lambda: ann_index.ann_ivf_cosine_stored(
                idx, qvec, k, n_probe=entrymod.IVF_PROBE
            ),
            "inflight": lambda: similarity.ann_ivf_cosine(
                emb, qvec, k, stride=entrymod.IVF_STRIDE,
                n_probe=entrymod.IVF_PROBE,
            ),
        },
    }

    def run(fn) -> float:
        spark.catalog.clearCache()
        jvm.System.gc()
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    for leg in legs.values():  # warm both paths once
        run(leg["stored"])
        run(leg["inflight"])

    res: dict[str, dict[str, list[float]]] = {
        n: {"stored": [], "inflight": []} for n in legs
    }
    for _ in range(trials):
        for name, leg in legs.items():  # interleaved: weather hits both
            res[name]["stored"].append(run(leg["stored"]))
            res[name]["inflight"].append(run(leg["inflight"]))

    out = {"sf_dir": sf_dir, "cpus": cpus, "trials": trials,
           "ann_build_sec": build_sec}
    for name, r in res.items():
        ms, mi = statistics.median(r["stored"]), statistics.median(r["inflight"])
        out[name] = {
            "stored_median": ms, "inflight_median": mi,
            "stored_over_inflight": round(ms / mi, 3),
            "stored_all": r["stored"], "inflight_all": r["inflight"],
        }
    from _ab_record import record

    record("ann_stored", out)
    print(json.dumps(out, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()
