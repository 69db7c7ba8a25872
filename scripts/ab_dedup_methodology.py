"""Same-session A/B of the bench's per-query GC methodology (VERDICT r3 #8).

Round 3 changed bench.py to clearCache + driver GC before every timed
query (fixing a real artifact: leftover localCheckpoint/broadcast blocks
starved later shuffle queries), and the shuffle-heavy dedup queries
q35/q37 moved vs round 2.  Cross-round comparisons are weather-dominated
on this VM, so this script attributes the band the only valid way: both
methodologies, interleaved in ONE session, medians over trials.

Legs per trial (interleaved so VM drift hits both equally):
  * gc    — spark.catalog.clearCache() + System.gc() immediately before
            the timed run (the r3+ bench methodology);
  * no-gc — timed run with whatever blocks the session has accumulated
            (the r2 methodology).

Prints one JSON line; paste the medians into BENCH.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from libspatialindex_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    trials = int(os.environ.get("AB_TRIALS", "3"))
    spark = get_spark("ab-dedup", cores=cpus, shuffle_partitions=cpus)
    jvm = spark.sparkContext._jvm
    qs = {
        "q35_minhash_pairs": entrymod.queries()["q35_minhash_pairs"],
        "q37_dedup_groups": entrymod.queries()["q37_dedup_groups"],
    }

    def run(fn) -> float:
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # warm both once (JVM/Arrow/codegen paths out of the measurement)
    for fn in qs.values():
        run(fn)

    res: dict[str, dict[str, list[float]]] = {
        n: {"gc": [], "nogc": []} for n in qs
    }
    for _ in range(trials):
        for name, fn in qs.items():
            spark.catalog.clearCache()
            jvm.System.gc()
            res[name]["gc"].append(round(run(fn), 3))
            # old methodology: no cleanup — time with accumulated state
            res[name]["nogc"].append(round(run(fn), 3))

    out = {"sf_dir": sf_dir, "cpus": cpus, "trials": trials}
    for name, legs in res.items():
        out[name] = {
            mode: {
                "median": round(statistics.median(v), 3),
                "all": v,
            }
            for mode, v in legs.items()
        }
        out[name]["ratio_nogc_over_gc"] = round(
            statistics.median(legs["nogc"]) / statistics.median(legs["gc"]), 3
        )
    from _ab_record import record

    record("dedup_methodology", out)
    print(json.dumps(out, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()
