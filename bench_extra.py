"""Extra benchmarks for the optimization rounds (bench.py is frozen for
measurement — guide §1.4 noop-sink isolation lives here).

Usage:
  python bench_extra.py [--repeats N] [--explain DIR] [--label TAG] [q...]

Per query: clearCache + driver GC (same hygiene as bench.py), then time
``fn(spark, sf_dir).write.format("noop")`` ``--repeats`` times; prints a
JSON line with per-query medians and all samples.  ``--explain DIR`` also
writes ``DIR/<query>.txt`` with ``.explain("formatted")`` output.

Env contract identical to bench.py: $SPARK_GRAFT_SF_DIR, $SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from libspatialindex_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = sys.argv[1:]
    repeats, explain_dir, label = 1, None, ""
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--repeats":
            repeats = int(args[i + 1]); i += 2
        elif args[i] == "--explain":
            explain_dir = args[i + 1]; i += 2
        elif args[i] == "--label":
            label = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    spark = get_spark("bench_extra", cores=cpus, shuffle_partitions=cpus)
    from libspatialindex_spark.sources import testdata as td

    td.rects(spark, sf_dir).count()  # warm, like bench.py

    # pre-build stored indexes exactly like bench.py (outside timed region)
    entrymod._ann_index(spark, sf_dir)
    entrymod._version_index(spark, sf_dir)
    entrymod._moving_index(spark, sf_dir, regions=False)
    entrymod._moving_index(spark, sf_dir, regions=True)
    entrymod._nd_index(spark, sf_dir)

    qs = entrymod.queries()
    if names:
        qs = {n: qs[n] for n in names}
    jvm = spark.sparkContext._jvm
    out: dict[str, dict] = {}
    for name, fn in qs.items():
        samples = []
        for rep in range(repeats):
            spark.catalog.clearCache()
            jvm.System.gc()
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            with open(os.path.join(explain_dir, f"{name}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        out[name] = {
            "median": round(statistics.median(samples), 3),
            "min": min(samples),
            "samples": samples,
        }
        print(f"{name}: {out[name]['median']} {samples}", file=sys.stderr)
    print(json.dumps({"label": label, "sf_dir": sf_dir, "cpus": cpus,
                      "queries": out}, separators=(",", ":")))


if __name__ == "__main__":
    main()
