"""Scale-trend A/B: stored-vs-inflight gap at sf0.1 AND at a deterministic
factor-F expansion (VERDICT r4 #7).

The stored layouts' advantage is partition/zone-map PRUNING, which is
scale-free, while the in-flight twins scan linearly — so the
stored/inflight ratio should WIDEN (drop) as data grows.  This script
evidences that in one session: it builds an expanded copy of the two
source tables everything derives from (lineitem → rects/points/3-D/
temporal layers; embeddings → ANN), replicating rows with key offsets
(derived positions re-hash, so density grows uniformly; embeddings get a
per-replica deterministic perturbation so LSH/IVF structure stays
realistic), then times each stored/in-flight pair at both scales,
interleaved, medians over trials.  One-time index builds are timed
separately (build-once/query-many).

Results merge into ab_last.json under ``scale_trend`` (bench.py folds
that file into the BENCH record's ``ab`` key).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from _ab_record import record
from libspatialindex_spark.operators import ann_index, similarity
from libspatialindex_spark.session import get_spark

FACTOR = int(os.environ.get("SCALE_FACTOR", "4"))
TRIALS = int(os.environ.get("AB_TRIALS", "2"))
ORDERKEY_OFF = 10_000_000  # > any sf's max l_orderkey; keeps ids disjoint
VEC_OFF = 10_000_000


def build_expanded(spark, src: str, dst: str) -> None:
    """Deterministic factor-F expansion of the two root tables (plus
    straight copies of the small dims the SQL layers reference)."""
    if os.path.isdir(os.path.join(dst, "_done")):
        return
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    os.makedirs(dst, exist_ok=True)
    li = spark.read.parquet(f"{src}/lineitem.parquet")
    parts = []
    for r in range(FACTOR):
        parts.append(
            li.selectExpr(
                f"l_orderkey + {r * ORDERKEY_OFF} AS l_orderkey",
                "l_partkey", "l_suppkey", "l_linenumber",
                *[c for c in li.columns
                  if c not in ("l_orderkey", "l_partkey", "l_suppkey",
                               "l_linenumber")],
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{dst}/lineitem.parquet")

    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    eparts = []
    for r in range(FACTOR):
        eparts.append(
            emb.selectExpr(
                f"vec_id + {r * VEC_OFF} AS vec_id",
                "transform(embedding, (e, i) -> CAST(e + "
                f"CASE WHEN i = {r % 64} THEN {r} * 0.0001 ELSE 0.0 END "
                "AS FLOAT)) AS embedding",
                *[c for c in emb.columns if c not in ("vec_id", "embedding")],
            )
        )
    eout = eparts[0]
    for p in eparts[1:]:
        eout = eout.unionByName(p)
    eout.write.mode("overwrite").parquet(f"{dst}/embeddings.parquet")

    for t in ("part", "orders", "region", "nation", "customer",
              "supplier", "events", "documents"):
        s = f"{src}/{t}.parquet"
        if os.path.exists(s):
            spark.read.parquet(s).write.mode("overwrite").parquet(
                f"{dst}/{t}.parquet"
            )
    os.makedirs(os.path.join(dst, "_done"), exist_ok=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("scale-trend", cores=cpus, shuffle_partitions=cpus)
    jvm = spark.sparkContext._jvm

    big_dir = f"/tmp/spark_graft_scale_trend/x{FACTOR}"
    t0 = time.time()
    build_expanded(spark, sf_dir, big_dir)
    expand_sec = round(time.time() - t0, 1)

    def pairs_for(d: str):
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        qvec = entrymod._qvec(spark, d)
        k = entrymod.ANN_K
        idx = entrymod._ann_index(spark, d)
        return {
            "time_range": (
                lambda: entrymod.q46_time_range_stored(spark, d),
                lambda: entrymod.q09_time_range(spark, d),
            ),
            "moving_range": (
                lambda: entrymod.q47_moving_range_stored(spark, d),
                lambda: entrymod.q10_moving_range(spark, d),
            ),
            "moving_region": (
                lambda: entrymod.q48_moving_region_stored(spark, d),
                lambda: entrymod.q18_moving_region_range(spark, d),
            ),
            "range_3d": (
                lambda: entrymod.q56_3d_range_stored(spark, d),
                lambda: entrymod.q16_3d_range(spark, d),
            ),
            "ann_lsh": (
                lambda: ann_index.ann_lsh_cosine_stored(idx, qvec, k),
                lambda: similarity.ann_lsh_cosine(emb, qvec, k),
            ),
            "ann_ivf": (
                lambda: ann_index.ann_ivf_cosine_stored(
                    idx, qvec, k, n_probe=entrymod.IVF_PROBE
                ),
                lambda: similarity.ann_ivf_cosine(
                    emb, qvec, k, stride=entrymod.IVF_STRIDE,
                    n_probe=entrymod.IVF_PROBE,
                ),
            ),
            "near_dup": (
                lambda: ann_index.lsh_near_dup_pairs_stored(idx, 0.4),
                lambda: similarity.lsh_near_dup_pairs(
                    emb, 0.4, bands=entrymod.LSH_BANDS,
                    rows_per_band=entrymod.LSH_ROWS, seed=42,
                ),
            ),
        }

    def run(fn) -> float:
        spark.catalog.clearCache()
        jvm.System.gc()
        t = time.time()
        fn().write.format("noop").mode("overwrite").save()
        return round(time.time() - t, 3)

    out = {"factor": FACTOR, "trials": TRIALS, "cpus": cpus,
           "base_dir": sf_dir, "expand_sec": expand_sec, "scales": {}}
    for label, d in (("base", sf_dir), (f"x{FACTOR}", big_dir)):
        t0 = time.time()
        entrymod._version_index(spark, d)
        entrymod._moving_index(spark, d, regions=False)
        entrymod._moving_index(spark, d, regions=True)
        entrymod._nd_index(spark, d)
        entrymod._ann_index(spark, d)
        build_sec = round(time.time() - t0, 1)
        legs = pairs_for(d)
        for stored, inflight in legs.values():  # warm once
            run(stored), run(inflight)
        res = {n: {"stored": [], "inflight": []} for n in legs}
        for _ in range(TRIALS):
            for n, (stored, inflight) in legs.items():
                res[n]["stored"].append(run(stored))
                res[n]["inflight"].append(run(inflight))
        sec = {"build_sec": build_sec}
        for n, r in res.items():
            ms = statistics.median(r["stored"])
            mi = statistics.median(r["inflight"])
            sec[n] = {"stored": ms, "inflight": mi,
                      "ratio": round(ms / mi, 3)}
        out["scales"][label] = sec
        print(json.dumps({label: sec}, separators=(",", ":")), flush=True)

    record("scale_trend", out)
    print(json.dumps(out, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()
