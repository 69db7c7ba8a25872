"""spark-submit entry point for the flagship pipeline.

    spark-submit --py-files libspatialindex_spark.zip scripts/run_pipeline.py \
        --images /path/to/images_parquet --polys-sf /root/testdata/sf0.01 \
        --out /tmp/tiled_out [--resume] [--salt 16] [--n-images 100000]

On a cluster the same invocation works unchanged: the module zip ships the
engine; ``--resume`` continues a killed run at tile-group granularity.
Builds the image table synthetically when ``--images`` is omitted.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from libspatialindex_spark import pipeline
from libspatialindex_spark.config import EngineConfig
from libspatialindex_spark.session import get_spark
from libspatialindex_spark.sources import testdata as td


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", default=None, help="parquet path of image table")
    ap.add_argument("--n-images", type=int, default=100_000)
    ap.add_argument("--polys-sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", required=True)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--salt", type=int, default=None)
    ap.add_argument("--broadcast", action="store_true", default=True)
    args = ap.parse_args()

    spark = get_spark("run_pipeline")
    conf = EngineConfig()
    if args.images:
        images = spark.read.parquet(args.images)
    else:
        images = pipeline.materialize_images(
            spark, args.n_images, args.out + "_src", skewness=2.0
        )
    polys = td.polys(spark, args.polys_sf)
    t0 = time.time()
    out = pipeline.run_to_storage(
        images, polys, args.out, conf,
        resume=args.resume, salt=args.salt,
        broadcast_polys=args.salt is None,
    )
    n = out.count()
    print(json.dumps({
        "rows_written": n,
        "seconds": round(time.time() - t0, 2),
        "out": args.out,
        "resumed": args.resume,
    }))


if __name__ == "__main__":
    main()
