"""Mutations on a stored index — M1 insert / M2 delete (SURVEY.md §2.2).

Reference semantics: ``insertData`` descends the tree, splits/reinserts on
overflow (``src/rtree/RTree.cc:578-597``, ``Node.cc:288-478``);
``deleteData`` finds the exact (mbr, id) leaf entry and condenses
(``RTree.cc:599-608``).  In the distributed layout, tree maintenance
disappears: an insert is an append into the right bucket directories; a
delete is an anti-join rewrite of only the buckets that contain the
victims.  Both update the manifest so lineage/validity stay consistent —
the tree-quality counters (splits, reinserts) become bucket-level
rows/bytes deltas.

Both operations are **bucket-local**: untouched buckets' files and
manifest rows are left byte-identical, which is what keeps mutation cost
proportional to affected data, not table size (the chooseSubtree descent
analog: routing by Z prefix).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from libspatialindex_spark.operators.index_build import StoredIndex
from libspatialindex_spark.operators.relation import BoxCols
from libspatialindex_spark.plans import manifest as M


def insert_batch(
    idx: StoredIndex,
    rows: DataFrame,
    box: BoxCols | None = None,
    bytes_col: str | None = None,
    build_id: str = "insert",
) -> StoredIndex:
    """M1 — append a batch of entries; only touched buckets change.

    New files land inside existing ``bucket=`` dirs (parquet append);
    the manifest gains one row per touched bucket under ``build_id`` —
    per-bucket totals are the sum over its manifest rows."""
    keyed = idx.keyed(rows, box)
    (
        keyed.repartitionByRange(idx.conf.target_partitions, "z")
        .sortWithinPartitions("z")
        .write.partitionBy("bucket")
        .mode("append")
        .parquet(idx.data_path)
    )
    mdf = M.manifest_for(keyed, bytes_col=bytes_col, build_id=build_id)
    mdf.write.mode("append").parquet(M.manifest_path(idx.path))
    return idx


def delete_rows(
    idx: StoredIndex,
    victims: DataFrame,
    id_col: str = "id",
    box: BoxCols | None = None,
    bytes_col: str | None = None,
    build_id: str = "delete",
) -> StoredIndex:
    """M2 — remove entries by id; rewrites ONLY buckets holding victims.

    ``victims`` must carry the id column (and MBR columns if available, to
    route directly; otherwise victim buckets are discovered by semi-join).
    """
    spark = idx.spark
    box = box or BoxCols()
    data = spark.read.parquet(idx.data_path)

    if set(c.name for c in victims.schema) >= {box.xmin, box.xmax, box.ymin, box.ymax}:
        vb = idx.keyed(victims, box).select(id_col, "bucket")
    else:
        vb = data.join(
            victims.select(id_col), on=id_col, how="left_semi"
        ).select(id_col, "bucket")
    touched = [r["bucket"] for r in vb.select("bucket").distinct().collect()]
    if not touched:
        return idx

    # Rewrite each touched bucket without the victims (anti-join), staged
    # next to the live dirs, then swap — crash before swap leaves the old
    # bucket intact (manifest still describes it).
    staged = os.path.join(idx.path, "_staging_delete")
    if os.path.isdir(staged):
        shutil.rmtree(staged)
    survivors = (
        spark.read.option("basePath", idx.data_path)
        .parquet(*[os.path.join(idx.data_path, f"bucket={b}") for b in touched])
        .join(victims.select(id_col), on=id_col, how="left_anti")
    )
    survivors.write.partitionBy("bucket").mode("overwrite").parquet(staged)

    for b in touched:
        live = os.path.join(idx.data_path, f"bucket={b}")
        new = os.path.join(staged, f"bucket={b}")
        shutil.rmtree(live, ignore_errors=True)
        if os.path.isdir(new):
            shutil.move(new, live)
    shutil.rmtree(staged, ignore_errors=True)

    # Manifest: drop touched buckets' rows, re-append fresh aggregates.
    man = idx.manifest().filter(~F.col("bucket").isin(touched)).toPandas()
    still = [
        b for b in touched
        if os.path.isdir(os.path.join(idx.data_path, f"bucket={b}"))
        and any(
            f.endswith(".parquet")
            for f in os.listdir(os.path.join(idx.data_path, f"bucket={b}"))
        )
    ]
    if still:
        fresh = M.manifest_for(
            spark.read.option("basePath", idx.data_path).parquet(
                *[os.path.join(idx.data_path, f"bucket={b}") for b in still]
            ),
            bytes_col=bytes_col,
            build_id=build_id,
        ).toPandas()
        import pandas as pd

        man = pd.concat([man, fresh], ignore_index=True)
    mpath = M.manifest_path(idx.path)
    shutil.rmtree(mpath)
    spark.createDataFrame(man).write.mode("overwrite").parquet(mpath)
    return idx
