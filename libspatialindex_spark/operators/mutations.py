"""Mutations on a stored index — M1 insert / M2 delete (SURVEY.md §2.2).

Reference semantics: ``insertData`` descends the tree, splits/reinserts on
overflow (``src/rtree/RTree.cc:578-597``, ``Node.cc:288-478``);
``deleteData`` finds the exact (mbr, id) leaf entry and condenses
(``RTree.cc:599-608``).  In the distributed layout, tree maintenance
disappears: an insert is an append into the right bucket directories; a
delete is an anti-join rewrite of only the buckets that contain the
victims.  Both update the manifest so lineage/validity stay consistent.

Crash-safety protocol (single writer assumed — the reference is likewise
single-writer per tree):

* **insert** stages the batch under ``_staging_insert_<build_id>``, moves
  the staged files into live bucket dirs under build_id-prefixed names,
  then appends the manifest.  The manifest row is the commit point; a
  replay of the same ``build_id`` (streaming epoch redelivery) first checks
  the manifest — committed epochs are skipped — and otherwise sweeps any
  ``<build_id>-*`` debris before re-running, so the insert is idempotent.
* **delete** rewrites each touched bucket via rename-aside
  (``bucket=N`` → ``bucket=N.old`` → staged in → drop ``.old``): every
  crash point leaves either the old or the new data present, and
  :func:`recover` rolls an interrupted swap forward/back.  The manifest is
  replaced by the same aside/rename dance, never ``rmtree``-then-write.

All driver-side file ops go through ``plans/fs`` so the index can live on
any Hadoop filesystem, not just local disk.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from libspatialindex_spark.operators.index_build import StoredIndex
from libspatialindex_spark.operators.relation import BoxCols
from libspatialindex_spark.plans import fs as FS
from libspatialindex_spark.plans import manifest as M


def _safe(build_id: str) -> str:
    return re.sub(r"[^A-Za-z0-9_.-]", "_", build_id)


def committed_build_ids(idx: StoredIndex) -> set[str]:
    m = M.read_manifest(idx.spark, idx.path)
    if m is None:
        return set()
    return {r["build_id"] for r in m.select("build_id").distinct().collect()}


def _sweep_build(fs, data_path: str, tag: str) -> None:
    """Remove files from an uncommitted attempt of ``tag`` (crash debris)."""
    for bname in fs.listdir(data_path):
        if not bname.startswith("bucket="):
            continue
        bdir = FS.join(data_path, bname)
        for fname in fs.listdir(bdir):
            if fname.startswith(f"{tag}-"):
                fs.delete(FS.join(bdir, fname))


def insert_batch(
    idx: StoredIndex,
    rows: DataFrame,
    box: BoxCols | None = None,
    bytes_col: str | None = None,
    build_id: str = "insert",
    idempotent: bool = False,
) -> StoredIndex:
    """M1 — append a batch of entries; only touched buckets change.

    With ``idempotent=True`` a ``build_id`` already present in the manifest
    is a no-op (exactly-once under streaming epoch replay)."""
    spark = idx.spark
    fs = idx.fs
    tag = _safe(build_id)

    if idempotent:
        if build_id in committed_build_ids(idx):
            return idx  # epoch already committed — replay is a no-op
        _sweep_build(fs, idx.data_path, tag)

    staging = FS.join(idx.path, f"_staging_insert_{tag}")
    fs.delete(staging)

    keyed = idx.keyed(rows, box)
    (
        keyed.repartitionByRange(idx.conf.target_partitions, "z")
        .sortWithinPartitions("z")
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(staging)
    )
    staged = spark.read.option("basePath", staging).parquet(staging)
    mdf = M.manifest_for(staged, bytes_col=bytes_col, build_id=build_id)
    mrows = mdf.select(*M.MANIFEST_COLS).collect()  # one row per bucket

    # Move staged files into live bucket dirs under build_id-prefixed names
    # (sweepable on replay).  Readers may observe rows before the manifest
    # commit — same single-writer caveat as the reference's dirty pages.
    for bname in fs.listdir(staging):
        if not bname.startswith("bucket="):
            continue
        src_dir = FS.join(staging, bname)
        dst_dir = FS.join(idx.data_path, bname)
        fs.mkdirs(dst_dir)
        for fname in fs.listdir(src_dir):
            if not fname.endswith(".parquet"):
                continue
            fs.rename(
                FS.join(src_dir, fname), FS.join(dst_dir, f"{tag}-{fname}")
            )
    fs.delete(staging)

    # Commit point: manifest append (explicit schema — never inferred).
    spark.createDataFrame(mrows, schema=M.MANIFEST_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(M.manifest_path(idx.path))
    return idx


def recover(idx: StoredIndex) -> None:
    """Roll interrupted bucket/manifest swaps forward or back.

    * ``bucket=N.old`` next to a live ``bucket=N`` → the swap completed,
      drop the aside copy; without a live dir → the swap died mid-way,
      restore the aside copy.
    * ``manifest.old`` / ``manifest.new`` analogously.
    """
    fs = idx.fs
    for name in fs.listdir(idx.data_path):
        if not (name.startswith("bucket=") and name.endswith(".old")):
            continue
        aside = FS.join(idx.data_path, name)
        live = FS.join(idx.data_path, name[: -len(".old")])
        if fs.isdir(live):
            fs.delete(aside)
        else:
            fs.rename(aside, live)
    mpath = M.manifest_path(idx.path)
    if fs.isdir(mpath + ".old"):
        if fs.isdir(mpath):
            fs.delete(mpath + ".old")
        else:
            fs.rename(mpath + ".old", mpath)
    fs.delete(mpath + ".new")


def _replace_manifest(idx: StoredIndex, fresh: DataFrame) -> None:
    """Atomically replace the manifest (write new → aside → swap → drop)."""
    fs = idx.fs
    mpath = M.manifest_path(idx.path)
    fresh.coalesce(1).write.mode("overwrite").parquet(mpath + ".new")
    if fs.isdir(mpath):
        fs.rename(mpath, mpath + ".old")
    fs.rename(mpath + ".new", mpath)
    fs.delete(mpath + ".old")


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
    fs = idx.fs
    box = box or BoxCols()
    recover(idx)  # finish any interrupted earlier swap first
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
    # next to the live dirs.
    staged = FS.join(idx.path, "_staging_delete")
    fs.delete(staged)
    survivors = (
        spark.read.option("basePath", idx.data_path)
        .parquet(*[FS.join(idx.data_path, f"bucket={b}") for b in touched])
        .join(victims.select(id_col), on=id_col, how="left_anti")
    )
    survivors.write.partitionBy("bucket").mode("overwrite").parquet(staged)

    # Swap per bucket: aside → move in → drop aside.  Every crash point
    # leaves old or new data present (recover() finishes the job).
    for b in touched:
        live = FS.join(idx.data_path, f"bucket={b}")
        old = FS.join(idx.data_path, f"bucket={b}.old")
        fs.delete(old)
        src = FS.join(staged, f"bucket={b}")
        has_new = fs.isdir(src) and any(
            f.endswith(".parquet") for f in fs.listdir(src)
        )
        if fs.isdir(live):
            fs.rename(live, old)
        if has_new:
            fs.rename(src, live)
        fs.delete(old)
    fs.delete(staged)

    # Manifest: drop touched buckets' rows, re-append fresh aggregates —
    # staged + atomic swap, explicit schema (survives an all-deleted case).
    keep_rows = (
        idx.manifest()
        .filter(~F.col("bucket").isin(touched))
        .select(*M.MANIFEST_COLS)
        .collect()
    )
    still = [
        b for b in touched
        if fs.isdir(FS.join(idx.data_path, f"bucket={b}"))
        and any(
            f.endswith(".parquet")
            for f in fs.listdir(FS.join(idx.data_path, f"bucket={b}"))
        )
    ]
    fresh_rows = []
    if still:
        fresh_rows = M.manifest_for(
            spark.read.option("basePath", idx.data_path).parquet(
                *[FS.join(idx.data_path, f"bucket={b}") for b in still]
            ),
            bytes_col=bytes_col,
            build_id=build_id,
        ).select(*M.MANIFEST_COLS).collect()
    fresh = spark.createDataFrame(
        keep_rows + fresh_rows, schema=M.MANIFEST_SCHEMA
    )
    _replace_manifest(idx, fresh)
    return idx
