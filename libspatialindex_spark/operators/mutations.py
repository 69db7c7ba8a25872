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
  (``bucket=N`` → ``bucket=N.old`` → staged in), commits the manifest,
  and only then drops the ``.old`` copies: every crash point — including
  an all-deleted bucket before the manifest commit — leaves either the old
  or the new data present, and :func:`recover` rolls an interrupted swap
  forward/back.  The manifest is replaced by the same aside/rename dance,
  never ``rmtree``-then-write.

All driver-side file ops go through ``plans/fs`` so the index can live on
any Hadoop filesystem, not just local disk.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from libspatialindex_spark.operators.relation import BoxCols
from libspatialindex_spark.plans import fs as FS
from libspatialindex_spark.plans import manifest as M


def _safe(build_id: str) -> str:
    return re.sub(r"[^A-Za-z0-9_.-]", "_", build_id)


# --- index-kind dispatch: the same mutation protocol serves the 2-D
# StoredIndex and the dimension-generic NDStoredIndex (the reference's
# insert/delete API is dimension-generic, RTree.cc:306-308); only the
# manifest aggregation/schema and the box column names differ.


def _is_nd(idx) -> bool:
    # positive structural test: the ND index's box is per-axis dims (the
    # old "no spec attribute" probe broke the moment NDStoredIndex gained
    # its own partitioner spec)
    return hasattr(idx, "box") and hasattr(idx.box, "dims")


def _mpath(idx) -> str:
    if _is_nd(idx):
        return idx.manifest_path
    return M.manifest_path(idx.path)


def _read_manifest_df(idx):
    p = _mpath(idx)
    fs = idx.fs
    if not fs.isdir(p) or not any(f.endswith(".parquet") for f in fs.listdir(p)):
        return None
    return idx.spark.read.parquet(p)


def _manifest_for_idx(idx, df: DataFrame, bytes_col, build_id: str):
    if _is_nd(idx):
        from libspatialindex_spark.operators import nd

        return nd._nd_manifest_for(df, idx.box, build_id)
    return M.manifest_for(df, bytes_col=bytes_col, build_id=build_id)


def _manifest_cols(idx) -> list[str]:
    if _is_nd(idx):
        from libspatialindex_spark.operators import nd

        return nd.ND_MANIFEST_COLS
    return M.MANIFEST_COLS


def _manifest_schema(idx) -> str:
    if _is_nd(idx):
        from libspatialindex_spark.operators import nd

        return nd.ND_MANIFEST_SCHEMA
    return M.MANIFEST_SCHEMA


def _default_box(idx):
    if _is_nd(idx):
        return idx.box
    return BoxCols()


def _box_col_names(box) -> set[str]:
    if hasattr(box, "dims"):  # NDBox
        return {c for pair in box.dims for c in pair}
    return {box.xmin, box.ymin, box.xmax, box.ymax}


def _invalidate_file_map(idx) -> None:
    """Drop the per-file zone map + learned models after a mutation —
    a stale file map would silently exclude newly-inserted files from
    pruned scans.  Rebuild with ``index_build.refresh_file_map``."""
    if not hasattr(idx, "filemap_path"):
        return
    fs = idx.fs
    fs.delete(idx.filemap_path)
    fs.delete(FS.join(idx.path, "zm_models.json"))


def committed_build_ids(idx) -> set[str]:
    m = _read_manifest_df(idx)
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
    idx,
    rows: DataFrame,
    box=None,
    bytes_col: str | None = None,
    build_id: str = "insert",
    idempotent: bool = False,
):
    """M1 — append a batch of entries; only touched buckets change.
    Works on 2-D and N-d stored indexes alike (dispatch above).

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
        # (bucket, z): keeps the writer from inserting its own partition
        # sort, which would let EliminateSorts drop the z order (see
        # index_build.bulk_load note)
        .sortWithinPartitions("bucket", "z")
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(staging)
    )
    staged = spark.read.option("basePath", staging).parquet(staging)
    mdf = _manifest_for_idx(idx, staged, bytes_col, build_id)
    mrows = mdf.select(*_manifest_cols(idx)).collect()  # one row per bucket

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
    # The file map goes stale FIRST (fail-safe: losing it only loses the
    # refinement; keeping a stale one would lose rows from pruned scans).
    _invalidate_file_map(idx)
    spark.createDataFrame(
        mrows, schema=_manifest_schema(idx)
    ).coalesce(1).write.mode("append").parquet(_mpath(idx))
    return idx


def recover(idx) -> None:
    """Roll interrupted bucket/manifest swaps forward or back —
    CONSISTENTLY with the manifest (the commit record).

    1. Settle the manifest swap first (``manifest.old`` restored when no
       live manifest exists, dropped otherwise; ``manifest.new`` debris
       removed) — after this the manifest is either pre- or post-commit,
       never mid-swap.
    2. For every ``bucket=N.old`` aside: roll FORWARD (drop the aside) iff
       the settled manifest's row count for N matches the live dir (the
       mutation committed — the aside is post-commit debris); otherwise
       roll BACK (restore the aside over whatever partial rewrite the
       crash left).  A pre-commit crash therefore restores the exact
       pre-mutation state everywhere — including buckets whose rewrite had
       finished and all-deleted buckets with no live dir — and the
       interrupted mutation can simply be re-run.

    The row-count probe reads only the touched buckets' parquet footers —
    recovery-path-only cost.
    """
    fs = idx.fs
    mpath = _mpath(idx)
    if fs.isdir(mpath + ".old"):
        if fs.isdir(mpath):
            fs.delete(mpath + ".old")
        else:
            fs.rename(mpath + ".old", mpath)
    fs.delete(mpath + ".new")

    asides = [
        name
        for name in fs.listdir(idx.data_path)
        if name.startswith("bucket=") and name.endswith(".old")
    ]
    if not asides:
        return
    m = _read_manifest_df(idx)
    counts: dict[int, int] = {}
    if m is not None:
        counts = {
            r["bucket"]: int(r["n"])
            for r in m.groupBy("bucket").agg(F.sum("n_rows").alias("n")).collect()
        }
    for name in asides:
        aside = FS.join(idx.data_path, name)
        live = FS.join(idx.data_path, name[: -len(".old")])
        b = int(name[len("bucket="): -len(".old")])
        want = counts.get(b, 0)
        has_live = fs.isdir(live) and any(
            f.endswith(".parquet") for f in fs.listdir(live)
        )
        live_rows = idx.spark.read.parquet(live).count() if has_live else 0
        if m is not None and live_rows == want:
            fs.delete(aside)  # forward: manifest already describes live
        else:
            fs.delete(live)  # back: restore the pre-mutation copy
            fs.rename(aside, live)


def _replace_manifest(idx, fresh: DataFrame) -> None:
    """Atomically replace the manifest (write new → aside → swap → drop)."""
    fs = idx.fs
    mpath = _mpath(idx)
    fresh.coalesce(1).write.mode("overwrite").parquet(mpath + ".new")
    if fs.isdir(mpath):
        fs.rename(mpath, mpath + ".old")
    fs.rename(mpath + ".new", mpath)
    fs.delete(mpath + ".old")


def delete_rows(
    idx,
    victims: DataFrame,
    id_col: str = "id",
    box=None,
    bytes_col: str | None = None,
    build_id: str = "delete",
):
    """M2 — remove entries by id; rewrites ONLY buckets holding victims.
    Works on 2-D and N-d stored indexes alike (dispatch above).

    ``victims`` must carry the id column (and box columns if available, to
    route directly; otherwise victim buckets are discovered by semi-join).
    """
    spark = idx.spark
    fs = idx.fs
    box = box or _default_box(idx)
    recover(idx)  # finish any interrupted earlier swap first
    data = spark.read.parquet(idx.data_path)

    if set(c.name for c in victims.schema) >= _box_col_names(box):
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
    # (bucket, z) sort: rewritten buckets keep the build's in-file z
    # clustering (plain unsorted staging silently degraded row-group zone
    # maps for every deleted-from bucket — the EliminateSorts class of
    # regression, caught in r5)
    survivors.sortWithinPartitions("bucket", "z").write.partitionBy(
        "bucket"
    ).mode("overwrite").parquet(staged)

    # Swap per bucket: aside → move in.  The ``.old`` aside copies are NOT
    # deleted here — they survive until after the manifest commit below, so
    # every crash point leaves old or new data present for EVERY bucket
    # (including the all-deleted case, whose bucket has no new dir): before
    # the manifest commit, recover() can restore the aside consistently
    # with the still-old manifest; after it, recover() just drops asides.
    for b in touched:
        live = FS.join(idx.data_path, f"bucket={b}")
        old = FS.join(idx.data_path, f"bucket={b}.old")
        fs.delete(old)  # stale aside from pre-recover() eras only
        src = FS.join(staged, f"bucket={b}")
        has_new = fs.isdir(src) and any(
            f.endswith(".parquet") for f in fs.listdir(src)
        )
        if fs.isdir(live):
            fs.rename(live, old)
        if has_new:
            fs.rename(src, live)
    fs.delete(staged)

    # Manifest: drop touched buckets' rows, re-append fresh aggregates —
    # staged + atomic swap, explicit schema (survives an all-deleted case).
    keep_rows = (
        idx.manifest()
        .filter(~F.col("bucket").isin(touched))
        .select(*_manifest_cols(idx))
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
        fresh_rows = _manifest_for_idx(
            idx,
            spark.read.option("basePath", idx.data_path).parquet(
                *[FS.join(idx.data_path, f"bucket={b}") for b in still]
            ),
            bytes_col,
            build_id,
        ).select(*_manifest_cols(idx)).collect()
    fresh = spark.createDataFrame(
        keep_rows + fresh_rows, schema=_manifest_schema(idx)
    )
    _invalidate_file_map(idx)  # before commit: stale map must never survive
    _replace_manifest(idx, fresh)
    # Only now — past the commit point — drop the aside copies.  A crash in
    # this window leaves harmless ``.old`` debris that recover() sweeps.
    for b in touched:
        fs.delete(FS.join(idx.data_path, f"bucket={b}.old"))
    return idx


def compact(
    idx,
    max_files_per_bucket: int = 1,
    max_records_per_file: int | None = None,
    bytes_col: str | None = None,
    build_id: str = "compact",
):
    """M3 maintenance — merge each bucket's accumulated insert files back
    into few z-sorted files (the reorganization the reference performs
    inside ``flush``/node rewrites, ``src/rtree/RTree.cc`` M3 surface).

    Every ``insert_batch`` appends ≥1 file per touched bucket, so a
    long-lived index accumulates small files whose listing + footer reads
    eventually dominate scans — the classic 100-TB landmine.  Compaction
    rewrites only buckets holding more than ``max_files_per_bucket``
    parquet files, restoring the build-time layout: one task per bucket,
    ``(bucket, z)``-sorted files (the sort spelling that survives
    ``EliminateSorts`` under a partitioned write), optionally re-split by
    ``max_records_per_file`` for file-map granularity.

    Crash-safety is ``delete_rows``' discipline verbatim: staged rewrite →
    per-bucket ``.old`` aside swap → atomic manifest replace → asides
    dropped post-commit; :func:`recover` rolls any torn state to a
    consistent pre- or post-compaction snapshot.  Row sets are identical
    before and after — only physical file count and in-file order change.
    Works on 2-D and N-d stored indexes alike (shared z/bucket layout).
    """
    spark = idx.spark
    fs = idx.fs
    recover(idx)

    touched = []
    for name in fs.listdir(idx.data_path):
        if not name.startswith("bucket=") or name.endswith(".old"):
            continue
        files = [
            f
            for f in fs.listdir(FS.join(idx.data_path, name))
            if f.endswith(".parquet")
        ]
        if len(files) > max_files_per_bucket:
            touched.append(int(name[len("bucket="):]))
    if not touched:
        return idx

    staged = FS.join(idx.path, "_staging_compact")
    fs.delete(staged)
    data = spark.read.option("basePath", idx.data_path).parquet(
        *[FS.join(idx.data_path, f"bucket={b}") for b in touched]
    )
    writer = (
        data.repartition(len(touched), F.col("bucket"))
        .sortWithinPartitions("bucket", "z")
        .write.partitionBy("bucket")
        .mode("overwrite")
    )
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
    writer.parquet(staged)

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
    fs.delete(staged)

    # Manifest: touched buckets collapse to ONE fresh aggregate row each
    # (insert had appended one row per batch) — same staged swap as delete.
    keep_rows = (
        idx.manifest()
        .filter(~F.col("bucket").isin(touched))
        .select(*_manifest_cols(idx))
        .collect()
    )
    fresh_rows = _manifest_for_idx(
        idx,
        spark.read.option("basePath", idx.data_path).parquet(
            *[FS.join(idx.data_path, f"bucket={b}") for b in touched]
        ),
        bytes_col,
        build_id,
    ).select(*_manifest_cols(idx)).collect()
    fresh = spark.createDataFrame(
        keep_rows + fresh_rows, schema=_manifest_schema(idx)
    )
    _invalidate_file_map(idx)  # before commit: stale map must never survive
    _replace_manifest(idx, fresh)
    for b in touched:
        fs.delete(FS.join(idx.data_path, f"bucket={b}.old"))
    return idx
