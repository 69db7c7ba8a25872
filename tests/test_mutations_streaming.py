"""M1 insert / M2 delete on a stored index + streaming ingest + stats."""

import os
import time

import pytest
from pyspark.sql import functions as F

from libspatialindex_spark.operators import index_build, mutations, range_query
from libspatialindex_spark.plans import stats
from libspatialindex_spark.sources import testdata as td
from tests.conftest import SF_DIR

W = (0.2, 0.2, 0.6, 0.6)


@pytest.fixture()
def built(spark, conf, tmp_path):
    df = td.rects(spark, SF_DIR)
    head = df.filter(F.col("id") % 3 != 0)
    tail = df.filter(F.col("id") % 3 == 0)
    idx = index_build.build_index(head, str(tmp_path / "idx"), conf)
    return idx, head, tail, df


def test_insert_batch_then_query_sees_all(built, conf):
    idx, head, tail, full = built
    mutations.insert_batch(idx, tail, build_id="ins-1")
    assert idx.validate()
    got = {
        r.id for r in range_query.intersects_query(idx.relation(), *W).collect()
    }
    from libspatialindex_spark.operators.relation import SpatialRelation

    want = {
        r.id
        for r in range_query.intersects_query(
            SpatialRelation(full, conf, max_extent=(td.MAX_EXTENT,) * 2), *W
        ).collect()
    }
    assert got == want
    # lineage: both build ids present
    builds = {r.build_id for r in idx.manifest().select("build_id").distinct().collect()}
    assert builds == {"build-1", "ins-1"}


def test_delete_rows_removes_only_victims(built, conf):
    idx, head, tail, full = built
    victims = head.select("id").limit(200)
    victim_ids = {r.id for r in victims.collect()}
    mutations.delete_rows(idx, idx.spark.createDataFrame(
        [(i,) for i in victim_ids], ["id"]
    ))
    assert idx.validate()
    rel = idx.relation()
    left = {r.id for r in rel.df.select("id").collect()}
    assert left == {r.id for r in head.select("id").collect()} - victim_ids


def test_index_statistics_shape(built):
    idx, *_ = built
    s = stats.index_statistics(idx)
    assert s["tree_height"] == 2
    assert s["n_data_rows"] == idx.manifest_totals().agg(
        F.sum("n_rows")
    ).collect()[0][0]
    assert 0 < s["utilization"] <= 1.0


def test_streaming_ingest_available_now(spark, conf, tmp_path):
    from libspatialindex_spark.streaming.ingest import stream_into_index

    df = td.rects(spark, SF_DIR)
    first = df.filter(F.col("id") % 2 == 0)
    later = df.filter(F.col("id") % 2 != 0)
    idx = index_build.build_index(first, str(tmp_path / "idx"), conf)

    src = str(tmp_path / "incoming")
    later.repartition(4).write.mode("overwrite").parquet(src)
    schema = "id long, xmin double, ymin double, xmax double, ymax double"
    q = stream_into_index(
        spark, src, idx, schema, str(tmp_path / "ckpt"), trigger_once=True
    )
    q.awaitTermination(120)
    assert idx.validate()
    total = idx.manifest_totals().agg(F.sum("n_rows")).collect()[0][0]
    assert total == df.count()
    builds = {
        r.build_id for r in idx.manifest().select("build_id").distinct().collect()
    }
    assert any(b.startswith("stream-") for b in builds)


def test_latency_recorder(built):
    idx, *_ = built
    rec = stats.LatencyRecorder()
    rel = idx.relation()
    rec.timed("w1", range_query.intersects_query(rel, *W))
    rec.timed("w2", range_query.intersects_query(rel, 0.0, 0.0, 0.1, 0.1))
    rep = rec.percentiles()
    assert rep["n"] == 2 and rep["p100_sec"] >= rep["p1_sec"] >= 0


def test_io_accounting_observed_query(built):
    """A4 completion (RTreeQuery.cc:344-349 analog): buckets pruned + rows
    scanned vs returned, counted in-flight on the running plan."""
    idx, head, *_ = built
    rel = idx.relation()
    rec = stats.LatencyRecorder()
    io = rec.timed_observed("w", rel, (0.25, 0.25, 0.30, 0.30))
    assert io["buckets_total"] > 0
    assert 0 < io["buckets_scanned"] < io["buckets_total"]  # pruning real
    assert io["rows_returned"] <= io["rows_scanned"]
    assert io["rows_scanned"] < head.count()  # leaf reads < full scan
    rep = rec.report()
    assert {"buckets_scanned", "rows_scanned"} <= set(rep.columns)
    # the emitted count matches the plain operator's answer
    n = range_query.intersects_query(rel, 0.25, 0.25, 0.30, 0.30).count()
    assert io["rows_returned"] == n


def test_io_accounting_all_predicates(built):
    """observed_query covers contains and point predicates too, agreeing
    with the plain operators."""
    idx, *_ = built
    rel = idx.relation()
    w = (0.25, 0.25, 0.40, 0.40)
    for kind, plain in (
        ("contains", range_query.contains_what_query(rel, *w)),
        ("point", range_query.point_location_query(rel, w[0], w[1])),
    ):
        df, io = stats.observed_query(rel, *w, predicate=kind)
        n = df.count()
        got = io()
        assert got["rows_returned"] == n == plain.count()
        assert got["rows_scanned"] >= got["rows_returned"]


def _bucket_file_counts(idx):
    out = {}
    for name in idx.fs.listdir(idx.data_path):
        if name.startswith("bucket=") and not name.endswith(".old"):
            out[name] = len([
                f for f in idx.fs.listdir(os.path.join(idx.data_path, name))
                if f.endswith(".parquet")
            ])
    return out


def test_compact_merges_insert_files_result_identical(built, conf):
    """M3 maintenance: several insert batches pile files into each bucket;
    compact() restores ~one z-sorted file per bucket with an IDENTICAL
    result set and a consistent manifest (r5 — the small-file landmine)."""
    import glob

    import numpy as np
    import pyarrow.parquet as pq

    idx, head, tail, full = built
    for j, m in enumerate((0, 3, 6)):
        batch = tail.filter(F.col("id") % 9 == m)
        mutations.insert_batch(idx, batch, build_id=f"ins-{j}")
    before = _bucket_file_counts(idx)
    assert max(before.values()) >= 3  # files really accumulated
    rows_before = sorted(
        r.id for r in idx.relation().df.select("id").collect()
    )  # multiset: fixture ids are not unique
    n_manifest_before = idx.manifest().count()

    mutations.compact(idx)

    after = _bucket_file_counts(idx)
    assert set(after) == set(before)
    assert max(after.values()) == 1
    assert idx.validate()
    rows_after = sorted(
        r.id for r in idx.relation().df.select("id").collect()
    )
    assert rows_after == rows_before
    # manifest collapsed: one row per bucket now, totals unchanged
    m = idx.manifest()
    assert m.count() == len(after) < n_manifest_before
    assert m.agg(F.sum("n_rows")).first()[0] == len(rows_before)
    # compacted files keep the build's in-file z order (EliminateSorts pin)
    for f in glob.glob(idx.data_path + "/bucket=*/*.parquet"):
        z = pq.read_table(f, columns=["z"])["z"].to_numpy()
        assert (np.diff(z) >= 0).all(), f
    # idempotent: nothing left to do
    mutations.compact(idx)
    assert _bucket_file_counts(idx) == after


def test_compact_noop_below_threshold(built):
    idx, *_ = built
    before = _bucket_file_counts(idx)
    mutations.compact(idx, max_files_per_bucket=64)
    assert _bucket_file_counts(idx) == before


def test_delete_keeps_in_file_z_order(built):
    """The delete path's staged rewrite must keep the (bucket, z) sort —
    a plain unsorted write silently degrades row-group zone maps for
    every rewritten bucket (r5 fix)."""
    import glob

    import numpy as np
    import pyarrow.parquet as pq

    idx, head, tail, full = built
    victims = head.select("id").limit(300)
    mutations.delete_rows(idx, idx.spark.createDataFrame(
        [(r.id,) for r in victims.collect()], ["id"]
    ))
    for f in glob.glob(idx.data_path + "/bucket=*/*.parquet"):
        z = pq.read_table(f, columns=["z"])["z"].to_numpy()
        assert (np.diff(z) >= 0).all(), f


def test_streaming_ingest_with_auto_compaction(spark, conf, tmp_path):
    """compact_every folds maintenance into the standing ingest job: after
    draining multi-epoch input, no bucket holds more than the compaction
    threshold's worth of files, and the index is complete and valid."""
    from libspatialindex_spark.streaming.ingest import stream_into_index

    df = td.rects(spark, SF_DIR)
    first = df.filter(F.col("id") % 2 == 0)
    later = df.filter(F.col("id") % 2 != 0)
    idx = index_build.build_index(first, str(tmp_path / "idx"), conf)

    src = str(tmp_path / "incoming")
    # many small input files → several micro-batch epochs (8 files/trigger)
    later.repartition(24).write.mode("overwrite").parquet(src)
    schema = "id long, xmin double, ymin double, xmax double, ymax double"
    q = stream_into_index(
        spark, src, idx, schema, str(tmp_path / "ckpt"),
        trigger_once=True, compact_every=1, compact_max_files=1,
    )
    q.awaitTermination(180)
    assert idx.validate()
    total = idx.manifest_totals().agg(F.sum("n_rows")).collect()[0][0]
    assert total == df.count()
    counts = _bucket_file_counts(idx)
    assert max(counts.values()) == 1
    builds = {
        r.build_id
        for r in idx.manifest().select("build_id").distinct().collect()
    }
    assert any(b.startswith("compact-") for b in builds)
