"""Alternative global partitioners (B3 cut-list / B4 KD) — same query
results, different layouts; mutations stay partitioner-aware."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from libspatialindex_spark.operators import index_build, mutations, range_query
from libspatialindex_spark.operators.relation import SpatialRelation
from libspatialindex_spark.sources import testdata as td
from tests.conftest import SF_DIR

W = (0.2, 0.2, 0.55, 0.55)


def _want(df, conf):
    rel = SpatialRelation(df, conf, max_extent=(td.MAX_EXTENT,) * 2)
    return {r.id for r in range_query.intersects_query(rel, *W).collect()}


@pytest.mark.parametrize("partitioner", ["cutlist", "kd", "quantile"])
def test_alt_partitioner_query_parity(spark, conf, tmp_path, partitioner):
    df = td.rects(spark, SF_DIR)
    kwargs = {}
    if partitioner == "cutlist":
        # PLATON-style externally supplied cuts: equal-width Z splits
        zmax = 4 ** conf.grid_bits
        kwargs["cuts"] = [zmax // 8 * i for i in range(1, 8)]
    idx = index_build.build_index(
        df, str(tmp_path / "idx"), conf, partitioner=partitioner, **kwargs
    )
    assert idx.validate()
    got = {
        r.id for r in range_query.intersects_query(idx.relation(), *W).collect()
    }
    assert got == _want(df, conf)


def test_kd_buckets_balanced(spark, conf, tmp_path):
    df = td.rects(spark, SF_DIR)
    idx = index_build.build_index(
        df, str(tmp_path / "idx"), conf, partitioner="kd", kd_levels=4
    )
    m = idx.manifest_totals().toPandas()
    # median splits → 16 leaves with roughly equal counts on uniform data
    assert len(m) == 16
    assert m.n_rows.max() <= 3 * m.n_rows.min()


def test_kd_insert_and_reload_uses_same_spec(spark, conf, tmp_path):
    df = td.rects(spark, SF_DIR)
    a = df.filter(F.col("id") % 2 == 0)
    b = df.filter(F.col("id") % 2 != 0)
    idx = index_build.build_index(
        a, str(tmp_path / "idx"), conf, partitioner="kd", kd_levels=3
    )
    # reload from disk — spec must round-trip through boundaries.json
    idx2 = index_build.load_index(spark, str(tmp_path / "idx"), conf)
    assert idx2.spec.kind == "kd" and idx2.spec.kd_tree == idx.spec.kd_tree
    mutations.insert_batch(idx2, b, build_id="ins")
    assert idx2.validate()
    got = {
        r.id
        for r in range_query.intersects_query(idx2.relation(), *W).collect()
    }
    assert got == _want(df, conf)


def test_workload_aware_cuts_skip_queries(spark, conf):
    """B5: given a workload clustered left of x=0.3, the greedy cut must let
    those queries skip the right side — i.e. the root x-cut moves right of
    the query cluster instead of sitting at the data median."""
    rng = np.random.default_rng(7)
    pts = rng.random((5000, 2))
    queries = np.array([[0.0, 0.0, 0.25, 1.0]] * 20)
    plain = index_build.kd_partition_tree(pts, levels=1)
    aware = index_build.kd_partition_tree(pts, levels=1, workload=queries)
    # level-1 tree: [dim, cut, leafL, leafR]
    assert plain[0] == 0 and aware[0] == 0
    assert abs(plain[1] - 0.5) < 0.05  # median of uniform
    assert aware[1] > 0.25  # all 20 queries skip the right child
    n_skip = (queries[:, 2] < aware[1]).sum()
    assert n_skip == 20


def test_manifest_mbr_pruning_in_plan(spark, conf, tmp_path):
    """KD indexes have no z-prefix dirs, but manifest-MBR pruning must still
    cut the bucket IN-list below the full bucket count."""
    df = td.rects(spark, SF_DIR)
    idx = index_build.build_index(
        df, str(tmp_path / "idx"), conf, partitioner="kd", kd_levels=4
    )
    rel = idx.relation()
    small = rel.pruned_for_box(0.1, 0.1, 0.15, 0.15)
    plan = small._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters", 1)[1][:400]
    assert "bucket" in seg
    n_full = len(rel.bucket_boxes)
    n_hit = seg.count(",") + 1
    assert n_hit < n_full