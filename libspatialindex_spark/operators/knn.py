"""k-nearest-neighbor query — Q4 (SURVEY.md §2.1).

Reference semantics (``src/rtree/RTree.cc:744-812``): best-first search on a
min-dist priority queue, distance = Euclidean point↔MBR
(``Region.cc:407-429``), and — the subtle part — **every entry tied at the
k-th distance is returned**, so the result can exceed k rows
(``RTree.cc:760-762``: stop only when the next node's minDist strictly
exceeds the current k-th bound).

Distributed shape (no global priority queue):

1. **Ring expansion** (driver loop): grow a square window around the query
   point until ≥ k entries lie within true distance r (cheap pruned
   count jobs — the analog of descending the tree until the queue holds k
   leaves).  Entries outside the window have dist > r ≥ d_k, so the window
   is a certified superset.
2. **Threshold**: d_k = k-th smallest distance among candidates (a top-k
   ``orderBy().limit(k)`` on the pruned set — tiny).
3. **Tie-inclusive emit**: ``filter(dist2 <= d_k)`` — NOT ``rank() <= k``,
   which would drop ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from libspatialindex_spark.functions import geometry as G
from libspatialindex_spark.operators.relation import SpatialRelation


def _dist2(rel: SpatialRelation, px: float, py: float):
    b = rel.box
    return G.min_dist2_point(
        F.col(b.xmin), F.col(b.ymin), F.col(b.xmax), F.col(b.ymax), px, py
    )


def knn_query(
    rel: SpatialRelation,
    px: float,
    py: float,
    k: int,
    dist_col: str = "dist2",
) -> DataFrame:
    """All entries with point↔MBR distance ≤ the k-th smallest (ties kept).

    Returns the input columns plus ``dist_col`` (squared distance — sqrt is
    monotone, so ordering/ties are identical to the reference's Euclidean).
    """
    conf = rel.conf
    wxmin, wymin, wxmax, wymax = conf.world
    world_r = max(wxmax - wxmin, wymax - wymin)
    expand = rel.expand_radius() or 0.0

    d2 = _dist2(rel, px, py)

    def candidates(radius: float, cap: bool = True) -> DataFrame:
        if radius < world_r:
            df = rel.pruned_for_box(
                px - radius, py - radius, px + radius, py + radius
            )
        else:
            df = rel.df
        df = df.withColumn(dist_col, d2)
        return df.filter(F.col(dist_col) <= radius * radius) if cap else df

    # Phase 1: certified superset window.  A stored index seeds the radius
    # from manifest row counts (single pass, no count jobs — the header-
    # metadata analog of the best-first descent); otherwise ring-expand
    # until the window certifies ≥ k candidates.
    seeded = rel.seed_knn_radius(px, py, k)
    if seeded is not None:
        cand = candidates(seeded)  # ≥ k rows certified within the radius
    else:
        radius = conf.knn_ring_init
        cand = candidates(radius)
        while radius < world_r and cand.limit(k).count() < k:
            radius *= conf.knn_ring_growth
            cand = candidates(radius)
        if radius >= world_r:
            # Ring saturated: fewer than k entries within world_r.  In-world
            # distances still reach sqrt(2)·world_r, and entries may lie
            # outside the configured world box — drop the distance cap and
            # consider ALL entries (the reference returns min(k, N) rows).
            cand = candidates(world_r, cap=False)

    # Persist: phases 2-3 reuse the candidate set.
    cand = cand.persist()
    try:
        # Phase 2: exact k-th distance bound (top-k on the pruned set).
        kth_rows = (
            cand.select(dist_col).orderBy(dist_col).limit(k)
            .agg(F.max(dist_col).alias("kth")).collect()
        )
        kth = kth_rows[0]["kth"]
        if kth is None:  # empty relation
            return cand.filter(F.lit(False)).localCheckpoint()
        # Phase 3: tie-inclusive threshold (RTree.cc:760-762 semantics) —
        # the result is ≤ k + ties rows, so an eager localCheckpoint is
        # cheap and lets us unpersist the (large) candidate cache instead
        # of leaking it into a long-lived session (VERDICT r1 #7).
        return cand.filter(F.col(dist_col) <= F.lit(kth)).localCheckpoint()
    finally:
        cand.unpersist()
