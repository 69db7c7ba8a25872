"""Time-versioned and moving-object queries — Q9 / Q10 (SURVEY.md §2.1).

Q9 (MVR-tree analog, ``src/mvrtree/MVRTree.cc:1233-1293``): entries carry a
right-open validity interval ``[tstart, tend)`` (``tools/Tools.h:80-84``,
``IT_RIGHTOPEN``) derived by folding the timestamped insert/delete op
stream (:func:`versions_from_ops` — ``test/mvrtree/Generator.cc:79-81``
semantics, re-inserts create new versions of the same id).  A time-range
query selects versions whose interval intersects the query interval AND
whose MBR passes the spatial predicate; ids matched by several live
versions are emitted ONCE — the reference's ``visitedData`` dedup set
(``MVRTree.cc:1283-1291``) is the ``dropDuplicates`` on id.

Q10 (TPR-tree analog, ``src/tprtree/TPRTree.cc:1207-1252``): entries are
linear trajectories ``pos(t) = p + v·t``; a query (window, [t0, t1]) emits
entries whose extrapolated position enters the window at some t in
[t0, t1].  Per axis the feasible t-interval is computed in closed form;
the answer is non-empty intersection of both axes' intervals with
[t0, t1].  The reference's horizon check (``:1211-1212``) becomes a
validation guard.

Both are pure Column expressions — codegen end to end, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from libspatialindex_spark.functions import geometry as G
from libspatialindex_spark.operators.relation import SpatialRelation

_FAR = 1.0e18  # empty-interval sentinel


def versions_from_ops(
    ops: DataFrame,
    id_col: str = "id",
    op_col: str = "op",
    t_col: str = "t",
    box_cols: tuple[str, str, str, str] = ("xmin", "ymin", "xmax", "ymax"),
) -> DataFrame:
    """Fold a timestamped insert/delete op stream into validity intervals.

    The MVR structure's entries are (shape, id, [tstart, tend)) born by an
    INSERT and closed by the DELETE of the exact same (mbr, id) — the
    ``deleteData`` contract (``RTree.cc:599-608`` locates the leaf by exact
    (mbr, id); ``test/mvrtree/Generator.cc:79-81`` emits exactly such a
    timeline).  An entry never deleted stays open (tend = +inf).

    Pairing is **rank-matched**: within each (id, mbr) group the k-th
    INSERT (by time) closes with the k-th DELETE (by time) — FIFO, the
    order the reference would apply the ops.  A naive (id, mbr) equi-join
    would cross-match when an id is deleted and later RE-inserted with an
    identical box (inverted [t_ins2, t_del1) intervals, lost open
    intervals); rank matching also resolves the delete+insert-at-the-same-
    timestamp tie correctly (the delete closes the OLD version, not the one
    being born).  Assumes a well-formed stream (every delete targets a
    currently-live entry), which ``deleteData`` guarantees — it errors on a
    miss.

    Shape (r6): ONE hash-aggregate shuffle on (id, mbr) — per group,
    collect + sort the insert and delete timestamps and zip the k-th
    insert with the k-th delete (missing delete → open interval).  This
    is the same rank-matching as the previous window+join formulation
    (verified row-identical over the 800k-version fixture) with one
    Exchange and no join: the op stream is folded in a single pass, and
    per-group state is bounded by an entry's version count (tiny).  At
    scale an op log partitioned by id co-locates the whole fold."""
    g = ops.groupBy(id_col, *box_cols).agg(
        F.sort_array(
            F.collect_list(F.when(F.col(op_col) == 1, F.col(t_col)))
        ).alias("_ti"),
        F.sort_array(
            F.collect_list(F.when(F.col(op_col) == 0, F.col(t_col)))
        ).alias("_td"),
    )
    pair = F.explode(
        F.transform(
            F.col("_ti"),
            lambda x, i: F.struct(
                x.alias("tstart"),
                # try_element_at: NULL (not an ANSI error) past the end —
                # an insert with no matching delete stays open
                F.coalesce(
                    F.try_element_at(F.col("_td"), i + 1), F.lit(_FAR)
                ).alias("tend"),
            ),
        )
    )
    return g.select(
        F.col(id_col), *[F.col(c) for c in box_cols], pair.alias("_p")
    ).select(
        id_col,
        *box_cols,
        F.col("_p.tstart").alias("tstart"),
        F.col("_p.tend").alias("tend"),
    )


def interval_overlaps(
    tstart: Column, tend: Column, qt0: float, qt1: float
) -> Column:
    """Right-open interval intersection: [tstart, tend) ∩ [qt0, qt1) ≠ ∅
    (MVRTree.cc findRootIdentifiers / Tools.h IT_RIGHTOPEN semantics)."""
    return (tstart < F.lit(qt1)) & (tend > F.lit(qt0))


def time_range_query(
    rel: SpatialRelation,
    qxmin: float,
    qymin: float,
    qxmax: float,
    qymax: float,
    qt0: float,
    qt1: float,
    tstart: str = "tstart",
    tend: str = "tend",
    id_col: str = "id",
) -> DataFrame:
    """Q9 — spatial intersection restricted to a validity-time interval."""
    b = rel.box
    out = rel.pruned_for_box(qxmin, qymin, qxmax, qymax).filter(
        interval_overlaps(F.col(tstart), F.col(tend), qt0, qt1)
        & G.intersects(
            F.col(b.xmin), F.col(b.ymin), F.col(b.xmax), F.col(b.ymax),
            qxmin, qymin, qxmax, qymax,
        )
    )
    # Version-dedup guard (MVRTree.cc:1283-1291 visitedData semantics).
    return out.dropDuplicates([id_col])


def _axis_interval(p: Column, v: Column, lo: float, hi: float):
    """Feasible t-interval for lo ≤ p + v·t ≤ hi (closed).  Returns
    (t_lo, t_hi) Columns; empty encoded as (FAR, -FAR)."""
    ta = (F.lit(lo) - p) / v
    tb = (F.lit(hi) - p) / v
    inside_now = (F.lit(lo) <= p) & (p <= F.lit(hi))
    t_lo = (
        F.when(v == 0.0, F.when(inside_now, F.lit(-_FAR)).otherwise(F.lit(_FAR)))
        .otherwise(F.least(ta, tb))
    )
    t_hi = (
        F.when(v == 0.0, F.when(inside_now, F.lit(_FAR)).otherwise(F.lit(-_FAR)))
        .otherwise(F.greatest(ta, tb))
    )
    return t_lo, t_hi


def _check_horizon(t0: float, t1: float, horizon: float | None, now: float):
    """TPR horizon guard (``TPRTree.cc:1211-1212``): the query interval
    must lie within [now, now + horizon) or the structure's extrapolation
    is invalid — the reference rejects such queries outright."""
    if horizon is not None and not (now <= t0 and t1 < now + horizon):
        raise ValueError(
            f"query interval [{t0}, {t1}] outside the TPR horizon "
            f"[{now}, {now + horizon}) (TPRTree.cc:1211-1212)"
        )


def moving_range_query(
    points: DataFrame,
    qxmin: float,
    qymin: float,
    qxmax: float,
    qymax: float,
    t0: float,
    t1: float,
    x: str = "x",
    y: str = "y",
    vx: str = "vx",
    vy: str = "vy",
    horizon: float | None = None,
    now: float = 0.0,
) -> DataFrame:
    """Q10 — moving points whose trajectory meets the window during
    [t0, t1] (closed, reference time 0)."""
    _check_horizon(t0, t1, horizon, now)
    tx_lo, tx_hi = _axis_interval(F.col(x), F.col(vx), qxmin, qxmax)
    ty_lo, ty_hi = _axis_interval(F.col(y), F.col(vy), qymin, qymax)
    enter = F.greatest(tx_lo, ty_lo, F.lit(float(t0)))
    leave = F.least(tx_hi, ty_hi, F.lit(float(t1)))
    return points.filter(enter <= leave)


def _halfline(c0: Column, c1: Column, bound: float, upper: bool):
    """Feasible t-interval of the linear constraint
    ``c0 + c1·t ≤ bound`` (upper=True) or ``c0 + c1·t ≥ bound``.

    Returns (t_lo, t_hi); unconstrained / empty encoded with ±FAR."""
    _F_FAR = F.lit(_FAR)
    t = (F.lit(bound) - c0) / c1
    always = (c0 <= F.lit(bound)) if upper else (c0 >= F.lit(bound))
    if upper:
        # c1 > 0 → t ≤ cross; c1 < 0 → t ≥ cross; c1 = 0 → all or none
        t_lo = F.when(c1 == 0.0, F.when(always, -_F_FAR).otherwise(_F_FAR)) \
            .when(c1 > 0.0, -_F_FAR).otherwise(t)
        t_hi = F.when(c1 == 0.0, F.when(always, _F_FAR).otherwise(-_F_FAR)) \
            .when(c1 > 0.0, t).otherwise(_F_FAR)
    else:
        t_lo = F.when(c1 == 0.0, F.when(always, -_F_FAR).otherwise(_F_FAR)) \
            .when(c1 > 0.0, t).otherwise(-_F_FAR)
        t_hi = F.when(c1 == 0.0, F.when(always, _F_FAR).otherwise(-_F_FAR)) \
            .when(c1 > 0.0, _F_FAR).otherwise(t)
    return t_lo, t_hi


def moving_region_range_query(
    regions: DataFrame,
    qxmin: float,
    qymin: float,
    qxmax: float,
    qymax: float,
    t0: float,
    t1: float,
    box: tuple[str, str, str, str] = ("xmin", "ymin", "xmax", "ymax"),
    vel: tuple[str, str, str, str] = ("vxlo", "vylo", "vxhi", "vyhi"),
    horizon: float | None = None,
    now: float = 0.0,
) -> DataFrame:
    """Moving-REGION range query — the velocity-MBR algebra of
    ``src/spatialindex/MovingRegion.cc`` (``getMBRAtTime``,
    ``SpatialIndex.h:98-104``): each entry is a box whose low and high
    edges move linearly (low edge at ``lo + vlo·t``, high at
    ``hi + vhi·t``); emit entries whose extrapolated box intersects the
    query window at some t in [t0, t1] (closed intervals).

    Per axis the closed-interval overlap ``lo(t) ≤ qhi ∧ qlo ≤ hi(t)``
    is two linear constraints in t, each a half-line; their intersection
    is an interval, and the answer is non-emptiness of the intersection
    across axes with [t0, t1] — all closed-form Columns, codegen, no UDF.
    """
    _check_horizon(t0, t1, horizon, now)
    xmin, ymin, xmax, ymax = (F.col(c) for c in box)
    vxlo, vylo, vxhi, vyhi = (F.col(c) for c in vel)

    lo_x1, hi_x1 = _halfline(xmin, vxlo, qxmax, upper=True)   # lo(t) ≤ qhi
    lo_x2, hi_x2 = _halfline(xmax, vxhi, qxmin, upper=False)  # hi(t) ≥ qlo
    lo_y1, hi_y1 = _halfline(ymin, vylo, qymax, upper=True)
    lo_y2, hi_y2 = _halfline(ymax, vyhi, qymin, upper=False)

    enter = F.greatest(lo_x1, lo_x2, lo_y1, lo_y2, F.lit(float(t0)))
    leave = F.least(hi_x1, hi_x2, hi_y1, hi_y2, F.lit(float(t1)))
    return regions.filter(enter <= leave)
