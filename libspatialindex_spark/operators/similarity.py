"""Similarity search over an embedding column (``array<float>``).

Three tiers, mirroring how the spatial kNN (SURVEY.md Q4) treats exactness
vs pruning:

* :func:`ann_topk_quantized` — brute-force top-k on a **quantized integer
  L2** distance.  Integer arithmetic end-to-end → bit-identical in any
  engine (the differential-oracle surface), tie-inclusive like the
  reference kNN (``RTree.cc:760-762``).
* :func:`ann_topk_cosine` — brute-force cosine top-k with ``F.zip_with`` /
  ``F.aggregate`` (JVM, no Python).  The float baseline.
* :func:`ann_lsh_cosine` — random-hyperplane LSH: deterministic
  sign-signature buckets prune candidates before the exact re-rank — the
  scale path (bucket key = shuffle/broadcast key, same pattern as the
  spatial cell join).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quant(e: Column) -> Column:
    """floor(x * 100000 + 0.5) — portable integer quantization."""
    return F.floor(e.cast("double") * F.lit(100000.0) + F.lit(0.5)).cast("long")


def quantized_l2(vec_col: Column, qvec: list[float]) -> Column:
    """Integer L2 distance between quantized embeddings (exact arithmetic)."""
    qarr = F.array(*[F.lit(float(v)) for v in qvec])
    return F.aggregate(
        F.zip_with(
            vec_col,
            qarr,
            lambda a, b: (_quant(a) - _quant(b)) * (_quant(a) - _quant(b)),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def ann_topk_quantized(
    df: DataFrame,
    qvec: list[float],
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Tie-inclusive top-k by quantized integer L2 (oracle-checkable)."""
    d = df.select(F.col(id_col), quantized_l2(F.col(vec_col), qvec).alias("qdist"))
    kth_rows = (
        d.select("qdist").orderBy("qdist").limit(k)
        .agg(F.max("qdist").alias("kth")).collect()
    )
    kth = kth_rows[0]["kth"]
    if kth is None:
        return d.filter(F.lit(False))
    return d.filter(F.col("qdist") <= F.lit(int(kth)))


def cosine_sim(vec_col: Column, qvec: list[float]) -> Column:
    """Cosine similarity against a constant query vector (JVM-side)."""
    qarr = F.array(*[F.lit(float(v)) for v in qvec])
    dot = F.aggregate(
        F.zip_with(vec_col, qarr, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform(vec_col, lambda a: a.cast("double") * a.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    qnorm = float(np.sqrt(np.sum(np.asarray(qvec, dtype=np.float64) ** 2)))
    return dot / (norm * F.lit(qnorm))


def ann_topk_cosine(
    df: DataFrame,
    qvec: list[float],
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k (rank-based, deterministic id tie-break)."""
    d = df.select(F.col(id_col), cosine_sim(F.col(vec_col), qvec).alias("sim"))
    return d.orderBy(F.desc("sim"), F.col(id_col)).limit(k)


def quantized_cosine_pairs(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine over *quantized integer*
    vectors ≥ threshold, id1 < id2.  Quantization makes dot products and
    norms exact integers, so the one float division + sqrt is bit-identical
    across engines (the oracle-checkable variant; brute-force O(n²) — for
    scale use :func:`lsh_near_dup_pairs`)."""
    qv = F.transform(F.col(vec_col), _quant)

    def norm2(c):
        return F.aggregate(
            F.transform(c, lambda v: v * v),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    # Quantize + norm ONCE per vector behind a persist boundary — the cross
    # join would otherwise re-evaluate the interpreted HOF per pair side.
    base = df.select(
        F.col(id_col).alias("_id"), qv.alias("_q")
    ).withColumn("_n2", norm2(F.col("_q"))).persist()
    dot = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qb"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    a = base.select(
        F.col("_id").alias("id1"), F.col("_q").alias("qa"), F.col("_n2").alias("na")
    )
    b = base.select(
        F.col("_id").alias("id2"), F.col("_q").alias("qb"), F.col("_n2").alias("nb")
    )
    pairs = a.crossJoin(b).filter(F.col("id1") < F.col("id2"))
    # cast norms to double BEFORE multiplying: the int64 product overflows
    cos = dot.cast("double") / F.sqrt(
        F.col("na").cast("double") * F.col("nb").cast("double")
    )
    return (
        pairs.withColumn("cos_q", cos)
        .filter(F.col("cos_q") >= F.lit(threshold))
        .select("id1", "id2", "cos_q")
    )


def lsh_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    n_planes: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """Scale path for embedding near-dup: bucket by hyperplane signature,
    exact cosine verify within buckets (equi-join shuffle on the bucket
    key — near-dup vectors collide with high probability)."""
    planes = hyperplanes(dim, n_planes, seed)
    sig = lsh_signature(F.col(vec_col), planes)
    base = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), sig.alias("_s")
    )
    a = base.select(
        F.col("_id").alias("id1"), F.col("_v").alias("va"), F.col("_s").alias("_s")
    )
    b = base.select(
        F.col("_id").alias("id2"), F.col("_v").alias("vb"), F.col("_s").alias("_s")
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("va"), F.col("vb"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    def norm(c):
        return F.sqrt(
            F.aggregate(
                F.transform(c, lambda v: v.cast("double") * v.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )

    return (
        a.join(b, on="_s")
        .filter(F.col("id1") < F.col("id2"))
        .withColumn("cos", dot / (norm(F.col("va")) * norm(F.col("vb"))))
        .filter(F.col("cos") >= F.lit(threshold))
        .select("id1", "id2", "cos")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes (shared by index + query side)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_signature(vec_col: Column, planes: np.ndarray) -> Column:
    """Sign-pattern bucket id: bit p set iff <v, plane_p> > 0."""
    sig = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(float(w)) for w in plane]),
                lambda a, b: a.cast("double") * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("long")
    return sig


def ann_lsh_cosine(
    df: DataFrame,
    qvec: list[float],
    k: int,
    n_planes: int = 8,
    probe_hamming: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """LSH-pruned cosine top-k: candidates = vectors whose sign-signature is
    within ``probe_hamming`` bits of the query's (multi-probe), exact cosine
    re-rank on the (much smaller) candidate set.

    At scale the signature is a materialized column of the stored table and
    the probe set is a partition-pruning IN-list — identical machinery to
    the spatial Z-cover."""
    planes = hyperplanes(len(qvec), n_planes, seed)
    qsig = 0
    qd = planes @ np.asarray(qvec, dtype=np.float64)
    for p in range(n_planes):
        if qd[p] > 0:
            qsig |= 1 << p
    probes = [qsig]
    if probe_hamming >= 1:
        probes += [qsig ^ (1 << p) for p in range(n_planes)]
    if probe_hamming >= 2:
        probes += [
            qsig ^ (1 << p) ^ (1 << r)
            for p in range(n_planes)
            for r in range(p + 1, n_planes)
        ]
    sig = lsh_signature(F.col(vec_col), planes)
    cand = df.withColumn("_sig", sig).filter(F.col("_sig").isin(probes))
    return ann_topk_cosine(cand, qvec, k, vec_col=vec_col, id_col=id_col)
