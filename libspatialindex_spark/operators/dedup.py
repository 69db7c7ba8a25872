"""Deduplication operators for training-data pipelines.

Exact dedup (hash groupBy), MinHash+LSH near-dup (shingle → minhash →
band → bucket self-join → exact-Jaccard verify), SimHash, and n-gram
Jaccard — the standard web-scale text-dedup toolbox, Spark-first:

* shingling / hashing / signatures are Column expressions over array
  functions (JVM codegen; the only per-row cost is md5 for the portable
  hash mode or xxhash64 for the fast mode);
* the candidate generation is an equi-join on (band, signature) — i.e. the
  shuffle key is the LSH bucket, exactly the "smallest common cell" trick
  the spatial self-join uses (SURVEY.md Q5);
* at 100 TB: bucket sizes are bounded by banding; a pathological bucket
  (all-identical boilerplate) is a hot key → the same salting used for hot
  spatial cells applies.

Portable mode uses ``text.h60`` so DuckDB can replicate signatures
bit-for-bit; fast mode uses Spark-native ``xxhash64``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from libspatialindex_spark.operators.text import h60

MERSENNE61 = (1 << 61) - 1
# (a, b) parameters for the minhash family h_j = (a_j * H + b_j) % M61.
# a ≤ 7 keeps a*H < 2^63 for the 60-bit portable hash (no overflow in
# either engine).
MINHASH_PARAMS = [((j % 7) + 1, 1000003 * (j + 1) + 17) for j in range(16)]


def exact_dedup_groups(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: md5(text) → representative id + count."""
    return (
        df.groupBy(F.md5(F.col(text_col).cast("binary")).alias("dup_key"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def shingles(col, k: int = 8) -> Column:
    """Distinct character k-gram array (empty-safe)."""
    c = col if isinstance(col, Column) else F.col(col)
    n = F.length(c)
    return F.when(n < k, F.array(c)).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - k + 1),
                lambda i: F.substring(c, i, F.lit(k)),
            )
        )
    )


def _hash_expr(s: Column, portable: bool) -> Column:
    if portable:
        return h60(s)
    return F.pmod(F.xxhash64(s), F.lit(MERSENNE61))


def minhash_signature(
    col, k: int = 8, n_hashes: int = 16, portable: bool = True
) -> Column:
    """Array of n_hashes min-hash values over the k-gram set."""
    sh = shingles(col, k)
    hs = F.transform(sh, lambda s: _hash_expr(s, portable))
    sigs = [
        F.array_min(
            F.transform(
                hs, lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(MERSENNE61))
            )
        )
        for a, b in MINHASH_PARAMS[:n_hashes]
    ]
    return F.array(*sigs)


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over distinct-element arrays (JVM array kernels)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union == 0, F.lit(1.0)).otherwise(inter / union)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    n_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.4,
    portable: bool = True,
    verify_broadcast_max_docs: int = 10_000,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash, verified by exact
    Jaccard ≥ threshold.  Output: (id1 < id2, jaccard), distinct.

    Candidate generation is a self-equi-join on (band_idx, band_signature)
    — Catalyst shuffles on the bucket key; rows only meet if a whole band
    matches.  On low-diversity corpora (boilerplate, tiny vocabularies) a
    band bucket can hold a large fraction of the corpus, making the
    candidate set quadratic in the bucket — the verify stage therefore
    operates on the 60-bit GRAM HASHES (one int64 array per doc) rather
    than the shingle strings: |A∩B| and |A∪B| over hashes equal the
    string-set sizes as long as the hash is injective on the corpus gram
    set (the same md5-60 the band keys are already built from; a cross-doc
    collision has probability ≈ |grams|²/2⁶¹), halve the bytes attached to
    every candidate pair, and intersect int64s instead of strings —
    measured 77 s → 22 s on a ×4 hot-bucket corpus, same output.  Up to
    ``verify_broadcast_max_docs`` the hash table broadcasts (verify joins
    become shuffle-free; the candidate stream spreads round-robin), above
    it the attach stays a shuffle join — scale-safe."""
    rows = bands
    assert n_hashes % bands == 0
    r = n_hashes // bands
    npart = df.sparkSession.sparkContext.defaultParallelism

    # Fused broadcast tier (r6, guide §2.4/§4.2): below the broadcast cap
    # (probed with a cheap limit+count) the gram-hash table fits driver-
    # side — it was already being broadcast for the attach joins — so the
    # per-gram hashing runs as C-speed hashlib in an Arrow stage, the 16
    # signature mins are one vectorized numpy pass, and everything after
    # the (still distributed) band join fuses into a single Arrow verify
    # stage.  Portable mode only: the fused kernel replicates the md5-60
    # hash bit-for-bit (the same ``simhash60_py`` construction the tests
    # pin); the xxhash64 fast mode has no Python twin.
    if (
        portable
        and verify_broadcast_max_docs
        and isinstance(
            df.schema[id_col].dataType,
            (T.LongType, T.IntegerType, T.ShortType, T.ByteType),
        )
        and df.limit(verify_broadcast_max_docs + 1).count()
        <= verify_broadcast_max_docs
    ):
        return _fused_minhash_pairs(
            df, text_col, id_col, k, n_hashes, bands, threshold, npart
        )

    sh = shingles(F.col(text_col), k)
    # Two materialization boundaries: (1) hash each shingle ONCE (md5 is the
    # expensive part — projection collapse would inline it into all 16 sig
    # exprs, a 16× blow-up), (2) the hash table feeds BOTH join sides.
    # Repartition first: a small doc table reads as 1-2 splits and would
    # run the whole hash/signature stage on as many cores (measured 5-10×
    # on the bench fixture); at 100 TB the source is already wide.
    hashed = df.repartition(npart, F.col(id_col)).select(
        F.col(id_col).alias("_id"),
        F.transform(sh, lambda s: _hash_expr(s, portable)).alias("_hv"),
    ).persist()
    def _mk(a: int, b: int):
        # closure (not default-arg lambda): PySpark reads lambda arity
        return lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(MERSENNE61))

    sigs = [
        F.array_min(F.transform(F.col("_hv"), _mk(a, b)))
        for a, b in MINHASH_PARAMS[:n_hashes]
    ]
    # Persist the signature table too (id + 16 longs — tiny): banded left
    # and right both derive from it, and the interpreted array_min/transform
    # HOFs would otherwise re-evaluate per join side (measured 2.5×).
    base = hashed.select("_id", F.array(*sigs).alias("_sig")).persist()
    # The banded exchange carries ONLY (id, band, band-signature): the full
    # hash arrays never ride the candidate shuffle — they are joined
    # back by doc id for the verify stage.  At 100 TB the gram table is
    # orders of magnitude wider than the id+key stream; shipping it through
    # the band join would dominate the shuffle (VERDICT r1 #10).
    banded = base.select(
        "_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(rows - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.slice(F.col("_sig"), b * r + 1, r).alias("bsig"),
                ),
            )
        ).alias("bk"),
    ).select("_id", F.col("bk.band").alias("band"), F.col("bk.bsig").alias("bsig"))
    left = banded.select(F.col("_id").alias("id1"), "band", "bsig")
    right = banded.select(F.col("_id").alias("id2"), "band", "bsig")
    n_docs = hashed.count()  # materializes the cache; sizes the attach

    cand = (
        left.join(right, on=["band", "bsig"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .dropDuplicates(["id1", "id2"])
    )
    g1 = hashed.select(F.col("_id").alias("id1"), F.col("_hv").alias("_h1"))
    g2 = hashed.select(F.col("_id").alias("id2"), F.col("_hv").alias("_h2"))
    if n_docs <= verify_broadcast_max_docs:
        # broadcast attach for small corpora with non-integral ids (the
        # fused tier above handles the integral-id case)
        cand = cand.repartition(npart)
        g1, g2 = F.broadcast(g1), F.broadcast(g2)
    # single-intersect projection: |A∪B| = n1 + n2 − |A∩B| (identical
    # integers to the string-set sizes), one array_intersect per pair
    step = (
        cand.join(g1, on="id1")
        .join(g2, on="id2")
        .select(
            "id1", "id2",
            F.size(F.array_intersect(F.col("_h1"), F.col("_h2"))).alias("_ni"),
            F.size("_h1").alias("_n1"), F.size("_h2").alias("_n2"),
        )
    )
    union = F.col("_n1") + F.col("_n2") - F.col("_ni")
    out = (
        step.withColumn(
            "jaccard",
            F.when(union == 0, F.lit(1.0)).otherwise(
                F.col("_ni").cast("double") / union.cast("double")
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )
    # Verified pairs are tiny (≤ true-dup count): materialize eagerly so the
    # hash/signature caches can be dropped instead of leaking into a
    # long-lived session (the knn_query localCheckpoint+unpersist pattern).
    try:
        return out.localCheckpoint()
    finally:
        base.unpersist()
        hashed.unpersist()


def _fused_minhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    n_hashes: int,
    bands: int,
    threshold: float,
    npart: int,
) -> DataFrame:
    """Broadcast tier of :func:`minhash_lsh_pairs` (portable mode,
    integral ids, corpus under the broadcast cap — the caller checks).

    Same algorithm, three execution changes (guide §2.4/§4.2):

    * per-gram md5-60 hashing runs as C-speed ``hashlib`` inside one
      Arrow stage (the Column form pays an interpreted HOF per gram —
      measured ~1.5 s of the operator at sf0.1 for 1.45M grams);
    * the 16 signature mins are one vectorized numpy ``minimum.reduceat``
      pass over the flattened hash stream, and the banded key table is
      created from the driver (it is broadcast-scale by the tier
      precondition) — candidates still come from the DISTRIBUTED
      (band, band-signature) equi-join, the operator's scale shape;
    * the join output flows into a single Arrow verify stage that keeps
      each pair only in its first matching band (no dropDuplicates
      exchange) and computes exact Jaccard on the sorted hash arrays.

    Hash values are bit-identical to the Column path (same md5-60, same
    (a·h+b) mod M61 in int64 — products stay below 2^63 for 60-bit
    hashes), so candidates, kept pairs and jaccard doubles all match the
    join-based tier exactly (pinned by the tier-equivalence pytest)."""
    import hashlib

    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    r = n_hashes // bands

    def work_hash(batches):
        for pdf in batches:
            ids, hvs = [], []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                s = txt
                grams = (
                    {s}
                    if len(s) < k
                    else {s[i : i + k] for i in range(len(s) - k + 1)}
                )
                hv = np.fromiter(
                    (
                        int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
                        for g in grams
                    ),
                    dtype=np.int64,
                    count=len(grams),
                )
                ids.append(did)
                hvs.append(hv)
            yield pd.DataFrame({"_id": ids, "_hv": hvs})

    hpdf = (
        df.repartition(npart, F.col(id_col))
        .select(id_col, text_col)
        .mapInPandas(work_hash, "_id long, _hv array<long>")
        .toPandas()
        .sort_values("_id")
        .reset_index(drop=True)
    )
    ids_a = hpdf["_id"].to_numpy(dtype=np.int64)
    hv_raw = [np.asarray(v, dtype=np.int64) for v in hpdf["_hv"]]
    n = len(ids_a)
    if n == 0:
        return spark.createDataFrame(
            [], "id1 long, id2 long, jaccard double"
        ).localCheckpoint()
    flat = np.concatenate(hv_raw)
    lens = np.fromiter((a.size for a in hv_raw), dtype=np.int64, count=n)
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    SIG = np.empty((n, n_hashes), dtype=np.int64)
    for j, (a, b) in enumerate(MINHASH_PARAMS[:n_hashes]):
        SIG[:, j] = np.minimum.reduceat(
            (flat * np.int64(a) + np.int64(b)) % np.int64(MERSENNE61), offsets
        )
    S3 = SIG.reshape(n, bands, r)
    hv_sorted = [np.sort(a) for a in hv_raw]

    banded_pdf = pd.DataFrame(
        {
            "_id": np.repeat(ids_a, bands),
            "band": np.tile(np.arange(bands, dtype=np.int32), n),
            "bsig": [S3[i, b] for i in range(n) for b in range(bands)],
        }
    )
    banded = spark.createDataFrame(banded_pdf)
    left = banded.select(F.col("_id").alias("id1"), "band", "bsig")
    right = banded.select(F.col("_id").alias("id2"), "band", "bsig")
    cand = (
        left.join(right, on=["band", "bsig"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "band")
    )

    bc = spark.sparkContext.broadcast((ids_a, hv_sorted, S3))
    thr = float(threshold)

    def work_verify(batches):
        ids_b, hv_b, SIG_b = bc.value
        idx = {int(v): kk for kk, v in enumerate(ids_b)}
        for pdf in batches:
            if not len(pdf):
                continue
            i = np.array([idx[int(v)] for v in pdf["id1"]], dtype=np.int64)
            j = np.array([idx[int(v)] for v in pdf["id2"]], dtype=np.int64)
            band = pdf["band"].to_numpy(dtype=np.int64)
            eq = (SIG_b[i] == SIG_b[j]).all(axis=2)  # (m, bands)
            keep = eq.argmax(axis=1) == band
            i, j = i[keep], j[keep]
            out_i, out_j, out_jac = [], [], []
            for ii, jj in zip(i, j):
                a_, b_ = hv_b[ii], hv_b[jj]
                ni = np.intersect1d(a_, b_, assume_unique=True).size
                union = a_.size + b_.size - ni
                jac = 1.0 if union == 0 else float(ni) / float(union)
                if jac >= thr:
                    out_i.append(ids_b[ii])
                    out_j.append(ids_b[jj])
                    out_jac.append(jac)
            yield pd.DataFrame(
                {"id1": out_i, "id2": out_j, "jaccard": out_jac},
            ).astype({"id1": "int64", "id2": "int64", "jaccard": "float64"})

    id_t = df.schema[id_col].dataType.simpleString()
    out = cand.mapInPandas(work_verify, f"id1 {id_t}, id2 {id_t}, jaccard double")
    try:
        return out.localCheckpoint()
    finally:
        bc.unpersist()


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    threshold: float = 0.4,
) -> DataFrame:
    """Brute-force n-gram Jaccard pairs (the oracle-shaped baseline —
    quadratic; for small dims or verification only)."""
    sh = shingles(F.col(text_col), k)
    base = df.select(F.col(id_col).alias("_id"), sh.alias("_sh"))
    a = base.select(F.col("_id").alias("id1"), F.col("_sh").alias("sh1"))
    b = base.select(F.col("_id").alias("id2"), F.col("_sh").alias("sh2"))
    return (
        a.crossJoin(b)
        .filter(F.col("id1") < F.col("id2"))
        .withColumn("jaccard", jaccard(F.col("sh1"), F.col("sh2")))
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "id1",
    b_col: str = "id2",
    max_iter: int = 20,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """Dedup GROUPS from near-dup pairs: connected components by iterative
    min-label propagation (the standard distributed CC — each round every
    node adopts the smallest label in its closed neighborhood; rounds
    needed = graph diameter, which for near-dup clusters is tiny).

    Output: (doc_id, component_id) for every node appearing in ``pairs``,
    ``component_id`` = smallest doc id in the component — the canonical
    "keep" document.  Driver only checks a per-round convergence count;
    all data movement is joins/groupBys on the id key.

    Raises ``RuntimeError`` when the propagation has NOT converged after
    ``max_iter`` rounds (graph diameter > max_iter): an unconverged
    labeling silently splits components, corrupting dedup groups — a loud
    failure is the only safe exit (raise the bound for long chain-shaped
    duplicate graphs).

    **Two-tier plan**: near-dup pair sets are usually orders of magnitude
    smaller than the corpus (they are the verified duplicates).  Below
    ``driver_threshold`` edges the graph is broadcast-scale and the
    optimal plan is a driver-side union-find — O(E·α) in one collect, no
    iteration, exact — the same class of driver-side metadata work as the
    manifest descent.  Above it, the distributed min-label propagation
    runs (rounds = graph diameter).  Set ``driver_threshold=0`` to force
    the distributed path.
    """
    if driver_threshold > 0:
        # size probe first: a limit+count ships NOTHING to the driver, so
        # an over-threshold graph never materializes driver_threshold rows
        # driver-side just to be discarded
        n_edges = pairs.select(a_col).limit(driver_threshold + 1).count()
        head = None
        if n_edges <= driver_threshold:
            # limit(threshold + 1) on the collect: the probe and the
            # collect are two separate jobs, and for an uncached
            # nondeterministic pairs plan the second job recomputes — a
            # drifted plan must neither pull unbounded rows onto the
            # driver (ADVICE r4) nor be silently TRUNCATED to the limit
            # (ADVICE r5 #4: components over a truncated edge list are
            # wrong with no error).  The +1 head makes truncation
            # detectable: len(head) > threshold ⇒ the recomputed pair set
            # drifted past the probe — fall through to the distributed
            # path, which is correct at any size.  For the deterministic/
            # checkpointed plans all callers pass, the limit is a no-op.
            head = pairs.select(a_col, b_col).limit(
                driver_threshold + 1
            ).collect()
        if head is not None and len(head) <= driver_threshold:
            parent: dict = {}

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]  # path halving
                    x = parent[x]
                return x

            for r in head:
                a, b = r[0], r[1]
                parent.setdefault(a, a)
                parent.setdefault(b, b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    # union by smaller label → component id = min id
                    if rb < ra:
                        ra, rb = rb, ra
                    parent[rb] = ra
            out_rows = [(n, find(n)) for n in parent]
            # schema follows the INPUT id type (string doc ids work on the
            # distributed path; the driver path must not force long)
            id_type = pairs.schema[a_col].dataType
            schema = T.StructType([
                T.StructField("doc_id", id_type, False),
                T.StructField("component_id", id_type, False),
            ])
            return pairs.sparkSession.createDataFrame(out_rows, schema)

    edges = (
        pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .union(pairs.select(F.col(b_col).alias("a"), F.col(a_col).alias("b")))
        .distinct()
        .persist()
    )
    # localCheckpoint (not persist) per round: it truncates LINEAGE, so the
    # logical plan stays one-join deep regardless of round count — with
    # plain persist the nested join plans grow with the iteration number
    # and long chains OOM the driver on plan stringification alone.
    labels = edges.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    ).localCheckpoint()
    try:
        changed = -1
        for _ in range(max_iter):
            nbr_min = (
                edges.join(
                    labels.withColumnRenamed("node", "b2"),
                    edges["b"] == F.col("b2"),
                )
                .groupBy("a")
                .agg(F.min("label").alias("nbr_label"))
            )
            new_labels = (
                labels.join(nbr_min, labels["node"] == nbr_min["a"], "left")
                .select(
                    "node",
                    F.least(
                        F.col("label"), F.coalesce("nbr_label", "label")
                    ).alias("label"),
                )
                .localCheckpoint()
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), on="node")
                .filter(F.col("n.label") != F.col("o.label"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
        if changed != 0:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} "
                f"rounds ({changed} labels still changing — graph diameter "
                f"exceeds max_iter); raise max_iter"
            )
        return labels.select(
            F.col("node").alias("doc_id"), F.col("label").alias("component_id")
        )
    finally:
        edges.unpersist()


def dedup_groups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.4,
    **minhash_kwargs,
) -> DataFrame:
    """Near-dup GROUPS over a document table: minhash-LSH pairs →
    connected components → (doc_id, component_id).  The end-to-end
    web-scale dedup primitive (keep one doc per component)."""
    pairs = minhash_lsh_pairs(
        df, text_col=text_col, id_col=id_col, threshold=threshold,
        **minhash_kwargs,
    )
    return connected_components(pairs)


def simhash60_py(text: str, k: int = 8) -> int:
    """Reference SimHash (60-bit, md5-derived shingle hashes) — the single
    source of truth shared by the Spark UDF and the pytest oracle."""
    import hashlib

    import numpy as np

    if len(text) < k:
        grams = {text}
    else:
        grams = {text[i : i + k] for i in range(len(text) - k + 1)}
    hs = np.array(
        [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams],
        dtype=np.uint64,
    )
    bits = (hs[:, None] >> np.arange(60, dtype=np.uint64)) & np.uint64(1)
    votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    sig = np.uint64(0)
    for b in np.nonzero(votes > 0)[0]:
        sig |= np.uint64(1) << np.uint64(b)
    return int(sig)


def _simhash_vote_udf():
    """Vectorized 60-bit majority vote over per-doc hash ARRAYS.

    Pure numpy over the whole Arrow batch: hashes are flattened once, each
    bit plane is a single shift+mask pass with a ``np.add.reduceat`` per-doc
    segment sum — Python never iterates rows, never touches strings or md5
    (that happens JVM-side in :func:`simhash60`).  60 passes over a flat
    int64 array ≈ memory-bandwidth cost, no (n_hashes × 60) bit matrix is
    ever materialized."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _vote(hv):  # type: ignore[no-untyped-def]
        import numpy as np
        import pandas as pd

        n = len(hv)
        if n == 0:
            return pd.Series([], dtype="int64")
        lens = np.fromiter((len(a) for a in hv), dtype=np.int64, count=n)
        # shingles() never yields an empty array (short texts → [text])
        flat = np.concatenate([np.asarray(a, dtype=np.uint64) for a in hv])
        offsets = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        sig = np.zeros(n, dtype=np.uint64)
        for b in range(60):
            ones = np.add.reduceat(
                (flat >> np.uint64(b)) & np.uint64(1), offsets
            )
            # majority: votes_b > 0  ⟺  2·ones_b > n_hashes
            sig |= (2 * ones > lens).astype(np.uint64) << np.uint64(b)
        return pd.Series(sig.astype(np.int64))

    return _vote


def simhash60(col, k: int = 8) -> Column:
    """60-bit SimHash, split at the honest UDF boundary (VERDICT r2 #1):

    * shingle hashing — the per-byte cost — is the ``h60`` Column
      expression (JVM codegen md5 per DISTINCT gram, computed ONCE; exactly
      how minhash hashes its grams);
    * only the 60-bit majority VOTE crosses into Python, as a vectorized
      numpy pandas UDF over the hash *array* (:func:`_simhash_vote_udf`).

    A per-bit sign-sum as a Column expression would replicate the
    shingle-hash array 60× in the plan (interpreted HOFs re-evaluate per
    reference), and hashing in Python was a per-row md5 loop — this split
    keeps both stages at their native speed.  Values are bit-identical to
    :func:`simhash60_py` (same md5-derived hashes, same majority rule)."""
    c = col if isinstance(col, Column) else F.col(col)
    hv = F.transform(shingles(c, k), h60)
    return _simhash_vote_udf()(hv)


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures (bit_count ^)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_blocks(max_hamming: int, sig_bits: int = 60) -> list[tuple[int, int]]:
    """(offset, width) of the ``max_hamming + 1`` contiguous bit blocks.

    Pigeonhole: a pair differing in ≤ h bits cannot touch all h+1 blocks,
    so it matches at least one block key exactly — blocking is LOSSLESS
    (recall 1.0 by construction, the Manku/Charikar multi-table scheme with
    the minimal table count)."""
    n_blocks = max_hamming + 1
    base, extra = divmod(sig_bits, n_blocks)
    widths = [base + (1 if i < extra else 0) for i in range(n_blocks)]
    offs, acc = [], 0
    for w in widths:
        offs.append((acc, w))
        acc += w
    return offs


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
) -> DataFrame:
    """SimHash near-dup pairs with **lossless multi-block blocking**: the
    60-bit signature splits into ``max_hamming + 1`` blocks; candidates are
    the union over blocks of exact block-key matches (equi-join shuffle per
    block — same OR-of-bands shape as minhash), verified by exact Hamming.

    By pigeonhole the candidate set contains EVERY pair with Hamming ≤
    max_hamming, so the result equals the brute-force pair set — which is
    exactly what the DuckDB oracle computes.  Selectivity: block width
    ``60/(h+1)`` bits → ``2^(60/(h+1))`` buckets per table; production
    configs keep h ≤ 8 (h=3 → 4 blocks of 15 bits is the classic web-dedup
    setting)."""
    sig = simhash60(F.col(text_col))
    # persist: the pandas-UDF signature feeds both join sides; repartition
    # so the Arrow-batched UDF uses every core even on a 1-split source
    npart = df.sparkSession.sparkContext.defaultParallelism
    base = df.repartition(npart, F.col(id_col)).select(
        F.col(id_col).alias("_id"), sig.alias("_sig")
    ).persist()
    keys = F.array(
        *[
            F.struct(
                F.lit(i).alias("blk"),
                F.shiftright("_sig", off)
                .bitwiseAND(F.lit((1 << w) - 1))
                .alias("val"),
            )
            for i, (off, w) in enumerate(simhash_blocks(max_hamming))
        ]
    )
    blocked = base.select(
        "_id", "_sig", F.explode(keys).alias("bk")
    ).select(
        "_id", "_sig", F.col("bk.blk").alias("blk"), F.col("bk.val").alias("val")
    )
    a = blocked.select(
        F.col("_id").alias("id1"), F.col("_sig").alias("s1"), "blk", "val"
    )
    b = blocked.select(
        F.col("_id").alias("id2"), F.col("_sig").alias("s2"), "blk", "val"
    )
    # First-match-block dedup (r6, guide §2.4): a pair appears in the join
    # once per matching block; both signatures ride the row, so "is this
    # the pair's FIRST matching block?" is a per-row codegen expression —
    # the dropDuplicates exchange over the (quadratic-ish) candidate
    # stream disappears and the join output flows straight into the
    # Hamming verify (measured: the dedup exchange was the largest single
    # cost of the operator at sf0.1).  Exactly one instance per pair
    # survives, so the result set is unchanged.
    def _bval(sig: Column, off: int, w: int) -> Column:
        return F.shiftright(sig, off).bitwiseAND(F.lit((1 << w) - 1))

    first_match = None
    for i, (off, w) in enumerate(simhash_blocks(max_hamming)):
        eq = _bval(F.col("s1"), off, w) == _bval(F.col("s2"), off, w)
        first_match = (
            F.when(eq, F.lit(i)) if first_match is None
            else first_match.when(eq, F.lit(i))
        )
    out = (
        a.join(b, on=["blk", "val"])
        .filter(F.col("id1") < F.col("id2"))
        .filter(F.col("blk") == first_match)
        .withColumn("hamming", hamming64(F.col("s1"), F.col("s2")).cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id1", "id2", "hamming")
    )
    # eager materialize + drop the signature cache (session cache hygiene)
    try:
        return out.localCheckpoint()
    finally:
        base.unpersist()
