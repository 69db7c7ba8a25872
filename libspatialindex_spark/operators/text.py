"""Text-analysis operators for training-data pipelines.

Beyond the reference's operator set (SURVEY.md §2.6 — the reference has no
scalar functions at all): language-ID heuristic, quality scoring, token
counting, and document fingerprinting over a ``documents(text)`` table.

Everything is a pure Column expression (JVM-side regex/string kernels, no
Python).  Each function is *portably defined* — the same arithmetic can be
written in ANSI SQL for DuckDB — so the driver's differential oracle can
check it bit-for-bit.  ``H60`` is the shared portable 60-bit string hash:
``int(md5(s)[:15], 16)``, positive, identical in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def h60(col) -> Column:
    """Portable 60-bit string hash: first 15 hex chars of md5 as an int.

    Spark: ``conv(substr(md5(s),1,15),16,10)``; DuckDB:
    ``CAST('0x' || substr(md5(s),1,15) AS BIGINT)`` — same value."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.conv(F.substring(F.md5(c.cast("binary")), 1, 15), 16, 10).cast(
        "long"
    )


def token_count(col) -> Column:
    """Whitespace token count: number of maximal non-space runs."""
    c = col if isinstance(col, Column) else F.col(col)
    collapsed = F.regexp_replace(c, "[^ ]+", "w")
    return (
        F.length(collapsed) - F.length(F.regexp_replace(collapsed, "w", ""))
    ).cast("long")


BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"  # identical in Java regex and RE2
BPE_CHARS_PER_TOKEN = 4.0  # the classic ~4-chars/token BPE estimate


def token_count_bpe(col) -> Column:
    """BPE-ish token estimate: lex into GPT-style pieces (letter runs /
    digit runs / single punctuation) with a regex whose semantics match in
    Java regex (Spark) and RE2 (DuckDB), then charge ``ceil(len/4)``
    subword tokens per piece — the standard chars-per-token heuristic.
    Pure Column expressions (regexp_extract_all + array fold)."""
    c = col if isinstance(col, Column) else F.col(col)
    toks = F.regexp_extract_all(c, F.lit(BPE_PATTERN), F.lit(0))
    per = F.transform(
        toks,
        lambda t: F.ceil(
            F.length(t).cast("double") / F.lit(BPE_CHARS_PER_TOKEN)
        ).cast("long"),
    )
    return F.aggregate(per, F.lit(0).cast("long"), lambda acc, x: acc + x)


def occurrences(col, needle: str) -> Column:
    """Non-overlapping occurrence count of ``needle`` (replace trick —
    portable, no regex escaping pitfalls)."""
    c = col if isinstance(col, Column) else F.col(col)
    return (
        (F.length(c) - F.length(F.replace(c, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def quality_features(col) -> dict[str, Column]:
    """Deterministic quality features: lengths, ratios, stopword density."""
    c = col if isinstance(col, Column) else F.col(col)
    n_chars = F.length(c).cast("long")
    n_spaces = occurrences(c, " ")
    n_tokens = token_count(c)
    stop = (
        occurrences(c, " the ")
        + occurrences(c, " and ")
        + occurrences(c, " of ")
        + occurrences(c, " a ")
    )
    mean_word_len = (n_chars - n_spaces).cast("double") / F.greatest(
        n_tokens, F.lit(1)
    ).cast("double")
    stop_density = stop.cast("double") / F.greatest(n_tokens, F.lit(1)).cast(
        "double"
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_word_len": mean_word_len,
        "stopword_density": stop_density,
    }


# language → marker words (space-delimited probes; deterministic heuristic)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is"),
    "de": ("der", "und", "die", "ist"),
    "fr": ("le", "la", "et", "est"),
    "es": ("el", "los", "y", "es"),
}


def lang_scores(col) -> dict[str, Column]:
    c = col if isinstance(col, Column) else F.col(col)
    padded = F.concat(F.lit(" "), c, F.lit(" "))
    return {
        lang: sum(
            (occurrences(padded, f" {w} ") for w in words), F.lit(0).cast("long")
        )
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(col) -> Column:
    """Argmax language with deterministic alphabetical tie-break, 'und'
    when no marker hits."""
    scores = lang_scores(col)
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # reverse-alphabetical chain so earlier alphabet wins ties
    for lang in sorted(scores, reverse=True):
        out = F.when(
            (scores[lang] > 0) & (scores[lang] == best), F.lit(lang)
        ).otherwise(out)
    return out


def fingerprint(col) -> Column:
    """60-bit document fingerprint (portable md5-derived)."""
    return h60(col)


def winnow_fingerprint(col, k: int = 8, s: int = 8) -> Column:
    """Rolling-hash document fingerprint: the ``s`` smallest hashes over
    the document's k-gram stream (bottom-k sketch / winnowing family —
    robust to local edits, supports containment estimation by sketch
    intersection).  The k-gram hash is the same portable ``h60`` the
    minhash pipeline uses; pure Column expressions (sort + slice of the
    distinct-gram hash array)."""
    from libspatialindex_spark.operators.dedup import shingles

    c = col if isinstance(col, Column) else F.col(col)
    hv = F.transform(shingles(c, k), h60)
    return F.slice(F.array_sort(hv), 1, s)
