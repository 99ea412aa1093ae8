"""Set-similarity self-join with prefix filtering (PPJoin-style, lossless).

For Jaccard(A,B) >= t, A and B must share at least one element among their
*prefixes* of length |S| - ceil(t*|S|) + 1 when both sets are ordered by a
global total order (classic prefix-filtering result; rarest-first ordering
maximizes selectivity). The full inverted-index join indexes every element;
prefix filtering indexes only the prefixes and adds the size-ratio bound
t*|A| <= |B|, shrinking the candidate set by orders of magnitude on
boilerplate-heavy corpora — then candidates are verified EXACTLY with
integer intersection sizes, so the output is identical to the naive join.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def jaccard_pairs_prefix(
    grams_df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    grams_col: str = "grams",
    eager: bool = True,
    max_gram_df: int | None = None,
    observation=None,
) -> DataFrame:
    """grams_df: (id, array<string> distinct grams). Returns
    (a_id, b_id, inter_size, union_size) for pairs with
    inter/union >= threshold — byte-identical to the naive all-pairs join.

    ``eager=True`` (default) materializes the qualifying pairs via
    localCheckpoint and releases the cached gram arrays immediately — right
    when the threshold keeps the output near-linear (the operator's intended
    regime) and callers consume the result. ``eager=False`` keeps the plan
    lazy for composition (e.g. a downstream ``.limit``) at the cost of the
    gram cache staying pinned until the session drops it.

    ``max_gram_df`` (default OFF — parity/lossless by default, matching the
    repo's cap convention): drop grams whose document frequency exceeds the
    cap from the candidate index, like stopwords. A boilerplate gram shared
    by d documents fans out to d^2/2 candidate pairs in the prefix join —
    the quadratic hot spot on stopword-heavy corpora; capping bounds it at
    cap^2/2 per gram. Verification is untouched (exact intersection over the
    FULL gram arrays), so capping can only lose candidate recall, never emit
    a false pair. Observable, never silent: pass a
    ``pyspark.sql.Observation`` to read ``n_hot_grams`` /
    ``n_hot_postings`` after an action."""
    # persisted: consumed by the postings index AND both sides of the
    # verification join — without it the gram arrays are recomputed 3x.
    # The sz>0 filter sits ON TOP of the cache, not inside it: below the
    # persist, Catalyst pushes it under the caller's repartition exchange
    # and inlines the whole gram expression into a per-row scan Filter —
    # where the tokenizing split() is re-evaluated inside EVERY element_at
    # of the ngram lambda (measured 6.1 s vs 1.2 s for the sf0.1 gram
    # build; same pathology class as the fingerprint-cache note in
    # minhash_dedup). Against the cache it is a trivial predicate on the
    # materialized sz column.
    cache = grams_df.select(
        F.col(id_col), F.col(grams_col), F.size(grams_col).cast("bigint").alias("sz")
    ).persist()
    sized = cache.where(F.col("sz") > 0)

    # Candidate generation runs on xxhash64 GRAM KEYS, not strings: the
    # postings index / df ranking / prefix join shuffle and sort 8-byte
    # longs instead of ~20-byte grams. The hash applies AFTER the explode —
    # one scalar xxhash64 per posting inside the same codegen stage, no
    # per-doc array transform (an earlier array_distinct(transform(...))
    # form re-materialized hashed arrays on both postings consumers and
    # measured ~20% SLOWER than plain strings at sf0.1). STILL LOSSLESS:
    # prefix length and the size-ratio bound use the STRING set size ``sz``;
    # an intra-doc hash collision (~2^-64) duplicates a posting key, which
    # can only lengthen the retained prefix — a candidate SUPERSET either
    # way — and verification below is exact integer intersection over the
    # original string arrays, so a false pair can never be emitted.
    postings = sized.select(
        F.col(id_col), F.col("sz"), F.explode(grams_col).alias("__g__")
    ).select(F.col(id_col), F.col("sz"), F.xxhash64("__g__").alias("gram"))
    freq = postings.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    if max_gram_df is not None:
        flagged = freq.withColumn("__hot__", F.col("df") > max_gram_df)
        if observation is not None:
            flagged = flagged.observe(
                observation,
                F.coalesce(F.sum(F.col("__hot__").cast("long")), F.lit(0)).alias(
                    "n_hot_grams"
                ),
                F.coalesce(
                    F.sum(F.when(F.col("__hot__"), F.col("df")).otherwise(0)),
                    F.lit(0),
                ).alias("n_hot_postings"),
            )
        # hot grams leave the index BEFORE prefix ranking: surviving grams
        # move up in rarest-first rank, so every doc still indexes a full
        # prefix of its remaining grams (maximal retained candidate power)
        freq = flagged.where(~F.col("__hot__")).drop("__hot__")
    ranked = postings.join(freq, "gram").withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy(id_col).orderBy(F.asc("df"), F.asc("gram"))
        ),
    )
    # prefix length = sz - ceil(t*sz) + 1
    prefix = ranked.where(
        F.col("rn") <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
    )

    a = prefix.select(
        F.col("gram"), F.col(id_col).alias("a_id"), F.col("sz").alias("sza")
    )
    b = prefix.select(
        F.col("gram"), F.col(id_col).alias("b_id"), F.col("sz").alias("szb")
    )
    cand = (
        a.join(b, "gram")
        .where(F.col("a_id") < F.col("b_id"))
        # size-ratio bound: t*max(|A|,|B|) <= min(|A|,|B|)
        .where(
            F.least("sza", "szb")
            >= F.ceil(F.lit(threshold) * F.greatest("sza", "szb"))
        )
        .select("a_id", "b_id")
        .distinct()
    )

    ga = sized.select(F.col(id_col).alias("a_id"), F.col(grams_col).alias("ga"),
                      F.col("sz").alias("sza"))
    gb = sized.select(F.col(id_col).alias("b_id"), F.col(grams_col).alias("gb"),
                      F.col("sz").alias("szb"))
    inter = F.size(F.array_intersect("ga", "gb")).cast("bigint")
    t_num, t_den = _as_fraction(threshold)
    result = (
        cand.join(ga, "a_id")
        .join(gb, "b_id")
        .withColumn("inter_size", inter)
        .withColumn("union_size", F.col("sza") + F.col("szb") - F.col("inter_size"))
        # exact integer comparison: inter/union >= t_num/t_den
        .where(F.col("inter_size") * t_den >= F.col("union_size") * t_num)
        .select("a_id", "b_id", "inter_size", "union_size")
    )
    # materialize (the qualifying-pair output is small by construction:
    # near-dup pairs only), then release the cached gram arrays — a long
    # session would otherwise accumulate one pinned `sized` per call
    if eager:
        result = result.localCheckpoint(eager=True)
        cache.unpersist()
    return result


def _as_fraction(threshold: float, max_den: int = 1_000_000) -> tuple[int, int]:
    from fractions import Fraction

    fr = Fraction(threshold).limit_denominator(max_den)
    return fr.numerator, fr.denominator
