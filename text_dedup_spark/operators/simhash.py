"""SimHash Hamming-bucket near-duplicate pipeline, Spark-first.

Re-expresses reference ``src/text_dedup/simhash.py``:

    df -> pandas UDF (tokenize+shingle+bit-vote fingerprint + P(b,b-k)
          permutation bucket keys) -> explode(keys)
       -> self-join per bucket with JVM-side popcount filter
          (bit_count(sig1 ^ sig2) <= bit_diff)
       -> shared large-star/small-star CC
       -> assign -> optional Jaccard verification -> filter

Semantics notes (SURVEY.md §7.6):
- the reference's driver-sequential bucket scan (``simhash.py:43-71``,
  the 626 s hotspot in its README) compares each record to ALL earlier
  records in its bucket — i.e. all pairs within a bucket — so a
  groupBy-bucket all-pairs join reproduces the identical union graph,
  order-free, and distributes it;
- the final filter keeps ``NOT __duplicate__`` using the *initial* flag
  even when FP-verification reassigns clusters — reference quirk
  (``simhash.py:176-186``), replicated;
- FP check builds a FRESH union-find over verified pairs (unlike minhash
  which regroups by old cluster) — reference ``simhash.py:93-173``.

Scale: fingerprints are stored as longs (two longs for f=128) so the
Hamming filter runs inside whole-stage codegen (``bit_count(a ^ b)``), not
Python. Hot buckets (boilerplate pages share all-zero or common prefixes)
are the skew risk — the bucket self-join is AQE-skew-split, and
``max_bucket_size`` caps pathological buckets with an observable count
(never a silent drop).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    LongType,
    StructField,
    StructType,
)

from text_dedup_spark.kernels.simhash_kernel import SimHashKernel
from text_dedup_spark.operators.connected_components import connected_components
from text_dedup_spark.operators.ids import CLUSTER_COL, DUPLICATE_COL, INDEX_COL
from text_dedup_spark.operators.minhash import gram_set_udf, jaccard_ge_expr


@dataclass
class SimHashDedupResult:
    docs: DataFrame
    kept: DataFrame
    clusters: DataFrame


_EMBED_SCHEMA = StructType(
    [
        StructField("sig_hi", LongType()),  # bits f-1..64 (0 when f=64)
        StructField("sig_lo", LongType()),  # bits 63..0, reinterpreted signed
        StructField("keys", ArrayType(BinaryType())),  # mask||maskedval per table
    ]
)


def _embed_udf(kernel: SimHashKernel):
    @F.pandas_udf(_EMBED_SCHEMA)
    def embed(texts: pd.Series) -> pd.DataFrame:
        m64 = (1 << 64) - 1
        his, los, keys_col = [], [], []
        for sig_bytes, keys in kernel.embed_batch(list(texts)):
            sig = int.from_bytes(sig_bytes, "big")
            lo = sig & m64
            hi = (sig >> 64) & m64
            # reinterpret as signed 64-bit for LongType
            los.append(lo - (1 << 64) if lo >= (1 << 63) else lo)
            his.append(hi - (1 << 64) if hi >= (1 << 63) else hi)
            keys_col.append([mask + val for mask, val in keys])
        return pd.DataFrame({"sig_hi": his, "sig_lo": los, "keys": keys_col})

    return embed


def simhash_embed(
    df: DataFrame, kernel: SimHashKernel, text_col: str = "text"
) -> DataFrame:
    """-> df + __E__ struct (sig_hi, sig_lo, keys array). Kept separate from
    the explode so callers can cache THIS frame: a Generate directly above
    the pandas UDF makes Catalyst infer a size(keys)>0 filter and split the
    UDF into two ArrowEvalPython evaluations (filter + rematerialize) —
    caching the embed output first keeps the expensive UDF at one pass and
    shrinks the cache to one row per doc instead of one per permutation."""
    return df.withColumn("__E__", _embed_udf(kernel)(F.col(text_col)))


def simhash_fingerprint(
    df: DataFrame, kernel: SimHashKernel, text_col: str = "text"
) -> DataFrame:
    """-> (__INDEX__, __key__, sig_hi, sig_lo), one row per permutation table
    (reference F9-F11, ``simhash.py:28-40`` + embed at config :328-380).
    explode_outer: keys arrays are never empty (one entry per permutation),
    and the non-outer Generate's inferred non-empty filter would double the
    embed UDF evaluation when the input is not already cached."""
    e = simhash_embed(df, kernel, text_col)
    return e.select(
        F.col(INDEX_COL),
        F.col("__E__.sig_hi").alias("sig_hi"),
        F.col("__E__.sig_lo").alias("sig_lo"),
        F.explode_outer("__E__.keys").alias("__key__"),
    )


def simhash_edges(
    fingerprints: DataFrame,
    bit_diff: int,
    max_bucket_size: int | None = None,
    observation=None,
    dedup: bool = True,
) -> DataFrame:
    """All-pairs-within-bucket Hamming join -> edges. JVM-side popcount.

    ``max_bucket_size`` caps pathological buckets (within-bucket pair count
    is quadratic). Via ``simhash_dedup`` the input rows are one per DISTINCT
    signature (exact-duplicate cliques are contracted upstream), so the cap
    bounds distinct near-miss signatures per bucket — identical-boilerplate
    floods never trigger it. Capping is observable, never silent: pass a
    ``pyspark.sql.Observation`` to read ``n_buckets_dropped`` /
    ``n_postings_dropped`` after an action."""
    fp = fingerprints
    if max_bucket_size is not None:
        sizes = fp.groupBy("__key__").agg(F.count(F.lit(1)).alias("__bsz__"))
        flagged = sizes.withColumn("__drop__", F.col("__bsz__") > max_bucket_size)
        if observation is not None:
            flagged = flagged.observe(
                observation,
                F.coalesce(F.sum(F.col("__drop__").cast("long")), F.lit(0)).alias(
                    "n_buckets_dropped"
                ),
                F.coalesce(
                    F.sum(F.when(F.col("__drop__"), F.col("__bsz__")).otherwise(0)),
                    F.lit(0),
                ).alias("n_postings_dropped"),
            )
        fp = fp.join(
            flagged.where(~F.col("__drop__")).select("__key__"), "__key__"
        )
    left = fp.select(
        F.col("__key__"),
        F.col(INDEX_COL).alias("id1"),
        F.col("sig_hi").alias("hi1"),
        F.col("sig_lo").alias("lo1"),
    )
    right = fp.select(
        F.col("__key__"),
        F.col(INDEX_COL).alias("id2"),
        F.col("sig_hi").alias("hi2"),
        F.col("sig_lo").alias("lo2"),
    )
    hamming = F.bit_count(F.col("lo1").bitwiseXOR(F.col("lo2"))) + F.bit_count(
        F.col("hi1").bitwiseXOR(F.col("hi2"))
    )
    out = (
        left.join(right, "__key__")
        .where(F.col("id1") < F.col("id2"))
        .where(hamming <= F.lit(bit_diff))
        .select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
    )
    # ``dedup=False`` skips the distinct exchange when the consumer is
    # duplicate-tolerant (connected_components dedups / scatter-mins its
    # input itself) — a pair sharing several permutation buckets emits one
    # edge per bucket, which changes nothing downstream (guide §2.4:
    # "a distinct on data whose consumer dedups anyway" is a pure
    # shuffle tax). Default True preserves the standalone contract.
    return out.distinct() if dedup else out


def simhash_check_false_positives(
    docs: DataFrame,
    kernel: SimHashKernel,
    jaccard_threshold: float,
    text_col: str = "text",
    max_cluster_verify: int | None = None,
    observation=None,
    contraction: str = "window",
) -> tuple[DataFrame, DataFrame]:
    """Intra-cluster pairwise Jaccard -> fresh CC over verified pairs
    (reference ``simhash.py:93-173``). __duplicate__ NOT updated.

    Identical-text contraction (lossless, mirrors
    ``minhash.check_false_positives``): within a cluster, byte-identical
    texts always verify against each other (J = 1.0 >= threshold for any
    threshold <= 1.0) and every cross-text pair's Jaccard depends only on
    the two TEXTS — so the quadratic pair join runs over one representative
    per distinct text, and the fresh CC consumes rep->member star edges
    (for text groups of size >= 2) plus the verified rep-rep pairs: the
    transitive closure is exactly the all-pairs graph's (pinned by the
    ``simhash_dedup_verified_md5`` oracle, whose SQL replays plain
    all-pairs). A 10k-member exact-duplicate cluster is ONE distinct text
    here, not 5*10^7 Jaccard pairs.

    ``max_cluster_verify`` (scale guard, default None = reference-faithful):
    clusters with more DISTINCT texts than the cap skip pairwise
    verification and keep their assignment — identical-text floods never
    trip it. Bypassed membership is observable via ``n_bypassed``, never
    silent."""
    cand = docs.where(F.col(DUPLICATE_COL)).select(INDEX_COL, text_col, CLUSTER_COL)
    # shared contraction helper — "window" (parity, one exchange) or "join"
    # (scale: partial-agg groupBy + AQE-skew join-back, worst task bounded;
    # see minhash._contract_text_groups)
    from text_dedup_spark.operators.minhash import _contract_text_groups

    # persisted (mirrors minhash.check_false_positives): cand feeds the cap
    # sizing, rep selection AND the star edges; uncached, each scan re-runs
    # the upstream assignment join + contraction. Released after new_map
    # materializes below. cand_cache keeps a handle on the PERSISTED frame:
    # `cand` is rebound under max_cluster_verify and unpersisting the
    # derived plan would silently no-op (CacheManager sameResult match).
    cand_cache = (
        _contract_text_groups(cand, text_col, contraction).drop("__tsz__").persist()
    )
    cand = cand_cache

    bypassed = None
    if max_cluster_verify is not None:
        # the cap bounds DISTINCT texts per cluster
        sizes = cand.where(F.col(INDEX_COL) == F.col("__trep__")).groupBy(
            CLUSTER_COL
        ).agg(F.count(F.lit(1)).alias("__csz__"))
        cand_all = cand.join(sizes, CLUSTER_COL)
        bypassed = cand_all.where(F.col("__csz__") > max_cluster_verify).select(
            F.col(INDEX_COL).alias("idx"), F.col(CLUSTER_COL)
        )
        bypassed = bypassed.observe(
            observation if observation is not None else "simhash_fp_bypassed",
            F.count(F.lit(1)).alias("n_bypassed"),
        )
        cand = cand_all.where(F.col("__csz__") <= max_cluster_verify).drop("__csz__")
    # one gram pass per rep, then JVM array_intersect Jaccard per pair
    # (bit-identical to the Python kernel — see jaccard_ge_expr). Persisted:
    # reps backs both sides of the pair self-join (uncached, the gram UDF
    # runs once per side). Cache only (cluster, id, grams) — the pair join
    # never reads the raw text column.
    reps = (
        cand.where(F.col(INDEX_COL) == F.col("__trep__"))
        .withColumn(
            "__G__",
            gram_set_udf(kernel.ngram_size, kernel.min_length)(F.col(text_col)),
        )
        .select(CLUSTER_COL, INDEX_COL, "__G__")
        .persist()
    )
    left = reps.select(
        F.col(CLUSTER_COL), F.col(INDEX_COL).alias("id1"), F.col("__G__").alias("g1")
    )
    right = reps.select(
        F.col(CLUSTER_COL), F.col(INDEX_COL).alias("id2"), F.col("__G__").alias("g2")
    )
    pairs = left.join(right, CLUSTER_COL).where(F.col("id1") < F.col("id2"))
    verified = pairs.where(
        jaccard_ge_expr(F.col("g1"), F.col("g2"), jaccard_threshold)
    )
    # star edges reconnect identical-text members to their rep (valid iff
    # identity satisfies the threshold, i.e. threshold <= 1.0)
    star = (
        cand.where(F.col(INDEX_COL) != F.col("__trep__")).select(
            F.col("__trep__").alias("src"), F.col(INDEX_COL).alias("dst")
        )
        if jaccard_threshold <= 1.0
        else cand.limit(0).select(
            F.col(INDEX_COL).alias("src"), F.col(INDEX_COL).alias("dst")
        )
    )
    new_map = connected_components(
        verified.select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
        .unionByName(star)
    )
    if bypassed is not None:
        # bypassed clusters keep their assignment verbatim; their min-id
        # labels can't collide with the fresh CC's labels (a bypassed
        # cluster's root is itself bypassed, so it never enters a verified
        # pair)
        new_map = new_map.unionByName(
            bypassed.select(F.col("idx").alias("id"), F.col(CLUSTER_COL).alias("cluster"))
        )
    # materialize the verified mapping once (small — verified dup docs only),
    # then release the working caches: without this, the caller's docs-action
    # AND its clusters-action would each re-run the pair join (mirrors
    # minhash.check_false_positives)
    new_map = new_map.localCheckpoint(eager=True)
    cand_cache.unpersist()
    reps.unpersist()
    reassigned = (
        docs.drop(CLUSTER_COL)
        .join(new_map.withColumnRenamed("id", INDEX_COL), INDEX_COL, "left")
        .withColumn(CLUSTER_COL, F.coalesce(F.col("cluster"), F.col(INDEX_COL)))
        .drop("cluster")
    )
    return reassigned, new_map


def simhash_dedup(
    df: DataFrame,
    kernel: SimHashKernel,
    text_col: str = "text",
    id_col: str = INDEX_COL,
    check_false_positive: bool = False,
    jaccard_threshold: float = 0.5,
    skip_filtering: bool = False,
    max_bucket_size: int | None = None,
    max_cluster_verify: int | None = None,
    repartition_input: int | None = None,
    cc_driver_threshold: int = 5_000_000,
    observation=None,
    contraction: str = "window",
) -> SimHashDedupResult:
    docs = df if id_col == INDEX_COL else df.withColumn(INDEX_COL, F.col(id_col))
    if repartition_input:
        docs = docs.repartition(repartition_input, F.col(INDEX_COL))
    # persist the embed output (one row per doc, UDF evaluated exactly once
    # — see simhash_embed docstring); the cheap JVM window/explode re-runs
    # per consumer
    embedded = simhash_embed(docs, kernel, text_col).persist()

    # --- distinct-fingerprint contraction (lossless) -------------------
    # Docs with IDENTICAL signatures are Hamming-0 cliques AND share every
    # permutation bucket key (keys are a pure function of the signature),
    # so contracting each signature group to its min-id representative
    # BEFORE the quadratic within-bucket join yields the exact same
    # transitive closure: rep->member star edges reconnect the group, and
    # rep-rep bucket edges carry every cross-group adjacency. Within-bucket
    # pair work drops from sum(m_b^2) over DOCS to sum(u_b^2) over DISTINCT
    # signatures — the difference between a 10-minute hang and ~2 minutes
    # on a 1M-page boilerplate-heavy corpus (a 50k-doc identical-template
    # cluster is ONE node here; the reference's sequential bucket scan,
    # simhash.py:43-71, pays all 1.25e9 pairs).
    #
    # Rep selection is a partial-aggregated groupBy + join back, NOT a
    # window: the map-side combine shrinks the rep exchange to distinct
    # signatures, AQE broadcasts it when small (the common case — the join
    # back then moves NO embed rows and plans no sort), and at flood scale
    # it degrades to the same single hash exchange the window would pay,
    # minus the window's per-partition sort.
    sigs = embedded.select(
        F.col(INDEX_COL),
        F.col("__E__.sig_hi").alias("sig_hi"),
        F.col("__E__.sig_lo").alias("sig_lo"),
        F.col("__E__.keys").alias("__keys__"),
    )
    reps = sigs.groupBy("sig_hi", "sig_lo").agg(
        F.min(INDEX_COL).alias("__rep__")
    )
    with_rep = sigs.join(reps, ["sig_hi", "sig_lo"])
    member_edges = with_rep.where(F.col(INDEX_COL) != F.col("__rep__")).select(
        F.col("__rep__").alias("src"), F.col(INDEX_COL).alias("dst")
    )
    fps = (
        with_rep.where(F.col(INDEX_COL) == F.col("__rep__"))
        .select(
            F.col(INDEX_COL),
            F.col("sig_hi"),
            F.col("sig_lo"),
            F.explode_outer("__keys__").alias("__key__"),
        )
    )
    bucket_edges = simhash_edges(
        fps, kernel.bit_diff, max_bucket_size, observation, dedup=False
    )
    edges = member_edges.unionByName(bucket_edges)
    mapping = connected_components(edges, driver_threshold=cc_driver_threshold)

    m = mapping.select(F.col("id").alias(INDEX_COL), F.col("cluster").alias("__C__"))
    assigned = (
        docs.join(m, INDEX_COL, "left")
        .withColumn(CLUSTER_COL, F.coalesce(F.col("__C__"), F.col(INDEX_COL)))
        .withColumn(DUPLICATE_COL, F.col("__C__").isNotNull())
        .drop("__C__")
    )
    if check_false_positive:
        assigned, mapping = simhash_check_false_positives(
            assigned,
            kernel,
            jaccard_threshold,
            text_col,
            max_cluster_verify=max_cluster_verify,
            observation=observation,
            contraction=contraction,
        )
    # reference quirk: filter uses the INITIAL duplicate flag (simhash.py:176-186)
    kept = assigned if skip_filtering else assigned.where(~F.col(DUPLICATE_COL))
    return SimHashDedupResult(docs=assigned, kept=kept, clusters=mapping)
