"""MinHash + LSH near-duplicate pipeline, Spark-first.

Re-expresses reference ``src/text_dedup/minhash.py`` (load -> filter ->
fingerprint -> cluster -> assign -> verify -> filter) as a declarative
DataFrame plan:

    df -> pandas UDF (tokenize+shingle+minhash bands, Arrow-batched)
       -> posexplode(bands)
       -> groupBy(band) min/count           [star edges, O(n) not O(n^2)]
       -> large-star/small-star CC          [replaces polars super_merger]
       -> left join assign + coalesce       [replaces pickled parents dict]
       -> optional pair-verification join   [check_false_positives]
       -> filter representatives

Scale design (SURVEY.md §7.5):
- The reference's band self-join (``minhash.py:59-65``) is O(m^2) per band
  group; we emit star edges (band-min -> member) instead — identical
  transitive closure, linear output.
- Two physical forms of the star-edge step: ``lsh_star_edges`` (window-min,
  ONE exchange — fastest at bench scale, but a hot band key lands whole in
  a single sort task) and ``lsh_star_edges_salted`` (salted two-phase
  groupBy-min + AQE-skew-split join-back — per-reducer rows bounded under
  arbitrarily hot bands; the scale profile's default). See each docstring.
- No collect_list anywhere; no driver-side maps. Cluster assignment is a
  shuffle join, broadcastable automatically when the cluster map is small.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType

from text_dedup_spark.kernels.jaccard import jaccard_similarity
from text_dedup_spark.kernels.minhash_kernel import MinHashKernel
from text_dedup_spark.kernels.tokenization import shingles
from text_dedup_spark.operators.connected_components import connected_components
from text_dedup_spark.operators.ids import CLUSTER_COL, DUPLICATE_COL, INDEX_COL


@dataclass
class MinHashDedupResult:
    docs: DataFrame  # all surviving-filter docs + __CLUSTER__ + __duplicate__
    kept: DataFrame  # deduplicated output (cluster representatives)
    clusters: DataFrame  # (id, cluster) mapping for nodes in >=2 clusters


def _bands_udf(kernel: MinHashKernel):
    """Arrow-batched fingerprint: None for docs failing the min_length
    filter (reference ``minhash.py:23-28``), else an int64 array of 64-bit
    band keys (``MinHashKernel.embed_batch_bandhash`` — the polynomial mix
    of each band's signature values; equal bands -> equal keys, distinct
    bands collide at ~2**-64). ~4x fewer bytes per doc through Arrow and
    the fingerprint cache than the byteswapped signature blob."""

    @F.pandas_udf(ArrayType(LongType()))
    def bands(texts: pd.Series) -> pd.Series:
        from text_dedup_spark.kernels.tokenization import shingle_bytes, tokenize

        shingle_sets: list[set[bytes] | None] = []
        for t in texts:
            tokens = tokenize(t if t is not None else "")
            if len(tokens) < kernel.min_length:
                shingle_sets.append(None)
            else:
                # zip-based shingle construction, output-identical to the
                # ngrams iterator path (and no per-gram .lower(): tokens
                # are already lowered by tokenize — see kernels.
                # tokenization.shingle_bytes/shingles)
                shingle_sets.append(
                    shingle_bytes(tokens, kernel.ngram_size, kernel.min_length)
                )
        out: list = [None] * len(shingle_sets)
        keep_idx = [i for i, s in enumerate(shingle_sets) if s is not None]
        embedded = kernel.embed_batch_bandhash([shingle_sets[i] for i in keep_idx])
        for i, b in zip(keep_idx, embedded, strict=True):
            out[i] = b
        return pd.Series(out)

    return bands


def _explode_bands(filtered: DataFrame, kernel: MinHashKernel) -> DataFrame:
    """Explode the band-key array into (band_idx, band_val) rows JVM-side
    (whole-stage codegen, no Python; band_val is the int64 band key)."""
    return filtered.select(
        F.col(INDEX_COL),
        F.posexplode(F.col("__BANDS__")).alias("__band_idx__", "__band_val__"),
    )


def jaccard_pair_udf(ngram_size: int, min_length: int):
    """Pairwise shingle-set Jaccard (reference ``minhash.py:108-145`` /
    ``utils/jaccard.py``), Arrow-batched. Test-oracle / compatibility path:
    the FP-verify operators use ``gram_set_udf`` + ``jaccard_ge_expr``
    instead (one tokenize per doc, JVM set ops per pair)."""

    @F.pandas_udf(DoubleType())
    def jacc(t1: pd.Series, t2: pd.Series) -> pd.Series:
        return pd.Series(
            [
                jaccard_similarity(
                    shingles(a or "", ngram_size, min_length),
                    shingles(b or "", ngram_size, min_length),
                )
                for a, b in zip(t1, t2, strict=True)
            ]
        )

    return jacc


def gram_set_udf(ngram_size: int, min_length: int):
    """Per-doc distinct shingle strings (reference tokenize+shingles, ONE
    Python pass per doc). The pairwise Jaccard then runs JVM-side
    (``jaccard_ge_expr``) — the quadratic part of FP verification stays in
    whole-stage codegen instead of re-tokenizing both texts per PAIR."""
    from pyspark.sql.types import StringType

    @F.pandas_udf(ArrayType(StringType()))
    def grams(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [
                [g.decode("utf-8") for g in shingles(t or "", ngram_size, min_length)]
                for t in texts
            ]
        )

    return grams


def jaccard_ge_expr(g1, g2, threshold: float):
    """JVM column expression for ``jaccard_similarity(set1, set2) >=
    threshold`` over distinct-gram arrays: one int->double division and the
    same IEEE-754 comparison the Python kernel performs, so results are
    bit-identical; the reference's empty-union -> 1.0 convention folds into
    a constant on the threshold."""
    inter = F.size(F.array_intersect(g1, g2))
    uni = F.size(g1) + F.size(g2) - inter
    cond = inter.cast("double") / uni >= F.lit(float(threshold))
    if threshold <= 1.0:
        return (uni == F.lit(0)) | cond
    return (uni > F.lit(0)) & cond


def minhash_fingerprint(df: DataFrame, kernel: MinHashKernel, text_col: str = "text") -> DataFrame:
    """filter(min_length) + embed + band split -> (__INDEX__, __band_idx__,
    __band_val__). Equivalent of reference P1+F1..F7 (minhash.py:23-44)."""
    with_bands = df.withColumn("__BANDS__", _bands_udf(kernel)(F.col(text_col)))
    return _explode_bands(with_bands.where(F.col("__BANDS__").isNotNull()), kernel)


def lsh_star_edges(exploded: DataFrame) -> DataFrame:
    """Band groups -> star edges (band-min-id, member-id) in ONE shuffle: a
    min-over-band window replaces the former groupBy + join-back pair, which
    exchanged the exploded band rows TWICE (once under the aggregation, once
    under the join's left side) and re-read the fingerprint cache for each —
    measured as the second-largest cost of the 1M-doc pipeline after the
    fingerprint UDF itself. A row is an edge iff its id is not its band
    group's minimum (a single-member group contributes nothing, so no
    count filter is needed). Edge set identical to the reference's all-pairs
    band join (J1) through connected components, linear in band-group size.

    No distinct: connected_components dedups its input, so an extra shuffle
    here would be pure overhead."""
    from pyspark.sql import Window

    w = Window.partitionBy("__band_idx__", "__band_val__")
    return (
        exploded.withColumn("__root__", F.min(INDEX_COL).over(w))
        .where(F.col(INDEX_COL) != F.col("__root__"))
        .select(F.col("__root__").alias("src"), F.col(INDEX_COL).alias("dst"))
    )


def lsh_star_edges_salted(exploded: DataFrame, salt_buckets: int = 0) -> DataFrame:
    """Hot-band-safe star edges: salted min-aggregation + AQE join-back
    (SURVEY.md §7.5's "salted groupBy" form; north-star scale requirement).
    Same edge set as ``lsh_star_edges`` — min() is associative, so a min of
    per-salt minima is the band minimum.

    Why the window form can't serve 10^12 docs: a window partitioned by
    band key hashes every row of one band into ONE task's sort. Web corpora
    put 10^7-10^9 exact copies of boilerplate pages in the same band
    (FIXTURES.md F1 plants exactly this), so the hottest task scales with
    the largest duplicate group — unbounded. Here instead:

    1. ``groupBy(band).min(id)`` with map-side partial aggregation — which
       IS the salted first phase: every map task pre-combines its own rows
       per band (salt = input partition id, applied by Spark's
       HashAggregate(partial) automatically), so the reducer receives at
       most #map-tasks rows per band key no matter how hot the band.
       ``salt_buckets > 0`` additionally inserts an EXPLICIT
       ``groupBy(band, xxhash64(id) % S)`` phase — only useful if a
       non-algebraic aggregate (no partial form) ever replaces min; for
       min it costs a full extra exchange of the exploded rows for zero
       skew benefit (measured ~1.3x wall on 1M docs), so 0 is the default.
    2. join the band roots back to the exploded rows — the probe side's hot
       band partitions are AQE-skew-SPLIT (OptimizeSkewedJoin duplicates
       the one-row-per-band build side per split), so no task exceeds the
       skew threshold regardless of band heat.

    More exchanges than the window's one — at bench scale the window wins
    (see ``minhash_dedup.band_edges_mode``); under the scale profile this
    form is pinned, because the window's worst task is O(hottest band) and
    this one's is O(skew-split threshold)."""
    if salt_buckets > 0:
        salt = F.pmod(F.xxhash64(F.col(INDEX_COL)), F.lit(salt_buckets)).alias(
            "__salt__"
        )
        pre = (
            exploded.select("__band_idx__", "__band_val__", F.col(INDEX_COL), salt)
            .groupBy("__band_idx__", "__band_val__", "__salt__")
            .agg(F.min(INDEX_COL).alias("__m__"))
        )
    else:
        pre = exploded.select(
            "__band_idx__", "__band_val__", F.col(INDEX_COL).alias("__m__")
        )
    # count >= 2: a single-member band can never produce an edge (its only
    # row IS the root), and on a mostly-unique web corpus single-member
    # bands are the overwhelming majority of distinct band values —
    # filtering them off the build side shrinks the join-back from
    # ~|distinct bands| to ~|duplicate-sharing bands| rows (often
    # broadcastable), and the inner join drops the matching probe rows for
    # free. Only valid when counts are exact, i.e. salt_buckets=0 (one pre
    # row per member); the explicit-salt phase pre-aggregates, so a single
    # per-salt row can hide multiple members and the filter must stay off.
    agg = [F.min("__m__").alias("__root__")]
    if salt_buckets == 0:
        agg.append(F.count(F.lit(1)).alias("__bn__"))
    roots = pre.groupBy("__band_idx__", "__band_val__").agg(*agg)
    if salt_buckets == 0:
        roots = roots.where(F.col("__bn__") >= 2).drop("__bn__")
    return (
        exploded.join(roots, ["__band_idx__", "__band_val__"])
        .where(F.col(INDEX_COL) != F.col("__root__"))
        .select(F.col("__root__").alias("src"), F.col(INDEX_COL).alias("dst"))
    )


def contract_identical_fingerprints(
    filtered: DataFrame,
    num_partitions: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Collapse byte-identical fingerprints (== identical band arrays) to
    one representative BEFORE the band explode: returns ``(rep_rows,
    contraction_edges)`` where ``rep_rows`` is (id, __BANDS__) with one row
    per distinct fingerprint and ``contraction_edges`` is (src=rep-min-id,
    dst=member) star edges. Exact duplicates share every band, so routing
    only the representative through explode + band exchange removes the
    largest duplicate group from the hottest band entirely — the band
    phase's row count drops from n*b to n_distinct*b, and the transitive
    closure over (contraction edges UNION band star edges) is identical to
    running all members through the bands.

    Grouping key is ``xxhash64(__BANDS__)`` (collision ~2^-64 — the same
    absorbed risk class as the int64 band keys themselves; an FP-verify run
    re-checks any merged pair against real text). The min-rep map comes
    from a partial-agg-safe groupBy that ALSO carries the band array out
    via ``first(__BANDS__)`` — sound because every row of a group has the
    identical array by construction — so ``rep_rows`` needs no join at all,
    and the member-edge join probes only 16-byte (id, key) rows instead of
    dragging the band arrays through a shuffle (measured: the array-probe
    form cost ~40% extra wall on a 1M-doc corpus). The join-back is
    AQE-skew-split, so a 10M-copy boilerplate group never concentrates in
    one task."""
    fp = filtered.select(
        INDEX_COL, "__BANDS__", F.xxhash64(F.col("__BANDS__")).alias("__fph__")
    )
    if num_partitions:
        # pre-partition on the group/join key: the aggregate's required
        # distribution is satisfied, so this IS the agg exchange (at the
        # pinned width), and the edge join below is co-partitioned on
        # __fph__ — no second exchange. Same sort-width rationale as
        # ``band_partitions`` (concurrent sort tasks thrash beyond ~16 MB).
        fp = fp.repartition(num_partitions, "__fph__")
    rep_map = fp.groupBy("__fph__").agg(
        F.min(INDEX_COL).alias("__rep__"),
        F.first("__BANDS__").alias("__BANDS__"),
        F.count(F.lit(1)).alias("__fn__"),
    )
    # singleton fingerprints (the bulk of a mostly-unique corpus) emit no
    # contraction edge — keep them off the edge join's build side
    contraction_edges = (
        fp.select(INDEX_COL, "__fph__")
        .join(
            rep_map.where(F.col("__fn__") >= 2).select("__fph__", "__rep__"),
            "__fph__",
        )
        .where(F.col(INDEX_COL) != F.col("__rep__"))
        .select(F.col("__rep__").alias("src"), F.col(INDEX_COL).alias("dst"))
    )
    rep_rows = rep_map.select(F.col("__rep__").alias(INDEX_COL), "__BANDS__")
    return rep_rows, contraction_edges


def _contract_text_groups(
    cand: DataFrame, text_col: str, contraction: str, cluster_col: str = CLUSTER_COL
) -> DataFrame:
    """Attach ``__trep__`` (min id of the (cluster, identical-text) group)
    and ``__tsz__`` (group size) to every candidate row — the identical-text
    contraction both FP-verification operators share. ``contraction`` picks
    the physical form (see the call sites): "window" = one exchange, worst
    task O(largest identical-text group); "join" = partial-agg groupBy +
    AQE-skew-split join-back, worst task bounded."""
    if contraction not in ("window", "join"):
        raise ValueError(
            f"contraction must be 'window' or 'join', got {contraction!r}"
        )
    key = F.sha2(F.col(text_col), 256)
    if contraction == "window":
        from pyspark.sql import Window

        wt = Window.partitionBy(cluster_col, key)
        return cand.withColumn("__trep__", F.min(INDEX_COL).over(wt)).withColumn(
            "__tsz__", F.count(F.lit(1)).over(wt)
        )
    with_key = cand.withColumn("__tkey__", key)
    groups = with_key.groupBy(cluster_col, "__tkey__").agg(
        F.min(INDEX_COL).alias("__trep__"), F.count(F.lit(1)).alias("__tsz__")
    )
    return with_key.join(groups, [cluster_col, "__tkey__"]).drop("__tkey__")


def assign_clusters(docs: DataFrame, mapping: DataFrame) -> DataFrame:
    """Left-join cluster assignment: cluster = parents.get(idx, idx),
    __duplicate__ = idx in parents (reference ``minhash.py:82-98``)."""
    m = mapping.select(F.col("id").alias(INDEX_COL), F.col("cluster").alias("__C__"))
    return (
        docs.join(m, INDEX_COL, "left")
        .withColumn(CLUSTER_COL, F.coalesce(F.col("__C__"), F.col(INDEX_COL)))
        .withColumn(DUPLICATE_COL, F.col("__C__").isNotNull())
        .drop("__C__")
    )


def check_false_positives(
    docs: DataFrame,
    kernel: MinHashKernel,
    text_col: str = "text",
    max_cluster_verify: int | None = None,
    observation=None,
    contraction: str = "window",
) -> tuple[DataFrame, DataFrame]:
    """Intra-cluster pairwise Jaccard re-check, re-assign min-idx within the
    *old* cluster (exact semantics of reference ``minhash.py:101-170`` —
    nodes failing verification revert to their own id; the __duplicate__
    flag is intentionally NOT updated, as in the reference).

    ``max_cluster_verify`` (scale guard, default None = reference-faithful):
    clusters with more DISTINCT texts than the cap skip pairwise
    verification and keep their assignment (identical texts contract before
    the pair join — see below — so a 10M-member exact-duplicate boilerplate
    cluster is ONE distinct text and never trips the cap; the cap bounds
    genuinely-distinct near-miss variety). Bypassed membership is observable
    via the ``fp_bypassed`` metric — never a silent drop."""
    cand = docs.where(F.col(DUPLICATE_COL)).select(INDEX_COL, text_col, CLUSTER_COL)

    # --- identical-text contraction (lossless) -------------------------
    # Within a cluster, docs with byte-identical text always verify against
    # each other (Jaccard(t, t) = 1.0 >= threshold), and every cross-text
    # pair's Jaccard depends only on the two TEXTS — so the quadratic
    # pairwise re-check runs over one representative per distinct text, and
    # a text group is verified iff it has >=2 members or its rep verifies
    # against some other distinct text. Verified-membership and the min-idx
    # regroup are computed over the full doc set, so the output is exactly
    # the reference's (minhash.py:101-170). Boilerplate mega-clusters are
    # overwhelmingly exact duplicates — the case that made the O(m^2)
    # verify a scale hazard — and contract to a handful of distinct texts.
    # Two rep-selection forms, same trade as the band star edges:
    # - "window" (parity default): one exchange; measured 1.3x faster than
    #   a join-back at sf0.1 (the join would drag the TEXT column through a
    #   second exchange). But one (cluster, text-hash) group = one sort
    #   task — a 10M-member exact-duplicate cluster lands whole in it.
    # - "join" (scale): partial-agg groupBy min/count + AQE-skew-split
    #   join-back — worst task bounded by the skew threshold, the form a
    #   10^12-doc run needs (pinned to the salted star-edge mode by
    #   minhash_dedup).
    # persisted: cand feeds the cap sizing, the rep selection AND the
    # verified-membership join — without it each consumer re-runs the whole
    # upstream (assignment join + contraction) once per scan. Bounded: dup
    # candidates only (same size class as the reference's verify working
    # set), released after new_map materializes below. cand_cache keeps a
    # handle on the PERSISTED frame: `cand` is rebound under
    # max_cluster_verify, and unpersisting the derived plan would be a
    # silent no-op (CacheManager matches by sameResult) — the cached
    # contraction would leak for the session.
    cand_cache = _contract_text_groups(cand, text_col, contraction).persist()
    cand = cand_cache

    bypassed = None
    if max_cluster_verify is not None:
        # the cap bounds DISTINCT texts per cluster (identical-text floods
        # are contracted and never inflate the pair count)
        sizes = cand.where(F.col(INDEX_COL) == F.col("__trep__")).groupBy(
            CLUSTER_COL
        ).agg(F.count(F.lit(1)).alias("__csz__"))
        cand_all = cand.join(sizes, CLUSTER_COL)
        bypassed = cand_all.where(F.col("__csz__") > max_cluster_verify).select(
            F.col(INDEX_COL).alias("idx"), F.col(CLUSTER_COL)
        )
        # observable, never silent: readable post-action via Observation
        bypassed = bypassed.observe(
            observation if observation is not None else "fp_bypassed",
            F.count(F.lit(1)).alias("n_bypassed"),
        )
        cand = cand_all.where(F.col("__csz__") <= max_cluster_verify).drop("__csz__")

    # one gram pass per rep, then JVM array_intersect Jaccard per pair —
    # the O(pairs) cost runs in whole-stage codegen, not Python. Persisted:
    # reps backs BOTH sides of the pair self-join — uncached, the gram UDF
    # would run twice (once per side). Cache only (cluster, id, grams): the
    # pair join never reads the raw text, so caching it alongside (the
    # previous shape) roughly doubled the cache bytes for nothing.
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
        F.col(CLUSTER_COL),
        F.col(INDEX_COL).alias("id1"),
        F.col("__G__").alias("g1"),
    )
    right = reps.select(
        F.col(CLUSTER_COL),
        F.col(INDEX_COL).alias("id2"),
        F.col("__G__").alias("g2"),
    )
    pairs = left.join(right, CLUSTER_COL).where(F.col("id1") < F.col("id2"))
    verified = pairs.where(
        jaccard_ge_expr(F.col("g1"), F.col("g2"), kernel.threshold)
    )
    # ONE scan of the quadratic pair join for both endpoints: the former
    # union(id1, id2) form scanned `verified` twice, re-running the
    # pair-Jaccard filter — the verify stage's dominant cost — once per side
    verified_reps = verified.select(
        F.explode(F.array(F.col("id1"), F.col("id2"))).alias("__trep__")
    )
    # a group verifies via size >= 2 (J = 1.0 pairs, iff the threshold is
    # satisfiable by identity) or via its rep's cross-text pairs. The two
    # branches partition cand on the auto predicate, so their union is
    # duplicate-free without any distinct — and the semi join tolerates
    # duplicate build rows, so verified_reps needs no distinct either
    # (the former distinct + left-join + null-filter form paid one extra
    # exchange for the same set). cand is unique per doc id and bypassed
    # is disjoint from it (opposite __csz__ filter).
    auto = F.col("__tsz__") >= 2 if kernel.threshold <= 1.0 else F.lit(False)
    members = (
        cand.where(auto)
        .select(F.col(INDEX_COL).alias("idx"), F.col(CLUSTER_COL))
        .unionByName(
            cand.where(~auto)
            .join(verified_reps, "__trep__", "left_semi")
            .select(F.col(INDEX_COL).alias("idx"), F.col(CLUSTER_COL))
        )
    )
    if bypassed is not None:
        members = members.unionByName(bypassed)
    # min-idx regroup within the OLD cluster. Two physical forms, same
    # window-vs-join trade as the text contraction above: the window is one
    # exchange and evaluates the `members` subtree (cache scans + the semi
    # join against the pair-join output) ONCE, where the join form planned
    # it twice — build and probe side — for an extra exchange; its worst
    # task is O(largest old cluster), which the parity profile accepts and
    # the scale profile ("join") must not.
    if contraction == "window":
        from pyspark.sql import Window

        new_map = members.withColumn(
            "__newc__", F.min("idx").over(Window.partitionBy(CLUSTER_COL))
        ).select(F.col("idx").alias("id"), F.col("__newc__").alias("cluster"))
    else:
        new_map = (
            members.join(
                members.groupBy(CLUSTER_COL).agg(F.min("idx").alias("__newc__")),
                CLUSTER_COL,
            )
            .select(F.col("idx").alias("id"), F.col("__newc__").alias("cluster"))
        )
    # materialize the verified mapping once (it is small — verified dup docs
    # only), then release the working caches: without this, the caller's
    # docs-action AND its clusters-action would each re-run the pair join
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


def minhash_dedup(
    df: DataFrame,
    kernel: MinHashKernel,
    text_col: str = "text",
    id_col: str = INDEX_COL,
    check_false_positive: bool = False,
    skip_filtering: bool = False,
    repartition_input: int | None = None,
    cc_driver_threshold: int = 5_000_000,
    max_cluster_verify: int | None = None,
    band_partitions: int | None = None,
    band_edges_mode: str = "window",
    fingerprint_contraction: str = "auto",
    observation=None,
) -> MinHashDedupResult:
    """End-to-end MinHash dedup. ``df`` must already carry a unique long id
    in ``id_col`` (see ``operators.ids.assign_ids``).

    ``repartition_input``: spread the CPU-heavy fingerprint UDF across N
    partitions. Needed when the source is a handful of files (bench/test
    inputs); leave None at scale where file splits give parallelism.

    ``band_partitions``: partition count for the band-group exchange under
    the star-edge window — the largest shuffle of the pipeline (docs x
    bands rows). The window's per-partition SORT is the concurrency-hostile
    step: partitions much beyond ~16 MB thrash cache under multi-task
    executors (measured 2.8x on the sort stage at 8 concurrent tasks).
    Size so partitions land well under that (rows*20B / band_partitions);
    an explicit count here survives AQE's parallelism-first coalescing,
    which would otherwise merge the sort back to defaultParallelism-sized
    partitions. None = session ``spark.sql.shuffle.partitions``.

    ``band_edges_mode``: ``"window"`` (default — one exchange, fastest when
    no band is pathologically hot) or ``"salted"`` (identical-fingerprint
    contraction + salted two-phase groupBy-min + AQE-skew-split join-back —
    worst task bounded regardless of band heat; the scale profile pins
    this). Cluster assignments are identical between modes (min is
    associative; contraction preserves the transitive closure).

    ``fingerprint_contraction`` (salted mode only): ``"auto"`` (default)
    probes the duplicate-fingerprint mass with ONE pass over the slim
    fingerprint cache (count + approx_count_distinct in a single aggregate)
    and skips the contraction when the corpus is mostly unique;
    ``"always"``/``"never"`` force it. Economics of the gate: contraction
    spends ~2 exchanges of n narrow fingerprint rows to save
    (1 - distinct_ratio) of the n*b-row band explode + exchange — with
    b ~ 13 bands the break-even sits near distinct_ratio ~ 0.85, so auto
    skips above that (the probe's ~2% approx error only matters exactly at
    break-even, where either choice costs the same). Cluster output is
    identical either way; skew safety does not depend on the gate — the
    salted groupBy's map-side partial aggregation and the AQE-skew-split
    join-back bound per-task work with or without contraction."""
    if band_edges_mode not in ("window", "salted"):
        raise ValueError(
            f"band_edges_mode must be 'window' or 'salted', got {band_edges_mode!r}"
        )
    if fingerprint_contraction not in ("auto", "always", "never"):
        raise ValueError(
            "fingerprint_contraction must be 'auto', 'always' or 'never', "
            f"got {fingerprint_contraction!r}"
        )
    docs = df if id_col == INDEX_COL else df.withColumn(INDEX_COL, F.col(id_col))
    if repartition_input:
        docs = docs.repartition(repartition_input, F.col(INDEX_COL))

    # The fingerprint cache is SLIM — (id, band-key array) only, ~9B/band —
    # the exact shape of the fingerprint checkpoint table you'd persist at
    # cluster scale. Caching the full input rows alongside (the previous
    # shape) tripled the cache bytes and made every band-phase scan drag the
    # text column through memory. Wide columns rejoin by id at assignment.
    # The persist sits BELOW the isNotNull filter deliberately: with the
    # filter inside the cached plan, Catalyst pushes it under the
    # repartition exchange, which splits the Python UDF into two
    # ArrowEvalPython nodes (one to evaluate the filter pre-shuffle, one to
    # rematerialize the column post-shuffle) — doubling the single most
    # expensive stage of the pipeline. Caching the raw UDF output keeps one
    # evaluation; the filter is a trivial scan predicate on the cache.
    with_bands = (
        docs.select(F.col(INDEX_COL), F.col(text_col))
        .withColumn("__BANDS__", _bands_udf(kernel)(F.col(text_col)))
        .select(INDEX_COL, "__BANDS__")
        .persist()
    )
    filtered = with_bands.where(F.col("__BANDS__").isNotNull())

    if band_edges_mode == "salted":
        contract = fingerprint_contraction != "never"
        if fingerprint_contraction == "auto":
            # one distributed pass over the slim cache (populates it too —
            # work the band phase needs anyway); see the docstring's
            # break-even derivation for the 0.85 ratio
            probe = filtered.select(
                F.count(F.lit(1)).alias("n"),
                # rsd=0.02 makes the docstring's "~2% approx error" true
                # (the default is 5%); near the 0.85 break-even either
                # gate choice costs the same, so tighter is free accuracy
                F.approx_count_distinct(F.xxhash64("__BANDS__"), rsd=0.02).alias("nd"),
            ).first()
            contract = probe["nd"] < 0.85 * probe["n"]
        if contract:
            rep_rows, contraction_edges = contract_identical_fingerprints(
                filtered, num_partitions=band_partitions
            )
        else:
            rep_rows = filtered
            contraction_edges = None
        exploded = _explode_bands(rep_rows, kernel)
        if band_partitions:
            # pin the band exchange width here too: the groupBy's required
            # distribution is satisfied by this repartition and the
            # join-back probe shares it — band_partitions governs the sort
            # width of the salted path exactly as it does the window's
            exploded = exploded.repartition(
                band_partitions, "__band_idx__", "__band_val__"
            )
        edges = lsh_star_edges_salted(exploded)
        if contraction_edges is not None:
            edges = edges.unionByName(contraction_edges)
    else:
        exploded = _explode_bands(filtered, kernel)
        if band_partitions:
            # pre-partition on the window's own keys: satisfies the window's
            # required clustering (no second exchange) while pinning the sort
            # width
            exploded = exploded.repartition(
                band_partitions, "__band_idx__", "__band_val__"
            )
        edges = lsh_star_edges(exploded)
    edges = edges.observe(
        "minhash_edges", F.count(F.lit(1)).alias("n_edges")
    )
    mapping = connected_components(edges, driver_threshold=cc_driver_threshold)

    # min-length survivors rejoin their full columns by id (both sides carry
    # the repartition hash partitioning, so this adds no exchange of the
    # wide rows beyond the one the repartition already paid)
    survivors = docs.join(filtered.select(INDEX_COL), INDEX_COL)
    assigned = assign_clusters(survivors, mapping)
    if check_false_positive:
        assigned, mapping = check_false_positives(
            assigned,
            kernel,
            text_col,
            max_cluster_verify=max_cluster_verify,
            observation=observation,
            # one knob, one meaning: "salted" = bounded worst task in every
            # stage, so the verify contraction switches to the join form too
            contraction="join" if band_edges_mode == "salted" else "window",
        )

    kept = (
        assigned
        if skip_filtering
        else assigned.where(F.col(CLUSTER_COL) == F.col(INDEX_COL))
    )
    return MinHashDedupResult(docs=assigned, kept=kept, clusters=mapping)
