"""Embedding-cosine near-duplicate detection (task brief: embedding-cosine
near-dup as a first-class dedup path).

Engine-exact formulation: embeddings are quantized to integer grids, and
``cos(a,b) >= t`` is evaluated as ``dot >= 0 AND dot^2 >= t^2 * |a|^2 *
|b|^2`` in exact integer arithmetic (Python ints via Spark DECIMAL would
overflow; we keep dot and norms as int64 — 64-dim * 1000-scale values keep
dot^2 within int128, so the comparison uses DOUBLE guarded by a margin, or
exact decimal when needed). Pairs above threshold become edges; connected
components assign min-id cluster labels, same CC operator as MinHash/SimHash.

Candidate generation reuses the sign-sketch LSH tables for scale
(brute-force used below the pair gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from text_dedup_spark.functions.similarity import int_dot, quantize
from text_dedup_spark.operators.connected_components import connected_components


def cosine_edges(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    n_blocks: int | None = None,
    n_rows: int | None = None,
    target_block_rows: int = 50_000,
    gemm_chunk_rows: int = 2048,
) -> DataFrame:
    """All-pairs cosine >= threshold edges over quantized vectors, exact.

    cos >= t  <=>  dot >= 0 and dot^2 >= t^2 * |a|^2 * |b|^2 over integer
    dots/norms — engine- and platform-exact (no float reduction order).

    Physical strategy: block nested-loop GEMM. Vectors hash into
    ``n_blocks`` groups; each of the B*(B+1)/2 block pairs is one
    ``applyInPandas`` task computing a float64 BLAS matmul as a prefilter
    (with a conservative margin) and confirming survivors in exact int64 —
    ~100x faster than per-pair expression dots.

    Scale sizing: ``n_blocks`` defaults to ceil(n / target_block_rows)
    (min 8), so per-task vector storage stays ~(target_block_rows x dim)
    regardless of table size, and the prefilter matmul runs in
    ``gemm_chunk_rows``-row slabs so the dots matrix never materializes
    beyond (chunk x |block|) — constant task memory at any n."""
    import math

    import numpy as np
    import pandas as pd

    spark = emb.sparkSession
    if n_blocks is None:
        # pass n_rows when the caller already knows the count — the sizing
        # count otherwise recomputes the upstream lineage once
        n_total = emb.count() if n_rows is None else n_rows
        n_blocks = max(8, math.ceil(n_total / max(1, target_block_rows)))
    q = emb.select(
        F.col(id_col).alias("vid"), quantize(F.col(vec_col), scale).alias("q")
    )
    block = F.pmod(F.xxhash64("vid"), F.lit(n_blocks)).cast("int")
    q = q.withColumn("block", block)

    combos = [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)]
    combos_df = spark.createDataFrame(combos, "ba int, bb int")
    left = q.join(combos_df, q.block == combos_df.ba).select(
        "ba", "bb", "vid", "q", F.lit("L").alias("role")
    )
    right = q.join(combos_df, q.block == combos_df.bb).select(
        "ba", "bb", "vid", "q", F.lit("R").alias("role")
    )
    tagged = left.unionByName(right)
    t2_millionths = int(round(threshold * threshold * 1_000_000))

    def block_pair(pdf: pd.DataFrame) -> pd.DataFrame:
        diagonal = pdf["ba"].iloc[0] == pdf["bb"].iloc[0]
        lmask = pdf["role"] == "L"
        lrows = pdf[lmask]
        rrows = pdf[~lmask] if not diagonal else lrows
        if len(lrows) == 0 or len(rrows) == 0:
            return pd.DataFrame({"src": [], "dst": []}).astype("int64")
        la = np.array(lrows["q"].tolist(), dtype=np.int64)
        rb = np.array(rrows["q"].tolist(), dtype=np.int64)
        lids = lrows["vid"].to_numpy()
        rids = rrows["vid"].to_numpy()
        # float64 BLAS prefilter with margin (exact confirm below), run in
        # row slabs so the dots matrix is (chunk x |block|), never bigger
        laf, rbf = la.astype(np.float64), rb.astype(np.float64)
        na = np.einsum("ij,ij->i", laf, laf)
        nb = np.einsum("ij,ij->i", rbf, rbf)
        srcs, dsts = [], []
        for lo in range(0, len(laf), gemm_chunk_rows):
            hi = min(lo + gemm_chunk_rows, len(laf))
            dots_f = laf[lo:hi] @ rbf.T
            thresh = np.sqrt(np.outer(na[lo:hi], nb)) * (threshold - 1e-9)
            cand = np.nonzero((dots_f >= thresh) & (dots_f >= 0))
            for ci, j in zip(*cand, strict=True):
                i = lo + ci
                a_id, b_id = int(lids[i]), int(rids[j])
                if a_id == b_id:
                    continue
                if a_id > b_id:
                    if diagonal:
                        continue  # the (j, i) candidate covers this pair
                    a_id, b_id = b_id, a_id  # off-diagonal: normalize, don't drop
                dot = int(la[i] @ rb[j])
                if dot < 0:
                    continue
                n_a = int(la[i] @ la[i])
                n_b = int(rb[j] @ rb[j])
                if dot * dot * 1_000_000 >= n_a * n_b * t2_millionths:
                    srcs.append(a_id)
                    dsts.append(b_id)
        return pd.DataFrame({"src": srcs, "dst": dsts}, dtype="int64")

    return tagged.groupBy("ba", "bb").applyInPandas(block_pair, "src long, dst long")


def embedding_cosine_dedup(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int | None = None,
) -> DataFrame:
    """Returns (vec_id, cluster_id, is_dup) with min-id cluster labels."""
    edges = cosine_edges(emb, threshold, id_col, vec_col, n_rows=n_rows)
    mapping = connected_components(edges)
    m = mapping.select(F.col("id").alias(id_col), F.col("cluster").alias("__C__"))
    return (
        emb.select(id_col)
        .join(m, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("__C__"), F.col(id_col)).alias("cluster_id"),
            F.col("__C__").isNotNull().cast("int").alias("is_dup"),
        )
    )
