"""Exact whole-document dedup — Bloom-filter pipeline equivalent.

Reference: ``src/text_dedup/bloom_filter.py:23-60`` — a sequential
single-process membership scan ("first occurrence wins"). Spark rebuild
(SURVEY.md F14): groupBy a cryptographic content hash, keep the minimum id.
This is a *deterministic superset* of the reference's semantics: the Bloom
filter can false-positive (dropping unique docs); the hash-groupBy never
does. Documented, strictly-better deviation.

Scale: one shuffle on sha256(text); map-side partial aggregation bounds
skew; no driver state (the reference caps out at one process).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from text_dedup_spark.operators.ids import DUPLICATE_COL, INDEX_COL


@dataclass
class ExactDedupResult:
    docs: DataFrame  # all docs + duplicate flag
    kept: DataFrame  # first occurrence (min id) per distinct text


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = INDEX_COL,
    skip_filtering: bool = False,
) -> ExactDedupResult:
    h = F.sha2(F.col(text_col).cast("string"), 256)
    firsts = (
        df.select(F.col(id_col), h.alias("__H__"))
        .groupBy("__H__")
        .agg(F.min(id_col).alias("__FIRST__"))
    )
    docs = (
        df.withColumn("__H__", h)
        .join(firsts, "__H__")
        .withColumn(DUPLICATE_COL, F.col(id_col) != F.col("__FIRST__"))
        .drop("__H__", "__FIRST__")
    )
    kept = docs if skip_filtering else docs.where(~F.col(DUPLICATE_COL))
    return ExactDedupResult(docs=docs, kept=kept)
