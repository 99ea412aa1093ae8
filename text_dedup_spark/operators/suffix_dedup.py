"""Exact-substring (suffix-array) dedup pipeline, Spark-first.

Reference: ``src/text_dedup/suffix_array.py`` — concat corpus bytes with
per-doc boundary slices (S6), external suffix-array + self-similar + collect
(X1/X2), restore ranges to docs (X3), per-doc text rewrite (P6) and
empty-doc filter (P7). Here the whole chain runs inside ``applyInPandas``
groups with the in-house numpy suffix-array kernel; restore/merge/clean_up
are the doctest-pinned kernels from kernels/intervals.py.

Bucketing model (SURVEY.md §7.7):
- ``num_buckets=1`` (default): the whole corpus is one group — byte-exact
  reference semantics; fine up to a few hundred MB per executor.
- ``num_buckets>1``: hash-of-id buckets, duplicates detected only within a
  bucket. This keeps memory bounded at scale but misses cross-bucket
  duplicates; the scale path for cross-bucket recall is content-defined
  anchor grouping (documented, not yet implemented). Never silently used:
  callers choose it explicitly.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from text_dedup_spark.operators.ids import INDEX_COL


@dataclass
class SuffixDedupResult:
    docs: DataFrame  # id + rewritten text (may be empty)
    kept: DataFrame  # docs with non-empty rewritten text


def suffix_array_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = INDEX_COL,
    length_threshold: int = 100,
    merge_strategy: str = "longest",
    num_buckets: int = 1,
) -> SuffixDedupResult:
    def process(pdf: pd.DataFrame) -> pd.DataFrame:
        from text_dedup_spark.kernels.intervals import clean_up, restore_and_merge
        from text_dedup_spark.kernels.suffix_array_kernel import duplicate_byte_ranges

        pdf = pdf.sort_values(id_col)  # concat order = id order (load order)
        texts = pdf[text_col].tolist()
        encoded = [(t or "").encode("utf-8") for t in texts]
        boundaries = []
        start = 0
        for b in encoded:
            boundaries.append(slice(start, start + len(b)))
            start += len(b)
        data = b"".join(encoded)
        ranges = duplicate_byte_ranges(data, length_threshold)
        slices_per_doc, _ = restore_and_merge(
            boundaries, ranges, length_threshold, merge_strategy
        )
        cleaned = [
            clean_up(t or "", sl) for t, sl in zip(texts, slices_per_doc, strict=True)
        ]
        return pd.DataFrame({id_col: pdf[id_col].values, text_col: cleaned})

    slim = df.select(
        F.col(id_col),
        F.col(text_col),
        F.pmod(F.col(id_col), F.lit(num_buckets)).alias("__bucket__"),
    )
    rewritten = slim.groupBy("__bucket__").applyInPandas(
        process, schema=f"{id_col} long, {text_col} string"
    )
    docs = df.drop(text_col).join(rewritten, id_col)
    kept = docs.where(F.length(F.col(text_col)) > 0)
    return SuffixDedupResult(docs=docs, kept=kept)
