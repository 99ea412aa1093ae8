"""SparkSession factory with scale-oriented defaults.

Defaults encode the SURVEY.md §4 plan: AQE on (runtime re-plan + skew-join
splitting for hot LSH bands), Arrow transport for pandas UDFs, shuffle
partitions sized by caller (tests use 32 to match local[32]).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Join strategy (guide §3.1/§9): allow shuffled-hash join when its size
    # conditions are met instead of always sort-merge — the dedup pipelines
    # are chains of small-map equi-joins whose sorts are pure overhead; the
    # AQE threshold bounds the per-partition build side (spill safety), so
    # the choice stays size-gated at any scale. Overridable per deployment
    # via get_spark(conf=...). Measured at sf0.1: verified minhash
    # 2.51 -> 2.06 s, ngram pairs 2.22 -> 1.88 s, no query slower.
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64m",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # wide binary signature arrays: keep Arrow batches moderate
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.shuffle.partitions": "32",
    "spark.ui.enabled": "false",
    "spark.driver.memory": "8g",
    # deterministic epoch math for NTZ timestamps (matches DuckDB's epoch())
    "spark.sql.session.timeZone": "UTC",
}


def get_spark(
    app_name: str = "text-dedup-spark",
    master: str | None = None,
    conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession. ``master`` defaults to
    ``$SPARK_GRAFT_MASTER`` or ``local[$SPARK_GRAFT_CPUS]``."""
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    merged = {**DEFAULT_CONF, **(conf or {})}
    for k, v in merged.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
