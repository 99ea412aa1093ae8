"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., "docs_per_sec": ...}

The dedup queries dominate; docs_per_sec is documents processed by the
flagship minhash_dedup per second (throughput figure for BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "exact_dedup_groups",
    "token_stats",
    "lang_marker_profile",
    "ngram_jaccard_pairs",
    "ann_lsh_topk",
    "minhash_dedup",
    "minhash_dedup_verified",
    "simhash_dedup",
    "suffix_dedup",
    "embedding_dedup",
    "events_sessionize",
    "events_minutely",
    "lineitem_pricing_summary",
]


def main() -> None:
    import __spark_entry__ as entry_mod
    from text_dedup_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "bench",
        master=f"local[{cpus}]",
        conf={"spark.sql.shuffle.partitions": str(max(int(cpus), 8))},
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry_mod.queries()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = queries[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]:.2f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline query wall time (dedup + text analytics + ANN)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "docs_per_sec": round(n_docs / timings["minhash_dedup"], 1),
        "cpus": int(cpus),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
