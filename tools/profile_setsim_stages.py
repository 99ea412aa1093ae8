"""Stage-attribution profile of ngram_jaccard_pairs at sf0.1 (round-5 task:
10.5 s -> <= 8 s warm median; BENCH_r04 made it 21% of the headline).

Materializes each stage of the PPJoin pipeline behind a count in one warm
session so the wall decomposes: gram build, postings+df, prefix ranking,
candidate join, verification. Run AFTER the box is quiet.

Usage: python tools/profile_setsim_stages.py [sf_dir] [cpus]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from text_dedup_spark.functions.text_stats import word_ngrams_from_tokens
    from text_dedup_spark.session import get_spark

    spark = get_spark(
        "profile-setsim",
        master=f"local[{cpus}]",
        conf={"spark.sql.shuffle.partitions": str(max(cpus, 8))},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py
    spark.range(cpus * 2).repartition(cpus * 2).mapInPandas(
        lambda it: it, "id long"
    ).count()

    phases: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.time()
        out = fn()
        phases[name] = round(time.time() - t0, 2)
        print(f"# {name}: {phases[name]}s -> {out}", file=sys.stderr)
        return out

    threshold = 0.5
    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .repartition(spark.sparkContext.defaultParallelism, F.col("doc_id"))
        .select(F.col("doc_id"), F.split(F.col("text"), " ").alias("toks"))
        .select(
            F.col("doc_id"), word_ngrams_from_tokens(F.col("toks"), 3).alias("grams")
        )
    )
    sized = (
        d.select("doc_id", "grams", F.size("grams").cast("bigint").alias("sz"))
        .where(F.col("sz") > 0)
        .persist()
    )
    timed("gram_build", sized.count)

    postings = sized.select(
        "doc_id", "sz", F.explode("grams").alias("__g__")
    ).select("doc_id", "sz", F.xxhash64("__g__").alias("gram"))
    timed("postings_count", postings.count)

    freq = postings.groupBy("gram").agg(F.count(F.lit(1)).alias("df")).persist()
    timed("freq", freq.count)

    ranked = postings.join(freq, "gram").withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("gram"))),
    )
    prefix = ranked.where(
        F.col("rn") <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
    ).persist()
    timed("prefix_rank", prefix.count)

    a = prefix.select("gram", F.col("doc_id").alias("a_id"), F.col("sz").alias("sza"))
    b = prefix.select("gram", F.col("doc_id").alias("b_id"), F.col("sz").alias("szb"))
    cand = (
        a.join(b, "gram")
        .where(F.col("a_id") < F.col("b_id"))
        .where(
            F.least("sza", "szb") >= F.ceil(F.lit(threshold) * F.greatest("sza", "szb"))
        )
        .select("a_id", "b_id")
        .distinct()
        .persist()
    )
    timed("cand_join", cand.count)

    ga = sized.select(F.col("doc_id").alias("a_id"), F.col("grams").alias("ga"),
                      F.col("sz").alias("sza"))
    gb = sized.select(F.col("doc_id").alias("b_id"), F.col("grams").alias("gb"),
                      F.col("sz").alias("szb"))
    inter = F.size(F.array_intersect("ga", "gb")).cast("bigint")
    result = (
        cand.join(ga, "a_id")
        .join(gb, "b_id")
        .withColumn("inter_size", inter)
        .withColumn("union_size", F.col("sza") + F.col("szb") - F.col("inter_size"))
        .where(F.col("inter_size") * 2 >= F.col("union_size"))
        .select("a_id", "b_id", "inter_size", "union_size")
    )
    timed("verify", result.count)

    print(json.dumps({"cpus": cpus, "sf": sf_dir, "phases": phases}))
    spark.stop()


if __name__ == "__main__":
    main()
