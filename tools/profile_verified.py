"""Stage-attribution profile of minhash_dedup_verified at sf0.1 (round-5
task: 7.1 s -> <= 5 s warm median).

Times the base dedup, then each stage of check_false_positives separately
(contraction, rep gram UDF, pair join + JVM Jaccard, membership + regroup,
reassignment) in one warm session. Run on a quiet box.

Usage: python tools/profile_verified.py [sf_dir] [cpus] [contraction]
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
    contraction = sys.argv[3] if len(sys.argv) > 3 else "window"

    from pyspark.sql import functions as F

    from text_dedup_spark.kernels.minhash_kernel import MinHashKernel
    from text_dedup_spark.operators.ids import CLUSTER_COL, DUPLICATE_COL, INDEX_COL
    from text_dedup_spark.operators.minhash import (
        _contract_text_groups,
        gram_set_udf,
        jaccard_ge_expr,
        minhash_dedup,
    )
    from text_dedup_spark.session import get_spark

    spark = get_spark(
        "profile-verified",
        master=f"local[{cpus}]",
        conf={"spark.sql.shuffle.partitions": str(max(cpus, 8))},
    )
    spark.sparkContext.setLogLevel("ERROR")
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

    kernel = MinHashKernel(num_perm=64, ngram_size=2, min_length=5, threshold=0.5, seed=42)
    docs_src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    res = timed(
        "base_dedup_build",
        lambda: minhash_dedup(
            docs_src, kernel, id_col="doc_id", check_false_positive=False,
            repartition_input=n_parts,
        ),
    )
    assigned = res.docs.persist()
    timed("base_dedup_count", assigned.count)

    cand = assigned.where(F.col(DUPLICATE_COL)).select(INDEX_COL, "text", CLUSTER_COL)
    cand = _contract_text_groups(cand, "text", contraction).persist()
    timed("contract", cand.count)

    reps = cand.where(F.col(INDEX_COL) == F.col("__trep__")).withColumn(
        "__G__", gram_set_udf(kernel.ngram_size, kernel.min_length)(F.col("text"))
    ).persist()
    timed("rep_grams", reps.count)

    left = reps.select(CLUSTER_COL, F.col(INDEX_COL).alias("id1"), F.col("__G__").alias("g1"))
    right = reps.select(CLUSTER_COL, F.col(INDEX_COL).alias("id2"), F.col("__G__").alias("g2"))
    pairs = left.join(right, CLUSTER_COL).where(F.col("id1") < F.col("id2"))
    verified = pairs.where(jaccard_ge_expr(F.col("g1"), F.col("g2"), kernel.threshold))
    verified_reps = (
        verified.select(F.explode(F.array("id1", "id2")).alias("__trep__"))
        .distinct()
        .withColumn("__v__", F.lit(True))
        .persist()
    )
    timed("pair_jaccard", verified_reps.count)

    auto = F.col("__tsz__") >= 2
    members = (
        cand.join(verified_reps, "__trep__", "left")
        .where(auto | F.col("__v__").isNotNull())
        .select(F.col(INDEX_COL).alias("idx"), F.col(CLUSTER_COL))
    )
    new_map = (
        members.join(
            members.groupBy(CLUSTER_COL).agg(F.min("idx").alias("__newc__")), CLUSTER_COL
        ).select(F.col("idx").alias("id"), F.col("__newc__").alias("cluster"))
    )
    new_map = timed("members_regroup", lambda: new_map.localCheckpoint(eager=True))

    reassigned = (
        assigned.drop(CLUSTER_COL)
        .join(new_map.withColumnRenamed("id", INDEX_COL), INDEX_COL, "left")
        .withColumn(CLUSTER_COL, F.coalesce(F.col("cluster"), F.col(INDEX_COL)))
        .drop("cluster")
    )
    timed("reassign_count", reassigned.count)

    print(json.dumps({"cpus": cpus, "sf": sf_dir, "contraction": contraction,
                      "phases": phases}))
    spark.stop()


if __name__ == "__main__":
    main()
