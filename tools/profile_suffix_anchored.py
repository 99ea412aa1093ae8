"""Stage-attribution profile of the anchored-lossless suffix path at the
91 MB ladder size (round-5 task: 68.8 s vs 44.4 s global; target <= 1.25x).

Materializes each stage behind a count: winnowing-anchor UDF, postings,
roots+edges, CC grouping, the grouped text shuffle, and the per-group SA
pass — so the anchored-vs-global gap decomposes. Run on a quiet box.

Usage: python tools/profile_suffix_anchored.py [n_docs] [cpus]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from tools.suffix_ladder import DATA, ensure_corpus

    ensure_corpus(n_docs)

    from pyspark.sql import functions as F

    from text_dedup_spark.operators import suffix_dedup as sd
    from text_dedup_spark.operators.connected_components import connected_components
    from text_dedup_spark.session import get_spark

    spark = get_spark(
        "profile-sfx",
        master=f"local[{cpus}]",
        conf={
            "spark.sql.shuffle.partitions": str(cpus),
            "spark.driver.memory": "48g",
        },
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

    id_col, text_col = "doc_id", "text"
    length_threshold = 100
    anchor_w = 48
    winnow_window = length_threshold - anchor_w + 1

    df = spark.read.parquet(f"{DATA}/pages").select(id_col, text_col)
    slim = df.persist()
    timed("read", slim.count)

    import pandas as pd  # noqa: F401
    from pyspark.sql.types import ArrayType, LongType

    def _anchors_fn(texts):
        from text_dedup_spark.kernels.winnowing import winnow_anchors

        return texts.map(
            lambda t: sorted(
                winnow_anchors((t or "").encode("utf-8"), anchor_w, winnow_window)
            )
        )

    anchors = F.pandas_udf(_anchors_fn, ArrayType(LongType()))

    with_anchors = slim.withColumn("__ANCH__", anchors(F.col(text_col)))
    postings = with_anchors.select(
        F.col(id_col), F.explode("__ANCH__").alias("anchor")
    ).persist()
    timed("winnow_postings", postings.count)

    roots = (
        postings.groupBy("anchor")
        .agg(F.min(id_col).alias("__root__"), F.count(F.lit(1)).alias("__cnt__"))
        .where(F.col("__cnt__") > 1)
    )
    edges = (
        postings.join(roots, "anchor")
        .where(F.col(id_col) != F.col("__root__"))
        .select(F.col("__root__").alias("src"), F.col(id_col).alias("dst"))
    ).persist()
    timed("edges", edges.count)

    mapping = timed("cc", lambda: connected_components(edges))

    grouped = (
        slim.join(
            mapping.withColumnRenamed("id", id_col).withColumnRenamed(
                "cluster", "__grp__"
            ),
            id_col,
            "left",
        )
        .withColumn("__grp__", F.coalesce(F.col("__grp__"), F.col(id_col)))
        .persist()
    )
    timed("group_join", grouped.count)

    gsizes = timed(
        "group_stats",
        lambda: grouped.groupBy("__grp__")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length(F.encode(text_col, "utf-8"))).alias("b"),
        )
        .orderBy(F.desc("b"))
        .limit(8)
        .collect(),
    )
    print("# top groups:", [(r["n"], r["b"]) for r in gsizes], file=sys.stderr)

    def process(pdf: pd.DataFrame) -> pd.DataFrame:
        from text_dedup_spark.kernels.intervals import clean_up, restore_and_merge
        from text_dedup_spark.kernels.suffix_array_kernel import duplicate_byte_ranges

        pdf = pdf.sort_values(id_col)
        texts = pdf[text_col].tolist()
        encoded = [(t or "").encode("utf-8") for t in texts]
        boundaries = []
        start = 0
        for b in encoded:
            boundaries.append(slice(start, start + len(b)))
            start += len(b)
        ranges = duplicate_byte_ranges(b"".join(encoded), length_threshold)
        slices_per_doc, _ = restore_and_merge(
            boundaries, ranges, length_threshold, "longest"
        )
        cleaned = [
            clean_up(t or "", sl) for t, sl in zip(texts, slices_per_doc, strict=True)
        ]
        return pd.DataFrame({id_col: pdf[id_col].values, text_col: cleaned})

    rewritten = grouped.select("__grp__", id_col, text_col).groupBy("__grp__").applyInPandas(
        process, schema=f"{id_col} long, {text_col} string"
    )
    timed("per_group_sa", lambda: rewritten.localCheckpoint(eager=True).count())

    print(json.dumps({"cpus": cpus, "n_docs": n_docs, "phases": phases}))
    spark.stop()


if __name__ == "__main__":
    main()
