"""End-to-end quality benchmark (the reference's run_benchmark analogue):
planted-truth corpus -> full Spark MinHash + SimHash pipelines ->
CORE-style macro-F1/accuracy + NEWS-style ARI. Prints one JSON line.

Usage: python tools/quality_bench.py [n_clusters]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    from text_dedup_spark.quality import make_planted_corpus, run_quality
    from text_dedup_spark.session import get_spark

    n_clusters = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    spark = get_spark(
        "quality-bench", conf={"spark.sql.shuffle.partitions": "32"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n_clusters": n_clusters}
    # two noise levels: 5% word substitution (CORE-like near-dups) and 8%
    # (stress — outside SimHash's Hamming envelope, by design)
    for tag, perturb in (("perturb_05", 0.05), ("perturb_08", 0.08)):
        docs, labels = make_planted_corpus(spark, n_clusters=n_clusters, perturb=perturb)
        docs = docs.cache()
        docs.count()
        t0 = time.time()
        res = run_quality(spark, docs, labels)
        res["wall_sec"] = round(time.time() - t0, 2)
        out[tag] = res
        docs.unpersist()
    # embedding-cosine path (beyond-reference): planted vector clusters at
    # noise=0.04 (member cosine ~0.95 vs threshold 0.9), both physical paths
    from tempfile import mkdtemp

    from text_dedup_spark.quality import (
        make_planted_embedding_corpus,
        run_embedding_quality,
    )

    emb, elabels = make_planted_embedding_corpus(spark, n_clusters=n_clusters)
    t0 = time.time()
    eres = run_embedding_quality(spark, emb, elabels, mkdtemp(prefix="embq_"))
    eres["wall_sec"] = round(time.time() - t0, 2)
    out["embedding_noise_004"] = eres
    out["reference_readme"] = {
        "core_minhash": {"macro_f1": 0.9518, "accuracy": 0.9277},
        "core_simhash": {"macro_f1": 0.8515, "accuracy": 0.8375},
        "news_minhash_ari": 0.7293,
        "news_simhash_ari": 0.6463,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
