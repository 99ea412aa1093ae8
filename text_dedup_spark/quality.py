"""End-to-end quality harness: planted-truth corpus -> full Spark pipelines
-> CORE-style macro-F1 / NEWS-style ARI.

The reference publishes benchmark quality on two public datasets
(``README.md:180-214``; harness at ``benchmarks/run_benchmark.py:112-130``,
metrics at ``benchmark_core.py:52-115`` / ``benchmark_news.py:40-57``).
Those datasets aren't available here, so the same metric math
(evaluation.py, golden-tested) runs over a deterministic synthetic corpus
with planted duplicate clusters — every pipeline stage is the real Spark
path (fingerprint UDFs, LSH/bucket joins, distributed CC, assignment).

``tools/quality_bench.py`` prints the table; tests pin quality floors.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from text_dedup_spark.evaluation import (
    clusters_to_predictions_minhash,
    evaluate_clustering,
    evaluate_predictions,
)
from text_dedup_spark.operators.ids import CLUSTER_COL, DUPLICATE_COL, INDEX_COL


def make_planted_corpus(
    spark: SparkSession,
    n_clusters: int = 400,
    max_cluster_size: int = 5,
    dup_fraction: float = 0.35,
    perturb: float = 0.08,
    seed: int = 1234,
) -> tuple[DataFrame, list[int]]:
    """Deterministic corpus with planted near-duplicate clusters.

    Returns (docs DataFrame with __INDEX__/text, ground-truth label list
    indexed by __INDEX__). A fraction ``dup_fraction`` of clusters have
    size >= 2; members are ``perturb``-fraction word substitutions of the
    cluster base (Jaccard ~>0.6 at 2-gram shingles — inside the reference
    CORE config's detection envelope)."""
    rng = np.random.RandomState(seed)
    vocab = [f"word{i}" for i in range(2000)]

    def base_doc() -> list[str]:
        n = rng.randint(40, 160)
        return [vocab[i] for i in rng.randint(0, len(vocab), size=n)]

    texts: list[str] = []
    labels: list[int] = []
    for c in range(n_clusters):
        toks = base_doc()
        size = 1
        if rng.rand() < dup_fraction:
            size = int(rng.randint(2, max_cluster_size + 1))
        for _ in range(size):
            member = list(toks)
            n_edit = int(len(member) * perturb * rng.rand())
            for pos in rng.randint(0, len(member), size=n_edit):
                member[pos] = vocab[rng.randint(0, len(vocab))]
            texts.append(" ".join(member))
            labels.append(c)
    order = rng.permutation(len(texts))
    texts = [texts[i] for i in order]
    labels = [labels[i] for i in order]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], f"{INDEX_COL} long, text string"
    )
    return df, labels


def make_planted_embedding_corpus(
    spark: SparkSession,
    n_clusters: int = 300,
    max_cluster_size: int = 4,
    dup_fraction: float = 0.35,
    dim: int = 32,
    noise: float = 0.04,
    seed: int = 7,
) -> tuple[DataFrame, list[int]]:
    """Deterministic embedding corpus with planted near-duplicate clusters
    (the FIXTURES.md planted-noise pattern, vector edition).

    Each cluster's members are unit-normalized ``base + noise * randn``
    perturbations of a shared random unit base — expected member-member
    cosine ~ 1/(1 + noise^2 * dim) (~0.95 at the defaults), while random
    cross-cluster cosines concentrate near 0 +- 1/sqrt(dim), so a 0.9
    threshold separates them with margin. Returns (DataFrame with
    __INDEX__/embedding, ground-truth label list indexed by __INDEX__)."""
    rng = np.random.RandomState(seed)
    vecs: list[list[float]] = []
    labels: list[int] = []
    for c in range(n_clusters):
        base = rng.randn(dim)
        base /= np.linalg.norm(base)
        size = 1
        if rng.rand() < dup_fraction:
            size = int(rng.randint(2, max_cluster_size + 1))
        for _ in range(size):
            v = base + noise * rng.randn(dim)
            v = v / np.linalg.norm(v)
            vecs.append([float(x) for x in v])
            labels.append(c)
    order = rng.permutation(len(vecs))
    vecs = [vecs[i] for i in order]
    labels = [labels[i] for i in order]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        f"{INDEX_COL} long, embedding array<float>",
    )
    return df, labels


def run_embedding_quality(
    spark: SparkSession,
    emb: DataFrame,
    labels: list[int],
    work_dir: str,
    threshold: float = 0.9,
) -> dict:
    """Embedding-cosine dedup quality through the TOML-driven pipeline
    (``algorithm_name="embedding"``), both physical paths: parity
    (candidate_mode auto -> exact all-pairs under the gate) and
    profile="scale" (LSH candidates + exact confirm). Returns CORE-style
    macro-F1/accuracy + ARI per path, so the scale path's cluster quality
    is pinned end to end, not just its candidate recall."""
    from pathlib import Path

    from text_dedup_spark.config import load_config
    from text_dedup_spark.pipeline import run_pipeline

    wd = Path(work_dir)
    wd.mkdir(parents=True, exist_ok=True)
    emb_path = wd / "emb"
    emb.write.mode("overwrite").parquet(str(emb_path))

    out: dict = {"n_docs": len(labels)}
    for tag, profile_line in (("exact", ""), ("lsh", 'profile = "scale"')):
        outdir = wd / f"out_{tag}"
        cfg = f"""
[input]
input_type = "local_files"
file_type = "parquet"
[input.read_arguments]
path = "{emb_path}"

[algorithm]
algorithm_name = "embedding"
index_column = "{INDEX_COL}"
embedding_column = "embedding"
cosine_threshold = {threshold}
candidate_mode = "auto"
{profile_line}

[output]
output_dir = "{outdir}"
save_clusters = true
keep_cluster_column = true
"""
        cfgp = wd / f"config_{tag}.toml"
        cfgp.write_text(cfg)
        summary = run_pipeline(load_config(str(cfgp)), spark=spark)
        mapping = {
            r["id"]: r["cluster"]
            for r in spark.read.parquet(str(outdir / "clusters")).collect()
        }
        res = _core_metrics(mapping, labels)
        res["ari"] = evaluate_clustering(labels, mapping)
        res["candidate_mode"] = summary["embedding_candidate_mode"]
        out[tag] = res
    return out


def _core_metrics(cluster_mapping: dict[int, int], labels: list[int]) -> dict:
    """CORE-style evaluation (reference benchmark_core.py): gt duplicates per
    doc are its co-labeled docs; predictions decode from cluster groups."""
    id_to_core = {i: f"c{i}" for i in range(len(labels))}
    by_label: dict[int, set[str]] = {}
    for i, lab in enumerate(labels):
        by_label.setdefault(lab, set()).add(id_to_core[i])
    gt = {id_to_core[i]: by_label[lab] - {id_to_core[i]} for i, lab in enumerate(labels)}
    preds = clusters_to_predictions_minhash(cluster_mapping, id_to_core)
    return evaluate_predictions(gt, preds)


def run_quality(
    spark: SparkSession,
    docs: DataFrame,
    labels: list[int],
    num_perm: int = 200,
    bands: int = 50,
    rows: int = 4,
    ngram_minhash: int = 2,
    simhash_bit_diff: int = 7,
    simhash_num_bucket: int = 8,
) -> dict:
    """Full-pipeline quality: MinHash (reference CORE config) and SimHash
    (reference benchmark_core_simhash config) -> macro-F1/accuracy + ARI."""
    from text_dedup_spark.kernels.minhash_kernel import MinHashKernel
    from text_dedup_spark.kernels.simhash_kernel import SimHashKernel
    from text_dedup_spark.operators.minhash import minhash_dedup
    from text_dedup_spark.operators.simhash import simhash_dedup

    out: dict = {"n_docs": len(labels)}

    mh_kernel = MinHashKernel(
        num_perm=num_perm,
        ngram_size=ngram_minhash,
        min_length=0,
        threshold=0.5,
        bands=bands,
        rows=rows,
        seed=42,
    )
    mh = minhash_dedup(docs, mh_kernel, skip_filtering=True, repartition_input=16)
    mh_map = {
        r[INDEX_COL]: r[CLUSTER_COL]
        for r in mh.docs.select(INDEX_COL, CLUSTER_COL, DUPLICATE_COL).collect()
        if r[DUPLICATE_COL]
    }
    out["minhash"] = _core_metrics(mh_map, labels)
    out["minhash"]["ari"] = evaluate_clustering(labels, mh_map)

    sh_kernel = SimHashKernel(
        f=64,
        bit_diff=simhash_bit_diff,
        num_bucket=simhash_num_bucket,
        ngram_size=1,
        min_length=0,
        seed=42,
    )
    sh = simhash_dedup(docs, sh_kernel, skip_filtering=True, repartition_input=16)
    sh_map = {
        r[INDEX_COL]: r[CLUSTER_COL]
        for r in sh.docs.select(INDEX_COL, CLUSTER_COL, DUPLICATE_COL).collect()
        if r[DUPLICATE_COL]
    }
    out["simhash"] = _core_metrics(sh_map, labels)
    out["simhash"]["ari"] = evaluate_clustering(labels, sh_map)
    return out
