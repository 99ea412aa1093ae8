"""North-star end-to-end: raw web-page table (html binary) -> byte-identical
extraction -> MinHash dedup, ids from xxhash64(url)."""

import pytest
from pyspark.sql import functions as F

from tests.oracles import minhash_oracle
from text_dedup_spark.kernels.minhash_kernel import MinHashKernel
from text_dedup_spark.operators.ids import CLUSTER_COL, INDEX_COL
from text_dedup_spark.sources.web_pages import make_web_pages
from text_dedup_spark.web_pipeline import dedup_web_pages, extract_stage


@pytest.fixture(scope="module")
def raw_pages(spark):
    corpus = make_web_pages(n_docs=300, seed=11)
    return spark.createDataFrame(corpus.pages), corpus


def test_extraction_invariant_metric(spark, raw_pages):
    df, _ = raw_pages
    ext = extract_stage(df)
    assert ext.where(F.col("__ext_mismatch__") == 1).count() == 0
    # corrupt one html payload -> metric catches it
    bad = df.withColumn(
        "html",
        F.when(F.col("url").endswith("/p/0"), F.lit(b"<garbage>")).otherwise(F.col("html")),
    )
    assert extract_stage(bad).where(F.col("__ext_mismatch__") == 1).count() == 1


def test_hash_ids_dedup_matches_oracle_pairs(spark, raw_pages):
    """With xxhash64(url) ids the ID VALUES differ from the reference's
    ordinals, but the dup-pair structure must match the oracle run on the
    same texts keyed by url."""
    df, corpus = raw_pages
    kernel = MinHashKernel(num_perm=64, ngram_size=2, min_length=5, threshold=0.5)
    res = dedup_web_pages(df, kernel, id_mode="hash")

    rows = res.dedup.docs.select("url", INDEX_COL, CLUSTER_COL).collect()
    # cluster partition by url
    url_to_cluster = {r["url"]: r[CLUSTER_COL] for r in rows}

    texts = list(corpus.pages["text"])
    urls = list(corpus.pages["url"])
    parents, kept = minhash_oracle(texts, kernel)

    def partition_pairs(url_label: dict) -> set:
        from collections import defaultdict

        groups = defaultdict(set)
        for u, c in url_label.items():
            groups[c].add(u)
        out = set()
        for members in groups.values():
            ms = sorted(members)
            for i in range(len(ms)):
                for j in range(i + 1, len(ms)):
                    out.add((ms[i], ms[j]))
        return out

    oracle_labels = {urls[i]: parents.get(i, i) for i in range(len(urls)) if i in kept or i in parents or True}
    # restrict both sides to docs that pass the min-length filter (present in spark output)
    spark_urls = set(url_to_cluster)
    oracle_labels = {u: c for u, c in oracle_labels.items() if u in spark_urls}
    got_pairs = partition_pairs(url_to_cluster)
    exp_pairs = partition_pairs(oracle_labels)
    assert got_pairs == exp_pairs


def test_order_ids_match_oracle_exactly(spark, raw_pages):
    """With order ids over url... the oracle indexes by pandas row order;
    urls embed the row index so sorting by url is NOT row order — instead
    assign order ids over the original order via the oracle's own urls."""
    df, corpus = raw_pages
    kernel = MinHashKernel(num_perm=64, ngram_size=2, min_length=5, threshold=0.5)
    # deterministic order ids equal to planted row index parsed from the url
    with_ids = extract_stage(df).withColumn(
        INDEX_COL, F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
    )
    from text_dedup_spark.operators.minhash import minhash_dedup

    res = minhash_dedup(with_ids, kernel, text_col="extracted_text")
    got = {r[INDEX_COL]: r[CLUSTER_COL] for r in res.docs.collect()}
    parents, _ = minhash_oracle(list(corpus.pages["text"]), kernel)
    for idx, c in got.items():
        assert parents.get(idx, idx) == c
