"""End-to-end quality floors: planted-truth corpus through the FULL Spark
pipelines (fingerprint UDF -> LSH/bucket joins -> distributed CC -> assign),
evaluated with the reference's own metric math (evaluation.py golden-tested).

Floors are pinned against the reference README quality envelope
(CORE minhash macro-F1 0.9518 / simhash 0.8515; NEWS ARI 0.7293 / 0.6463)
at the CORE-like 5% noise level."""

import pytest

from text_dedup_spark.quality import make_planted_corpus, run_quality


@pytest.fixture(scope="module")
def embedding_quality(spark, tmp_path_factory):
    from text_dedup_spark.quality import (
        make_planted_embedding_corpus,
        run_embedding_quality,
    )

    emb, labels = make_planted_embedding_corpus(spark, n_clusters=300)
    return run_embedding_quality(
        spark, emb, labels, str(tmp_path_factory.mktemp("embq")), threshold=0.9
    )


class TestEmbeddingQualityFloors:
    """End-to-end cluster-quality floors for the embedding-cosine path,
    through the TOML pipeline (algorithm_name="embedding") — closes the
    round-4 gap where the embedding path had candidate-recall pins but no
    cluster-quality floor. Planted noise=0.04 puts member-member cosine
    ~0.95 against a 0.9 threshold."""

    def test_exact_path_floors(self, embedding_quality):
        m = embedding_quality["exact"]
        assert m["candidate_mode"] == "auto"
        assert m["macro_f1"] >= 0.95, m
        assert m["ari"] >= 0.95, m

    def test_lsh_scale_path_floors(self, embedding_quality):
        m = embedding_quality["lsh"]
        assert m["candidate_mode"] == "lsh"
        assert m["macro_f1"] >= 0.95, m
        assert m["ari"] >= 0.95, m

    def test_lsh_tracks_exact(self, embedding_quality):
        # the scale path may only lose candidate recall, never invent pairs:
        # its quality must track the exact path within a small margin
        ex, lsh = embedding_quality["exact"], embedding_quality["lsh"]
        assert lsh["macro_f1"] >= ex["macro_f1"] - 0.02, (ex, lsh)
        assert lsh["ari"] >= ex["ari"] - 0.02, (ex, lsh)


@pytest.fixture(scope="module")
def quality_result(spark):
    docs, labels = make_planted_corpus(spark, n_clusters=400, perturb=0.05)
    docs = docs.cache()
    docs.count()
    res = run_quality(spark, docs, labels)
    docs.unpersist()
    return res


class TestQualityFloors:
    def test_minhash_core_style(self, quality_result):
        m = quality_result["minhash"]
        assert m["macro_f1"] >= 0.95, m
        assert m["accuracy"] >= 0.92, m

    def test_minhash_news_style_ari(self, quality_result):
        assert quality_result["minhash"]["ari"] >= 0.95, quality_result["minhash"]

    def test_simhash_core_style(self, quality_result):
        m = quality_result["simhash"]
        assert m["macro_f1"] >= 0.75, m  # reference CORE simhash: 0.8515

    def test_simhash_news_style_ari(self, quality_result):
        # reference NEWS simhash ARI: 0.6463
        assert quality_result["simhash"]["ari"] >= 0.65, quality_result["simhash"]

    def test_deterministic_corpus_embedding(self, spark):
        from text_dedup_spark.quality import make_planted_embedding_corpus

        a, la = make_planted_embedding_corpus(spark, n_clusters=40)
        b, lb = make_planted_embedding_corpus(spark, n_clusters=40)
        assert la == lb
        assert [r["embedding"] for r in a.collect()] == [
            r["embedding"] for r in b.collect()
        ]

    def test_deterministic_corpus(self, spark):
        a, la = make_planted_corpus(spark, n_clusters=50)
        b, lb = make_planted_corpus(spark, n_clusters=50)
        assert la == lb
        assert [r["text"] for r in a.collect()] == [r["text"] for r in b.collect()]
