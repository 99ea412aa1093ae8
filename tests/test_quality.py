"""End-to-end quality floors: planted-truth corpus through the FULL Spark
pipelines (fingerprint UDF -> LSH/bucket joins -> distributed CC -> assign),
evaluated with the reference's own metric math (evaluation.py golden-tested).

Floors are pinned against the reference README quality envelope
(CORE minhash macro-F1 0.9518 / simhash 0.8515; NEWS ARI 0.7293 / 0.6463)
at the CORE-like 5% noise level."""

import pytest

from text_dedup_spark.quality import make_planted_corpus, run_quality


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

    def test_deterministic_corpus(self, spark):
        a, la = make_planted_corpus(spark, n_clusters=50)
        b, lb = make_planted_corpus(spark, n_clusters=50)
        assert la == lb
        assert [r["text"] for r in a.collect()] == [r["text"] for r in b.collect()]
