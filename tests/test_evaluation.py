"""Evaluation-harness tests ported from reference
``tests/test_benchmarks/test_utils.py`` + ARI sanity checks, plus an
end-to-end quality benchmark on the synthetic labeled corpus (the in-repo
stand-in for the reference's CORE/NEWS-COPY published tables)."""

import pytest

from text_dedup_spark.evaluation import (
    adjusted_rand_index,
    classify_prediction,
    clusters_to_predictions_minhash,
    clusters_to_predictions_simhash,
    evaluate_clustering,
    evaluate_predictions,
    f1_score,
    precision,
    recall,
)


class TestPrecisionRecallF1:
    # golden table from reference tests/test_benchmarks/test_utils.py
    @pytest.mark.parametrize(
        ("dups", "preds", "p", "r"),
        [
            ({"a", "b", "c"}, {"a", "b", "c"}, 1.0, 1.0),
            ({"a", "b"}, {"a", "b", "c", "d"}, 0.5, 1.0),
            ({"a", "b"}, {"c", "d"}, 0.0, 0.0),
            ({"a", "b"}, set(), 0.0, 0.0),
            (set(), {"a", "b"}, 0.0, 1.0),
            (set(), set(), 0.0, 1.0),
            ({"a", "b", "c", "d"}, {"a", "b"}, 1.0, 0.5),
            ({"a", "b", "c"}, {"b", "c", "d", "e"}, 0.5, 2 / 3),
        ],
    )
    def test_golden(self, dups, preds, p, r):
        assert precision(dups, preds) == pytest.approx(p)
        assert recall(dups, preds) == pytest.approx(r)

    def test_f1(self):
        assert f1_score(1.0, 1.0) == 1.0
        assert f1_score(0.0, 0.0) == 0.0
        assert f1_score(0.5, 1.0) == pytest.approx(2 / 3)


class TestClassification:
    @pytest.mark.parametrize(
        ("dups", "preds", "expected"),
        [
            (set(), set(), "TN"),
            ({"a"}, set(), "FN"),
            ({"a"}, {"a"}, "TP"),
            ({"a"}, {"a", "b"}, "TP"),  # gt subset of predicted -> TP
            ({"a", "b"}, {"a"}, "FP"),  # gt not subset -> FP
            (set(), {"a"}, "FP"),
        ],
    )
    def test_classify(self, dups, preds, expected):
        assert classify_prediction(dups, preds) == expected


class TestDecodings:
    def test_minhash_decoding(self):
        # group ids are arbitrary, not doc ids
        mapping = {0: 100, 1: 100, 2: 200}
        id_to_core = {0: "A", 1: "B", 2: "C"}
        preds = clusters_to_predictions_minhash(mapping, id_to_core)
        assert preds == {"A": {"B"}, "B": {"A"}, "C": set()}

    def test_simhash_decoding(self):
        # parent IS a doc id; only children are in the mapping
        mapping = {1: 0, 2: 0}
        id_to_core = {0: "A", 1: "B", 2: "C"}
        preds = clusters_to_predictions_simhash(mapping, id_to_core)
        assert preds == {"A": {"B", "C"}, "B": {"A", "C"}, "C": {"A", "B"}}


class TestEvaluatePredictions:
    def test_perfect(self):
        labels = {"A": {"B"}, "B": {"A"}, "C": set()}
        metrics = evaluate_predictions(labels, dict(labels))
        assert metrics["accuracy"] == 1.0
        assert metrics["macro_f1"] == 1.0
        assert metrics["class_distribution"] == {"TP": 2, "TN": 1}

    def test_mixed(self):
        labels = {"A": {"B"}, "B": {"A"}, "C": set(), "D": {"E"}, "E": {"D"}}
        preds = {"A": {"B"}, "B": {"A"}, "C": {"A"}, "D": set(), "E": set()}
        m = evaluate_predictions(labels, preds)
        assert m["class_distribution"] == {"TP": 2, "FP": 1, "FN": 2}
        assert m["precision_duplicates"] == pytest.approx(2 / 3)
        assert m["recall_duplicates"] == pytest.approx(0.5)


class TestARI:
    def test_identical(self):
        assert adjusted_rand_index([0, 0, 1, 1], [1, 1, 0, 0]) == 1.0

    def test_known_value(self):
        # classic sklearn doc example: ARI([0,0,1,2],[0,0,1,1]) == 0.5714...
        assert adjusted_rand_index([0, 0, 1, 2], [0, 0, 1, 1]) == pytest.approx(
            0.5714285714285714
        )

    def test_independent_labels_near_zero(self):
        got = adjusted_rand_index([0, 0, 1, 1], [0, 1, 0, 1])
        assert got == pytest.approx(-0.5)

    def test_singleton_default(self):
        gt = [0, 0, 5, 5]
        preds = {0: 0, 1: 0}  # 2,3 default to themselves -> split the 5-cluster
        got = evaluate_clustering(gt, preds)
        assert got < 1.0
        assert evaluate_clustering(gt, {0: 0, 1: 0, 2: 9, 3: 9}) == 1.0


class TestEndToEndQuality:
    """Quality benchmark on the planted synthetic corpus: the analogue of the
    reference's CORE/NEWS published tables (BASELINE.md)."""

    def test_minhash_quality_on_planted_clusters(self):
        from collections import defaultdict

        from tests.oracles import minhash_oracle
        from text_dedup_spark.kernels.minhash_kernel import MinHashKernel
        from text_dedup_spark.sources.web_pages import make_web_pages

        corpus = make_web_pages(n_docs=600, seed=7)
        texts = list(corpus.pages["text"])
        truth = list(corpus.truth["cluster_label"])

        kernel = MinHashKernel(num_perm=128, ngram_size=2, min_length=5, threshold=0.5)
        parents, _ = minhash_oracle(texts, kernel, check_false_positive=True)

        ari = evaluate_clustering(truth, parents)
        assert ari > 0.9, f"ARI too low: {ari}"

        # CORE-style: per-doc duplicate sets (only >=2-sized planted clusters)
        by_label = defaultdict(set)
        for i, lbl in enumerate(truth):
            by_label[lbl].add(str(i))
        labels = {str(i): by_label[truth[i]] - {str(i)} for i in range(len(texts))}
        id_to_core = {i: str(i) for i in range(len(texts))}
        preds = clusters_to_predictions_minhash(parents, id_to_core)
        m = evaluate_predictions(labels, preds)
        # planted mutations include 20% below-threshold decoys straddling the
        # 0.5 Jaccard threshold, so exact-set precision is bounded; assert
        # strong-but-realistic bars (observed: macro 0.81, dup-recall 0.92)
        assert m["macro_f1"] > 0.75, m
        assert m["recall_duplicates"] > 0.9, m
