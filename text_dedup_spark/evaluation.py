"""Benchmark evaluation harness — exact port of the reference metric math.

Reference: ``benchmarks/utils.py`` (precision/recall/f1/classification at
:66-92, cluster->prediction decodings at :95-171), ``benchmarks/
benchmark_core.py:52-115`` (TP/FP/TN/FN + macro metrics),
``benchmarks/benchmark_news.py:40-57`` (ARI, singleton default
``predictions.get(i, i)``). ARI is hand-rolled (sklearn unavailable here)
using the standard pair-counting formula.
"""

from __future__ import annotations

from collections import Counter, defaultdict


def precision(duplicates: set, predictions: set) -> float:
    if len(predictions) == 0:
        return 0.0
    return len(duplicates & predictions) / len(predictions)


def recall(duplicates: set, predictions: set) -> float:
    if len(duplicates) == 0:
        return 1.0
    return len(duplicates & predictions) / len(duplicates)


def f1_score(precision_val: float, recall_val: float) -> float:
    if precision_val + recall_val == 0:
        return 0.0
    return 2 * precision_val * recall_val / (precision_val + recall_val)


def classify_prediction(duplicates: set, predictions: set) -> str:
    """TP requires gt ⊆ predicted (reference ``utils.py:66-92``)."""
    if len(predictions) == 0:
        return "TN" if len(duplicates) == 0 else "FN"
    if len(duplicates) > 0 and duplicates.issubset(predictions):
        return "TP"
    return "FP"


def clusters_to_predictions_minhash(
    cluster_mapping: dict[int, int], id_to_core_id: dict[int, str]
) -> dict[str, set[str]]:
    """{doc_idx: cluster_group_id} -> {core_id: other core_ids in cluster}."""
    cluster_to_docs: dict[int, set[str]] = defaultdict(set)
    for doc_idx, cluster_id in cluster_mapping.items():
        core_id = id_to_core_id.get(doc_idx)
        if core_id:
            cluster_to_docs[cluster_id].add(core_id)
    predictions: dict[str, set[str]] = {}
    for doc_idx, cluster_id in cluster_mapping.items():
        core_id = id_to_core_id.get(doc_idx)
        if core_id:
            predictions[core_id] = cluster_to_docs[cluster_id] - {core_id}
    return predictions


def clusters_to_predictions_simhash(
    cluster_mapping: dict[int, int], id_to_core_id: dict[int, str]
) -> dict[str, set[str]]:
    """{child_idx: parent_idx} (parent IS a doc id) -> prediction sets."""
    cluster_to_docs: dict[str, set[str]] = defaultdict(set)
    for child_idx, parent_idx in cluster_mapping.items():
        child_core_id = id_to_core_id.get(child_idx)
        parent_core_id = id_to_core_id.get(parent_idx)
        if child_core_id and parent_core_id:
            cluster_to_docs[parent_core_id].add(child_core_id)
            cluster_to_docs[parent_core_id].add(parent_core_id)
    predictions: dict[str, set[str]] = {}
    for members in cluster_to_docs.values():
        for doc_id in members:
            predictions[doc_id] = members - {doc_id}
    return predictions


def evaluate_predictions(
    labels: dict[str, set[str]], predictions: dict[str, set[str]]
) -> dict:
    """CORE-style evaluation (reference ``benchmark_core.py:52-115``)."""
    classifications = []
    exact_matches = []
    for doc_id in labels:
        gt = labels.get(doc_id, set())
        pred = predictions.get(doc_id, set())
        classifications.append(classify_prediction(gt, pred))
        exact_matches.append(gt == pred)
    counts = Counter(classifications)
    tp, tn, fp, fn = counts["TP"], counts["TN"], counts["FP"], counts["FN"]
    dup_precision = tp / (tp + fp) if (tp + fp) > 0 else 0.0
    dup_recall = tp / (tp + fn) if (tp + fn) > 0 else 0.0
    non_dup_precision = tn / (tn + fn) if (tn + fn) > 0 else 0.0
    non_dup_recall = tn / (tn + fp) if (tn + fp) > 0 else 0.0
    return {
        "precision_duplicates": dup_precision,
        "recall_duplicates": dup_recall,
        "precision_non_duplicates": non_dup_precision,
        "recall_non_duplicates": non_dup_recall,
        # reference keeps the (misnamed) macro_f1 key for compatibility
        "macro_f1": (dup_precision + non_dup_precision) / 2,
        "accuracy": sum(exact_matches) / len(exact_matches) if exact_matches else 0.0,
        "class_distribution": dict(counts),
    }


def adjusted_rand_index(labels_true: list, labels_pred: list) -> float:
    """Standard pair-counting ARI (Hubert & Arabie 1985); replaces
    sklearn.metrics.adjusted_rand_score."""
    if len(labels_true) != len(labels_pred):
        raise ValueError("label lists must have the same length")
    n = len(labels_true)
    if n == 0:
        return 1.0

    def comb2(x: int) -> int:
        return x * (x - 1) // 2

    contingency: Counter = Counter(zip(labels_true, labels_pred, strict=True))
    a = Counter(labels_true)
    b = Counter(labels_pred)
    sum_ij = sum(comb2(v) for v in contingency.values())
    sum_a = sum(comb2(v) for v in a.values())
    sum_b = sum(comb2(v) for v in b.values())
    total = comb2(n)
    expected = sum_a * sum_b / total if total else 0.0
    max_index = (sum_a + sum_b) / 2
    if max_index == expected:
        return 1.0
    return (sum_ij - expected) / (max_index - expected)


def evaluate_clustering(ground_truth: list[int], predictions: dict[int, int]) -> float:
    """NEWS-COPY-style ARI with the singleton default ``predictions.get(i, i)``
    (reference ``benchmark_news.py:40-57``)."""
    pred_labels = [predictions.get(i, i) for i in range(len(ground_truth))]
    return adjusted_rand_index(ground_truth, pred_labels)
