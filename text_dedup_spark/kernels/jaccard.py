"""Jaccard similarity, identical to reference ``src/text_dedup/utils/jaccard.py:9-30``."""

from __future__ import annotations


def jaccard_similarity(doc1: set, doc2: set) -> float:
    """|A∩B| / |A∪B|; empty union -> 1.0 (reference edge case)."""
    if (union_size := len(doc1 | doc2)) == 0:
        return 1.0
    return len(doc1 & doc2) / union_size
