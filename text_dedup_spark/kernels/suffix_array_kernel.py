"""In-house suffix-array duplicate-substring extraction (numpy).

Replaces the reference's external google-research/deduplicate-text-datasets
subprocess chain (reference ``suffix_array.py:58-75``: make_suffix_array ->
``cargo run self-similar`` -> ``collect``). Semantics preserved: emit the
maximal byte ranges covered by ANY substring of length >= ``length_threshold``
that occurs at least twice in the corpus (all occurrences marked, including
the first — matching the ExactSubstr tool's behavior).

Algorithm: prefix-doubling suffix array (O(n log^2 n), numpy lexsort),
Kasai LCP, then coverage union over adjacent-SA pairs with lcp >= threshold.
Completeness: if S (|S| >= k) occurs at p and q, every SA-adjacent pair
between rank(p) and rank(q) has lcp >= |S|, so the coverage union marks all
occurrences — identical to marking all duplicated k-windows.
"""

from __future__ import annotations

import numpy as np


def build_suffix_array(data: bytes) -> np.ndarray:
    """Prefix-doubling suffix array over raw bytes."""
    n = len(data)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    k = 1
    while True:
        rank2 = np.full(n, -1, dtype=np.int64)
        if k < n:
            rank2[: n - k] = rank[k:]
        order = np.lexsort((rank2, rank))
        neq = np.empty(n, dtype=np.int64)
        neq[0] = 0
        neq[1:] = (rank[order[1:]] != rank[order[:-1]]) | (
            rank2[order[1:]] != rank2[order[:-1]]
        )
        labels = np.cumsum(neq)
        if labels[-1] == n - 1 or k >= n:
            return order
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[order] = labels
        rank = new_rank
        k *= 2


def lcp_array(data: bytes, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP: lcp[i] = longest common prefix of suffixes sa[i-1], sa[i]."""
    n = len(data)
    lcp = np.zeros(n, dtype=np.int64)
    if n == 0:
        return lcp
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            while i + h < n and j + h < n and data[i + h] == data[j + h]:
                h += 1
            lcp[r] = h
            if h > 0:
                h -= 1
        else:
            h = 0
    return lcp


def duplicate_byte_ranges(data: bytes, length_threshold: int) -> list[slice]:
    """Sorted disjoint byte ranges covered by duplicated substrings of length
    >= length_threshold (the 'collect' output equivalent)."""
    n = len(data)
    if n == 0 or length_threshold <= 0:
        return []
    sa = build_suffix_array(data)
    lcp = lcp_array(data, sa)
    hits = np.nonzero(lcp >= length_threshold)[0]
    if len(hits) == 0:
        return []
    # coverage via difference array: intervals [sa[i], sa[i]+lcp[i]) and
    # [sa[i-1], sa[i-1]+lcp[i]) for each adjacent pair with lcp >= k
    diff = np.zeros(n + 1, dtype=np.int64)
    starts = np.concatenate([sa[hits], sa[hits - 1]])
    lens = np.concatenate([lcp[hits], lcp[hits]])
    np.add.at(diff, starts, 1)
    np.add.at(diff, starts + lens, -1)
    covered = np.cumsum(diff[:-1]) > 0
    # maximal runs of covered positions
    edges = np.diff(covered.astype(np.int8))
    run_starts = np.nonzero(edges == 1)[0] + 1
    run_ends = np.nonzero(edges == -1)[0] + 1
    if covered[0]:
        run_starts = np.concatenate([[0], run_starts])
    if covered[-1]:
        run_ends = np.concatenate([run_ends, [n]])
    return [slice(int(a), int(b)) for a, b in zip(run_starts, run_ends, strict=True)]
