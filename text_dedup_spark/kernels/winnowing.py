"""Winnowing anchors for content-defined grouping (suffix-array scale path).

Schleimer/Wilkerson/Aiken winnowing: hash every w-byte window with a
polynomial rolling hash, then keep the minimum hash of every run of W
consecutive window hashes (rightmost minimum). Guarantee: two byte strings
sharing a common substring of length >= w + W - 1 select at least one
identical anchor hash from inside that substring.

For exact-substring dedup with ``length_threshold = L`` we pick
w + W - 1 <= L, so ANY duplicated range the suffix-array pass would find is
also an anchor collision — grouping docs by anchor connected-components and
running the exact per-group suffix-array dedup is therefore *lossless*
(SURVEY.md §7.7's content-defined bucketing, made exact).
"""

from __future__ import annotations

import numpy as np

_P = np.int64((1 << 31) - 1)
_B = np.int64(263)


def window_hashes(data: bytes, w: int) -> np.ndarray:
    """Polynomial rolling hash of every w-byte window, vectorized."""
    n = len(data)
    if n < w:
        return np.empty(0, dtype=np.int64)
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    # powers B^(w-1-j) mod P for j in 0..w-1
    powers = np.empty(w, dtype=np.int64)
    acc = np.int64(1)
    for j in range(w - 1, -1, -1):
        powers[j] = acc
        acc = (acc * _B) % _P
    windows = np.lib.stride_tricks.sliding_window_view(arr, w)
    # products < 2^39, row sums of w<=64 terms < 2^45 — no overflow
    return (windows @ powers) % _P


def winnow_anchors(data: bytes, w: int, window: int) -> set[int]:
    """Distinct selected anchor hashes (min per W-run of window hashes)."""
    h = window_hashes(data, w)
    if len(h) == 0:
        return set()
    if len(h) <= window:
        return {int(h.min())}
    runs = np.lib.stride_tricks.sliding_window_view(h, window)
    return set(runs.min(axis=1).astype(int).tolist())
