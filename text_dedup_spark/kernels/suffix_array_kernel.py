"""In-house suffix-array duplicate-substring extraction (numpy).

Replaces the reference's external google-research/deduplicate-text-datasets
subprocess chain (reference ``suffix_array.py:58-75``: make_suffix_array ->
``cargo run self-similar`` -> ``collect``). Semantics preserved: emit the
maximal byte ranges covered by ANY substring of length >= ``length_threshold``
that occurs at least twice in the corpus (all occurrences marked, including
the first — matching the ExactSubstr tool's behavior).

Algorithm: prefix-doubling suffix array (O(n log^2 n), numpy lexsort) with
the per-level rank arrays retained, then a fully-vectorized LCP via binary
decomposition over those levels (O(n log n), no per-byte Python loop), then
coverage union over adjacent-SA pairs with lcp >= threshold.
Completeness: if S (|S| >= k) occurs at p and q, every SA-adjacent pair
between rank(p) and rank(q) has lcp >= |S|, so the coverage union marks all
occurrences — identical to marking all duplicated k-windows.

Memory: the retained levels cost ~4*log2(n) bytes per corpus byte (int32
ranks). Groups produced by the winnowing-anchor path are bounded by actual
content overlap, so per-task corpora stay small; the budget is documented at
the operator level.
"""

from __future__ import annotations

import numpy as np


_START_WIDTH = 7  # symbols packed 9-bit into one int64 key (7*9=63 bits)


def _initial_rank(data: bytes, n: int) -> tuple[np.ndarray, int]:
    """Initial equivalence classes: width-7 packed keys for real corpora
    (skips the byte-level doubling levels where zipf-heavy text has its
    largest tie classes — the dominant cost), byte-level for tiny inputs.

    Packing uses symbol values byte+1 in 9 bits with 0 padding past the end,
    so shorter suffixes order strictly before longer same-prefix ones —
    identical to the -1-padding convention of the doubling loop."""
    arr = np.frombuffer(data, dtype=np.uint8)
    if n < 16:
        return arr.astype(np.int64), 1
    sym = arr.astype(np.int64) + 1
    key = np.zeros(n, dtype=np.int64)
    for j in range(_START_WIDTH):
        shifted = np.zeros(n, dtype=np.int64)
        if n - j > 0:
            shifted[: n - j] = sym[j:]
        key = (key << 9) | shifted
    return key, _START_WIDTH


def _build_sa_levels(
    data: bytes,
) -> tuple[np.ndarray, list[np.ndarray], list[int]]:
    """Prefix-doubling suffix array + rank arrays per doubling level.

    ``levels[j][i]`` is the equivalence class of ``data[i : i + widths[j]]``;
    for fully in-bounds windows, equal class <=> equal bytes (the -1 padding
    only affects windows that run past the end, which the LCP descend skips
    via its bounds check). Widths are start_width * 2^j."""
    n = len(data)
    if n == 0:
        return np.empty(0, dtype=np.int64), [], []
    rank, k = _initial_rank(data, n)
    widths = [k]
    levels: list[np.ndarray] = []
    order: np.ndarray | None = None
    sizes: np.ndarray | None = None  # per-slot class size of `rank` along `order`
    levels.append(rank)  # level 0: the initial (possibly packed-key) ranks
    while True:
        rank2 = np.full(n, -1, dtype=np.int64)
        if k < n:
            rank2[: n - k] = rank[k:]
        if order is None:
            # first iteration: initial ranks may be packed 63-bit keys, so a
            # two-key lexsort (no arithmetic packing) avoids overflow
            order = np.lexsort((rank2, rank))
        else:
            # refinement: `order` is already grouped by rank class (classes
            # are contiguous slot runs). Only classes with >1 member need
            # re-sorting by (rank, rank2); sorting that subset by the packed
            # key and writing it back into the same slots (ascending) keeps
            # settled suffixes untouched — per-level cost O(n) + O(m log m)
            # with m = unresolved count, which collapses fast on real text.
            unsettled = sizes > 1
            sub = order[unsettled]
            if len(sub):
                base = int(rank.max()) + 2
                key = rank[sub] * base + rank2[sub] + 1
                order[unsettled] = sub[np.argsort(key)]
        ro, r2o = rank[order], rank2[order]
        neq = np.empty(n, dtype=np.int64)
        neq[0] = 0
        neq[1:] = (ro[1:] != ro[:-1]) | (r2o[1:] != r2o[:-1])
        labels = np.cumsum(neq)
        if labels[-1] == n - 1 or k >= n:
            return order, levels, widths
        # class sizes along order, for the next refinement pass
        counts = np.bincount(labels, minlength=labels[-1] + 1)
        sizes = counts[labels]
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[order] = labels
        rank = new_rank
        levels.append(new_rank.astype(np.int32))
        widths.append(2 * k)
        k *= 2


def build_suffix_array(data: bytes) -> np.ndarray:
    """Prefix-doubling suffix array over raw bytes."""
    return _build_sa_levels(data)[0]


def _lcp_from_levels(
    data: bytes, sa: np.ndarray, levels: list[np.ndarray], widths: list[int]
) -> np.ndarray:
    """Vectorized LCP of SA-adjacent suffix pairs by greedy decomposition:
    descend level widths w0*2^J .. w0; where both windows are in bounds and
    the level ranks agree, the common prefix extends by that width — this
    yields floor(lcp/w0)*w0 exactly (binary decomposition of the quotient;
    lcp < 2*top_width is guaranteed by the doubling termination). The
    residue < w0 is finished with <= w0-1 vectorized byte-comparison
    passes."""
    n = len(data)
    lcp = np.zeros(n, dtype=np.int64)
    if n < 2:
        return lcp
    arr = np.frombuffer(data, dtype=np.uint8)
    a = sa[:-1].astype(np.int64)
    b = sa[1:].astype(np.int64)
    h = np.zeros(n - 1, dtype=np.int64)
    for j in range(len(levels) - 1, -1, -1):
        w = widths[j]
        lv = levels[j]
        ia = a + h
        ib = b + h
        ok = (ia + w <= n) & (ib + w <= n)
        idx = np.nonzero(ok)[0]
        if len(idx) == 0:
            continue
        eq = lv[ia[idx]] == lv[ib[idx]]
        h[idx[eq]] += w
    # residue: < widths[0] bytes, compared directly (vectorized per pass)
    if widths and widths[0] > 1:
        active = np.arange(n - 1)
        for _ in range(widths[0] - 1):
            ia = a[active] + h[active]
            ib = b[active] + h[active]
            ok = (ia < n) & (ib < n)
            eq = np.zeros(len(active), dtype=bool)
            eq[ok] = arr[ia[ok]] == arr[ib[ok]]
            h[active[eq]] += 1
            active = active[eq]
            if len(active) == 0:
                break
    lcp[1:] = h
    return lcp


def lcp_array(data: bytes, sa: np.ndarray) -> np.ndarray:
    """LCP array: lcp[i] = longest common prefix of suffixes sa[i-1], sa[i].

    Rebuilds the doubling levels (same cost class as the SA build); use
    ``suffix_and_lcp_arrays`` to share one build."""
    n = len(data)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    _, levels, widths = _build_sa_levels(data)
    return _lcp_from_levels(data, sa, levels, widths)


def suffix_and_lcp_arrays_numpy(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    """One-pass build of (suffix array, LCP array) sharing the rank levels —
    the pure-numpy path, also the cross-check oracle for the C kernel."""
    sa, levels, widths = _build_sa_levels(data)
    return sa, _lcp_from_levels(data, sa, levels, widths)


def suffix_and_lcp_arrays(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    """(suffix array, LCP array). Dispatches to the C kernel (sa_native:
    radix prefix doubling + Kasai, ~10-30x the numpy constant, no retained
    rank levels) when it is available; numpy otherwise. Outputs are
    identical — the suffix array of a byte string is unique, and both LCP
    definitions agree — pinned in tests/test_suffix_array_kernel.py."""
    from text_dedup_spark.kernels import sa_native

    if sa_native.available():
        return sa_native.suffix_and_lcp_arrays_c(data)
    return suffix_and_lcp_arrays_numpy(data)


def duplicate_byte_ranges(data: bytes, length_threshold: int) -> list[slice]:
    """Sorted disjoint byte ranges covered by duplicated substrings of length
    >= length_threshold (the 'collect' output equivalent)."""
    n = len(data)
    if n == 0 or length_threshold <= 0:
        return []
    sa, lcp = suffix_and_lcp_arrays(data)
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
