"""Spark suffix-array dedup vs single-node oracle (same kernels, no Spark)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from text_dedup_spark.kernels.intervals import clean_up, restore_and_merge
from text_dedup_spark.kernels.suffix_array_kernel import duplicate_byte_ranges
from text_dedup_spark.operators.suffix_dedup import suffix_array_dedup


def make_corpus(seed: int = 5, n: int = 120):
    """Docs with planted long shared substrings (some >=100 bytes, some just
    below threshold), including one crossing a doc-concat boundary."""
    rng = np.random.RandomState(seed)
    words = [f"w{i}" for i in range(500)]

    def doc(n_words):
        return " ".join(words[i] for i in rng.randint(0, 500, size=n_words))

    texts = [doc(rng.randint(30, 120)) for _ in range(n)]
    long_chunk = doc(40)  # ~ 160+ bytes
    short_chunk = doc(10)  # < 100 bytes
    texts[10] = texts[10] + " " + long_chunk
    texts[55] = long_chunk + " " + texts[55]
    texts[20] = texts[20] + " " + short_chunk
    texts[70] = short_chunk + " " + texts[70]
    return texts


def oracle(texts, k=100, strategy="longest"):
    encoded = [t.encode("utf-8") for t in texts]
    boundaries = []
    start = 0
    for b in encoded:
        boundaries.append(slice(start, start + len(b)))
        start += len(b)
    ranges = duplicate_byte_ranges(b"".join(encoded), k)
    slices, _ = restore_and_merge(boundaries, ranges, k, strategy)
    return [clean_up(t, sl) for t, sl in zip(texts, slices, strict=True)]


@pytest.mark.parametrize("strategy", ["longest", "overlapping"])
def test_matches_oracle(spark, strategy):
    texts = make_corpus()
    expected = oracle(texts, 100, strategy)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["__INDEX__", "text"]
    )
    res = suffix_array_dedup(df, length_threshold=100, merge_strategy=strategy)
    got = {r["__INDEX__"]: r["text"] for r in res.docs.collect()}
    for i, exp in enumerate(expected):
        assert got[i] == exp, f"doc {i}"
    # the planted long duplicate must actually be removed from one side
    assert len(got[10]) < len(texts[10]) or len(got[55]) < len(texts[55])
    # below-threshold chunk untouched
    assert got[20] == texts[20] and got[70] == texts[70]
    kept_ids = {r["__INDEX__"] for r in res.kept.collect()}
    assert kept_ids == {i for i, t in enumerate(expected) if len(t) > 0}


def test_identical_docs_fully_removed(spark):
    base = "x " * 200  # 400 bytes of repeated content
    df = spark.createDataFrame(
        [(0, base), (1, base), (2, "unique words only here")],
        ["__INDEX__", "text"],
    )
    res = suffix_array_dedup(df, length_threshold=100)
    got = {r["__INDEX__"]: r["text"] for r in res.docs.collect()}
    # ExactSubstr semantics: ALL copies of the duplicated bytes are removed
    assert got[0] == "" and got[1] == ""
    assert got[2] == "unique words only here"
    assert {r["__INDEX__"] for r in res.kept.collect()} == {2}


class TestAnchoredGrouping:
    """Winnowing-anchor grouping must reproduce the global single-group
    result exactly (content duplicates are always co-grouped; boundary-
    spanning concat artifacts are absent from this fixture by construction)."""

    def test_anchored_equals_global(self, spark):
        from text_dedup_spark.operators.suffix_dedup import (
            suffix_array_dedup,
            suffix_array_dedup_anchored,
        )

        texts = make_corpus(seed=8, n=150)
        # plant a chain: A~B share chunk1, B~C share chunk2 (transitive group)
        rng = np.random.RandomState(99)
        words = [f"w{i}" for i in range(500)]
        chunk1 = " ".join(words[i] for i in rng.randint(0, 500, size=40))
        chunk2 = " ".join(words[i] for i in rng.randint(0, 500, size=40))
        texts[5] = texts[5] + " " + chunk1
        texts[40] = chunk1 + " middle filler words " + chunk2
        texts[90] = chunk2 + " " + texts[90]

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["__INDEX__", "text"]
        )
        global_res = suffix_array_dedup(df, length_threshold=100)
        anchored_res = suffix_array_dedup_anchored(df, length_threshold=100)
        g = {r["__INDEX__"]: r["text"] for r in global_res.docs.collect()}
        a = {r["__INDEX__"]: r["text"] for r in anchored_res.docs.collect()}
        assert g == a
        # chain members actually got rewritten
        assert len(a[40]) < len(texts[40])

    def test_auto_dispatch_both_paths_equal(self, spark):
        """suffix_array_dedup_auto picks global below the byte threshold and
        anchored above it; forced either way the output is identical."""
        from text_dedup_spark.operators.suffix_dedup import suffix_array_dedup_auto

        texts = make_corpus(seed=21, n=80)
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["__INDEX__", "text"]
        )
        via_global = suffix_array_dedup_auto(
            df, length_threshold=100, global_bytes_threshold=1 << 30
        )
        via_anchored = suffix_array_dedup_auto(
            df, length_threshold=100, global_bytes_threshold=0
        )
        g = {r["__INDEX__"]: r["text"] for r in via_global.docs.collect()}
        a = {r["__INDEX__"]: r["text"] for r in via_anchored.docs.collect()}
        assert g == a

    def test_byte_cap_splits_observably_with_locality_recall(self, spark):
        """max_group_bytes splits an oversized group into min-anchor-range
        subgroups: the split is counted via Observation, and because real
        duplicate clusters share their minimum anchor, most removable bytes
        survive the split (recall floor pinned)."""
        import numpy as np
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        from text_dedup_spark.operators.suffix_dedup import suffix_array_dedup_anchored

        rng = np.random.RandomState(17)
        words = [f"w{i}" for i in range(400)]

        def doc(n):
            return " ".join(words[i] for i in rng.randint(0, 400, size=n))

        # one shared template chains ALL docs into one anchor component;
        # planted exact pairs are the recoverable duplication
        template = doc(60)
        texts = []
        for i in range(120):
            body = doc(rng.randint(60, 120))
            texts.append(template + " " + body)
        for i in range(0, 40, 2):
            texts[i + 1] = texts[i]  # exact duplicate pairs
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["__INDEX__", "text"]
        )

        lossless = suffix_array_dedup_anchored(df, length_threshold=100)
        l_removed = (
            df.select(F.sum(F.length(F.encode("text", "utf-8")))).first()[0]
            - lossless.docs.select(F.sum(F.length(F.encode("text", "utf-8")))).first()[0]
        )
        assert l_removed > 0

        obs = Observation("sfx_cap_test")
        capped = suffix_array_dedup_anchored(
            df, length_threshold=100, max_group_bytes=20_000, observation=obs
        )
        c_removed = (
            df.select(F.sum(F.length(F.encode("text", "utf-8")))).first()[0]
            - capped.docs.select(F.sum(F.length(F.encode("text", "utf-8")))).first()[0]
        )
        got = obs.get
        assert got["n_groups_split"] >= 1
        assert got["n_rows_in_split_groups"] >= 100
        assert got["n_overlap_rows"] >= 1  # boundary docs joined 2 subgroups
        # locality split keeps most of the removable bytes despite splitting
        assert c_removed / l_removed >= 0.6, (c_removed, l_removed)

        # boundary overlap recovers straddling duplicates: the same cap with
        # the margin disabled must never remove MORE than the overlap run
        obs0 = Observation("sfx_cap_test_no_ov")
        capped0 = suffix_array_dedup_anchored(
            df,
            length_threshold=100,
            max_group_bytes=20_000,
            split_overlap_bytes=0,
            observation=obs0,
        )
        c0_removed = (
            df.select(F.sum(F.length(F.encode("text", "utf-8")))).first()[0]
            - capped0.docs.select(F.sum(F.length(F.encode("text", "utf-8")))).first()[0]
        )
        assert obs0.get["n_overlap_rows"] == 0
        assert c_removed >= c0_removed, (c_removed, c0_removed)

    def test_winnowing_guarantee(self):
        from text_dedup_spark.kernels.winnowing import winnow_anchors

        rng = np.random.RandomState(1)
        shared = bytes(rng.randint(97, 123, size=120, dtype=np.int64).astype(np.uint8).tolist())
        for trial in range(10):
            pre = bytes(rng.randint(97, 123, size=rng.randint(0, 200), dtype=np.int64).astype(np.uint8).tolist())
            post = bytes(rng.randint(97, 123, size=rng.randint(0, 200), dtype=np.int64).astype(np.uint8).tolist())
            a = winnow_anchors(pre + shared, 48, 100 - 48 + 1)
            b = winnow_anchors(shared + post, 48, 100 - 48 + 1)
            assert a & b, f"trial {trial}: 120-byte shared run selected no common anchor"

    def test_winnowing_kernel_forms(self):
        """The round-5 O(n) prefix-sum hash + O(n log W) doubling min must
        equal the definitional O(n*w)/O(n*W) forms value-for-value (anchor
        IDENTITY is what makes anchored grouping lossless — a changed hash
        would silently regroup)."""
        from text_dedup_spark.kernels import winnowing as wn

        def ref_anchors(data: bytes, w: int, window: int) -> set[int]:
            n = len(data)
            if n < w:
                return set()
            arr = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
            powers = np.empty(w, dtype=np.int64)
            acc = np.int64(1)
            for j in range(w - 1, -1, -1):
                powers[j] = acc
                acc = (acc * wn._B) % wn._P
            h = (np.lib.stride_tricks.sliding_window_view(arr, w) @ powers) % wn._P
            if len(h) == 0:
                return set()
            if len(h) <= window:
                return {int(h.min())}
            runs = np.lib.stride_tricks.sliding_window_view(h, window)
            return set(runs.min(axis=1).astype(int).tolist())

        rng = np.random.RandomState(7)
        for trial in range(25):
            n = int(rng.randint(0, 4000))
            data = bytes(rng.randint(0, 256, size=n, dtype=np.int64).astype(np.uint8).tolist())
            for w, window in ((48, 53), (8, 5), (2, 1), (16, 200)):
                got = wn.winnow_anchors(data, w, window)
                want = ref_anchors(data, w, window)
                assert got == want, (trial, n, w, window)
                lst = wn.winnow_anchor_list(data, w, window)
                assert lst == sorted(want), (trial, n, w, window)
