"""Suffix-array kernel vs brute-force duplicated-k-window oracle."""

import numpy as np
import pytest

from text_dedup_spark.kernels.suffix_array_kernel import (
    build_suffix_array,
    duplicate_byte_ranges,
    lcp_array,
)


def brute_force_ranges(data: bytes, k: int) -> list[slice]:
    """Mark every position covered by a k-window occurring >= 2 times; merge
    runs. Equivalent to coverage by >=k duplicated substrings."""
    n = len(data)
    from collections import defaultdict

    occ = defaultdict(list)
    for i in range(n - k + 1):
        occ[data[i : i + k]].append(i)
    covered = np.zeros(n, dtype=bool)
    for positions in occ.values():
        if len(positions) > 1:
            for p in positions:
                covered[p : p + k] = True
    out = []
    i = 0
    while i < n:
        if covered[i]:
            j = i
            while j < n and covered[j]:
                j += 1
            out.append(slice(i, j))
            i = j
        else:
            i += 1
    return out


class TestSuffixArray:
    def test_sa_correct_small(self):
        data = b"banana"
        sa = build_suffix_array(data)
        suffixes = sorted(range(len(data)), key=lambda i: data[i:])
        assert list(sa) == suffixes

    def test_sa_random(self):
        rng = np.random.RandomState(3)
        for n in [1, 2, 50, 300]:
            data = bytes(rng.randint(97, 103, size=n).astype(np.uint8).tolist())
            sa = build_suffix_array(data)
            suffixes = sorted(range(n), key=lambda i: data[i:])
            assert list(sa) == suffixes, f"n={n}"

    def test_lcp_random(self):
        rng = np.random.RandomState(4)
        data = bytes(rng.randint(97, 100, size=200).astype(np.uint8).tolist())
        sa = build_suffix_array(data)
        lcp = lcp_array(data, sa)

        def common_prefix(a: bytes, b: bytes) -> int:
            m = 0
            for x, y in zip(a, b, strict=False):
                if x != y:
                    break
                m += 1
            return m

        for i in range(1, len(data)):
            assert lcp[i] == common_prefix(data[sa[i - 1] :], data[sa[i] :])

    @pytest.mark.parametrize("k", [3, 5, 10])
    def test_duplicate_ranges_vs_brute_force(self, k):
        rng = np.random.RandomState(11)
        base = bytes(rng.randint(97, 105, size=400).astype(np.uint8).tolist())
        # plant duplicates: repeat two chunks
        data = base + base[50:90] + b"zq" + base[200:260] + base
        assert duplicate_byte_ranges(data, k) == brute_force_ranges(data, k)

    def test_no_duplicates(self):
        assert duplicate_byte_ranges(b"abcdefgh", 3) == []
        assert duplicate_byte_ranges(b"", 3) == []

    def test_self_overlap(self):
        data = b"aaaaaaaaaa"  # overlapping occurrences
        assert duplicate_byte_ranges(data, 3) == brute_force_ranges(data, 3)


class TestNativeKernelParity:
    """C kernel (sa_native: radix prefix doubling + Kasai) must equal the
    numpy kernel bit-for-bit: the suffix array of a byte string is unique,
    and both LCP definitions are the standard adjacent-pair LCP."""

    def test_c_equals_numpy_when_available(self):
        from text_dedup_spark.kernels import sa_native
        from text_dedup_spark.kernels.suffix_array_kernel import (
            suffix_and_lcp_arrays_numpy,
        )

        if not sa_native.available():
            pytest.skip(f"native kernel unavailable: {sa_native.load_error()}")
        rng = np.random.RandomState(3)
        cases = [b"", b"a", b"banana", b"aa" * 40, bytes(range(256)) * 2]
        for n in (17, 257, 2048):
            cases.append(rng.randint(0, 256, n).astype(np.uint8).tobytes())
            cases.append(rng.randint(97, 100, n).astype(np.uint8).tobytes())
        words = [b"alpha", b"beta", b"gamma", b"delta"]
        cases.append(b" ".join(words[i % 4] for i in rng.randint(0, 4, 1500)))
        for d in cases:
            sa_c, lcp_c = sa_native.suffix_and_lcp_arrays_c(d)
            sa_n, lcp_n = suffix_and_lcp_arrays_numpy(d)
            assert np.array_equal(sa_c, sa_n), f"SA mismatch at n={len(d)}"
            assert np.array_equal(lcp_c, lcp_n), f"LCP mismatch at n={len(d)}"

    def test_dispatch_env_override(self, monkeypatch):
        # TEXT_DEDUP_SPARK_SA_KERNEL=numpy must force the fallback even when
        # the native kernel exists (fresh module state via reload)
        import importlib

        from text_dedup_spark.kernels import sa_native

        monkeypatch.setenv("TEXT_DEDUP_SPARK_SA_KERNEL", "numpy")
        importlib.reload(sa_native)
        try:
            assert not sa_native.available()
            assert "disabled" in (sa_native.load_error() or "")
        finally:
            monkeypatch.delenv("TEXT_DEDUP_SPARK_SA_KERNEL")
            importlib.reload(sa_native)
