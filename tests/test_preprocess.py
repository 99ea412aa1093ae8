"""Preprocessing golden tests (reference utils/preprocess.py doctests +
tests/test_utils/test_preprocess.py style)."""

from text_dedup_spark.functions.preprocess import news_copy_preprocessing, normalize


class TestNormalize:
    def test_doctest_goldens(self):
        assert normalize("Hello, world!") == "hello world"
        assert normalize("Hello, 123!\n\t\b") == "hello 000"

    def test_empty_and_whitespace(self):
        assert normalize("") == ""
        assert normalize("   ") == ""

    def test_unicode_punct_removed(self):
        assert normalize("a—b©") == "ab"  # em-dash, copyright sign


class TestNewsCopy:
    def test_hyphen_linebreak_joined(self):
        assert news_copy_preprocessing("inter-\nnational") == "international"

    def test_newline_to_space_and_punct_dropped(self):
        assert news_copy_preprocessing('He said: "yes!"\nDone.') == "He said yes Done"

    def test_non_ascii_dropped(self):
        assert news_copy_preprocessing("café price") == "caf price"


def test_udfs_match_kernels(spark):
    from text_dedup_spark.functions.preprocess import news_copy_udf, normalize_udf

    texts = ["Hello, world!", "Hello, 123!\n\t\b", 'A "quoted" line.\nNext-\nline café', ""]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    got = {
        r["id"]: (r["n"], r["nc"])
        for r in df.select(
            "id",
            normalize_udf()(df.text).alias("n"),
            news_copy_udf()(df.text).alias("nc"),
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == (normalize(t), news_copy_preprocessing(t))
