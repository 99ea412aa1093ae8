"""Unicode-rich corpus parity: the tokenize/shingle/hash chain must behave
identically in Spark workers and the single-node oracle for non-ASCII text
(CJK, accents, RTL, emoji, mixed scripts) — this pins the F1 claim that the
Python ``regex`` ``\\W`` tokenizer (not JVM regex) runs everywhere."""

import pytest
from pyspark.sql import functions as F

from tests.oracles import minhash_oracle, simhash_oracle
from text_dedup_spark.kernels.minhash_kernel import MinHashKernel
from text_dedup_spark.kernels.simhash_kernel import SimHashKernel
from text_dedup_spark.kernels.tokenization import tokenize
from text_dedup_spark.operators.ids import CLUSTER_COL, INDEX_COL
from text_dedup_spark.operators.minhash import minhash_dedup
from text_dedup_spark.operators.simhash import simhash_dedup


def unicode_corpus() -> list[str]:
    base = [
        "Die schnelle bräune Füchsin springt über den faulen Hund im Wald",
        "Die schnelle bräune Füchsin springt über den müden Hund im Wald",
        "el veloz zorro marrón salta sobre el perro perezoso cada mañana",
        "el veloz zorro marrón salta sobre el perro perezoso cada tarde",
        "съешь же ещё этих мягких французских булок да выпей чаю сейчас",
        "съешь же ещё этих мягких французских булок да выпей кофе сейчас",
        "le cœur a ses raisons que la raison ne connaît point du tout",
        "Ψηφιακή επεξεργασία κειμένου με ελληνικούς χαρακτήρες εδώ τώρα",
        "मुझे हिंदी में पाठ प्रसंस्करण पसंद है और यह एक परीक्षण वाक्य है",
        "emoji 🙂 mixed with tëxt ünd number 42 plus punctuation!!! here",
        "emoji 🙂 mixed with tëxt ünd number 42 plus punctuation??? here",
        "1234 5678 only numbers and spaces 9012 3456 7890 1111 2222 3333",
    ]
    # pad with distinct filler docs so LSH has non-trivial structure
    filler = [
        f"unique filler document number {i} containing word{i} word{i + 1} "
        f"word{i + 2} word{i + 3} word{i + 4} word{i + 5}"
        for i in range(30)
    ]
    return base + filler


class TestUnicodeTokenize:
    def test_unicode_word_chars(self):
        assert tokenize("Füchsin springt!") == ["füchsin", "springt"]
        assert tokenize("съешь ЖЕ ещё") == ["съешь", "же", "ещё"]
        assert tokenize("cœur-raison") == ["cœur", "raison"]
        # emoji are \W (non-word) -> separators
        assert tokenize("a🙂b") == ["a", "b"]
        # underscore is a word char in \w
        assert tokenize("snake_case stays") == ["snake_case", "stays"]


@pytest.mark.parametrize("algo", ["minhash", "simhash"])
def test_unicode_pipeline_parity(spark, algo):
    texts = unicode_corpus()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], f"{INDEX_COL} long, text string"
    )
    if algo == "minhash":
        kernel = MinHashKernel(num_perm=64, ngram_size=2, min_length=3, threshold=0.5)
        expected, _ = minhash_oracle(texts, kernel)
        res = minhash_dedup(df, kernel)
    else:
        kernel = SimHashKernel(f=64, bit_diff=4, num_bucket=6, ngram_size=2, min_length=3)
        expected, _ = simhash_oracle(texts, kernel)
        res = simhash_dedup(df, kernel)
    got = {r[INDEX_COL]: r[CLUSTER_COL] for r in res.docs.collect()}
    for idx, c in got.items():
        assert expected.get(idx, idx) == c, f"doc {idx}: {texts[idx][:40]}"
    # liveness: at least one planted unicode near-dup pair clusters (minhash
    # catches all three; simhash depends on bit_diff vs actual Hamming)
    clustered_pairs = sum(1 for a, b in [(0, 1), (2, 3), (4, 5)] if got[a] == got[b])
    if algo == "minhash":
        assert clustered_pairs == 3
    else:
        assert clustered_pairs >= 1
