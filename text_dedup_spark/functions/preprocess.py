"""Preprocessing maps (reference P8/P9), byte-identical semantics.

Reference: ``src/text_dedup/utils/preprocess.py`` — cc_net-style
``normalize`` (:11-38) and ``news_copy_preprocessing`` (:41-59), plus the
CORE benchmark's lower-concat map (``benchmarks/run_benchmark.py:43``).

Each has two forms: a pure-Python kernel (exact, uses the ``regex`` module's
Unicode property classes which JVM regex cannot reproduce for \\p{C}) and an
Arrow-batched pandas UDF wrapper for Spark pipelines.
"""

from __future__ import annotations

import pandas as pd
import regex as re
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

DIGIT_RE = re.compile(r"\d")
PUNCT_OR_NON_PRINTING_CHARS_RE = re.compile(r"[\p{P}\p{C}\p{S}]+")

_NEWS_CHARS_TO_REMOVE = r'"#$%&\()*+/:;<=>@[\\]^_`{|}~.?,!\''
_NEWS_TABLE = str.maketrans("", "", _NEWS_CHARS_TO_REMOVE)


def normalize(line: str) -> str:
    """cc_net normalize: strip, lower, digits->0, drop punct/non-printing.

    >>> normalize("Hello, world!")
    'hello world'
    >>> normalize("Hello, 123!\\n\\t\\b")
    'hello 000'
    """
    line = line.strip()
    if not line:
        return line
    line = line.lower()
    line = DIGIT_RE.sub("0", line)
    line = PUNCT_OR_NON_PRINTING_CHARS_RE.sub("", line)
    return line


def news_copy_preprocessing(text: str) -> str:
    """NEWS-COPY benchmark preprocessing (reference :41-59)."""
    text = text.replace("-\n", "").replace("\n", " ")
    text = text.translate(_NEWS_TABLE)
    return text.encode("ascii", "ignore").decode()


def normalize_udf():
    @F.pandas_udf(StringType())
    def f(s: pd.Series) -> pd.Series:
        return s.map(lambda x: normalize(x) if x is not None else None)

    return f


def news_copy_udf():
    @F.pandas_udf(StringType())
    def f(s: pd.Series) -> pd.Series:
        return s.map(lambda x: news_copy_preprocessing(x) if x is not None else None)

    return f


def core_preprocess_expr(title: Column, abstract: Column) -> Column:
    """CORE benchmark map: ``" ".join((title, abstract)).lower()`` — pure JVM
    (reference ``benchmarks/run_benchmark.py:43``)."""
    return F.lower(F.concat_ws(" ", title, abstract))
