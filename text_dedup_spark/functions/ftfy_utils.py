"""Text-encoding repair passthroughs (reference F15, ``utils/ftfy_utils.py:6-8``).

The reference exports ftfy's fix_text/fix_encoding; no pipeline uses them.
``ftfy`` is not in this container, so the wrappers are import-gated: they
work when ftfy is installed, raise NotImplementedError otherwise (parity
surface kept, never silently wrong)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

try:  # pragma: no cover
    import ftfy

    _HAS_FTFY = True
except Exception:
    _HAS_FTFY = False


def fix_text(text: str) -> str:
    if not _HAS_FTFY:
        raise NotImplementedError("ftfy is not installed in this environment")
    return ftfy.fix_text(text)  # pragma: no cover


def fix_text_udf():
    @F.pandas_udf(StringType())
    def f(s: pd.Series) -> pd.Series:
        return s.map(lambda x: fix_text(x) if x is not None else None)

    return f
