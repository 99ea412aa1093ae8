"""Document id assignment (reference S3: ``data_sources/io.py:39-44``).

The reference's ``__INDEX__`` is the load-order ordinal. Two deterministic
Spark substitutes (SURVEY.md §7.3):

- ``mode="order"``: ``row_number() - 1`` over a stable total order — exact
  0..n-1 parity with the reference at test scale. Requires a global sort; do
  not use at web scale.
- ``mode="hash"``: ``xxhash64(key)`` — no shuffle, unique-by-assumption per
  key (e.g. url), keeps min-id cluster labels deterministic at 10^12 docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

INDEX_COL = "__INDEX__"
CLUSTER_COL = "__CLUSTER__"
DUPLICATE_COL = "__duplicate__"


def assign_ids(
    df: DataFrame,
    order_by: str | list[str] | None = None,
    mode: str = "order",
    id_col: str = INDEX_COL,
) -> DataFrame:
    if mode == "hash":
        if order_by is None:
            raise ValueError("mode='hash' needs the key column(s) to hash")
        cols = [order_by] if isinstance(order_by, str) else list(order_by)
        # shiftright(1) keeps ids non-negative so min-id labels are stable
        return df.withColumn(id_col, F.shiftright(F.xxhash64(*cols), 1))
    if order_by is None:
        raise ValueError("mode='order' needs a stable sort key for deterministic ids")
    cols = [order_by] if isinstance(order_by, str) else list(order_by)
    w = Window.orderBy(*cols)
    return df.withColumn(id_col, F.row_number().over(w) - F.lit(1).cast("long"))
