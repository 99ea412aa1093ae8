"""Pure-Python/numpy kernel library (no Spark imports).

These functions pin the exact reference semantics (text-dedup) and serve
two roles: (1) closure state shipped into vectorized pandas/Arrow UDFs,
(2) the single-node oracle the distributed pipelines are parity-tested
against (SURVEY.md §5, §7.1 step 4).
"""
