"""Dump .explain('formatted') for declared queries to plans/r06/<q>_<tag>.txt.

Usage: python tools/dump_plans_r06.py before [query ...]
       python tools/dump_plans_r06.py after  [query ...]

No query names = all declared queries. Note: queries whose construction
runs eager actions (connected-components driver gate, verify
localCheckpoint) execute those during the dump; the file records the final
DataFrame's physical plan — the same object bench.py counts.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]

    import __spark_entry__ as entry_mod
    from text_dedup_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "dump-plans-r06",
        master=f"local[{cpus}]",
        conf={"spark.sql.shuffle.partitions": str(max(int(cpus), 8))},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    if not names:
        names = list(queries)
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange nodes)")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
