"""Per-query iteration harness for optimization rounds.

Mirrors bench.py's frozen methodology exactly (same session conf, same
untimed warm pass + K timed repeats with ``spark.catalog.clearCache()``
between, same lower-median estimator) but runs only the queries named on
the command line, so a single-operator change can be measured in ~15 s
instead of a ~160 s full bench run.  bench.py itself stays untouched
(frozen for driver measurement).

Usage:
    python tools/qbench.py minhash_dedup_verified ngram_jaccard_pairs
    python tools/qbench.py --k 5 simhash_dedup
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--k", type=int, default=None, help="force repeat count")
    ap.add_argument("--sf", default=None, help="override SF dir")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from text_dedup_spark.session import get_spark

    sf_dir = args.sf or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "qbench",
        master=f"local[{cpus}]",
        conf={"spark.sql.shuffle.partitions": str(max(int(cpus), 8))},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # same worker warmup as bench.py
    spark.range(64).repartition(64).mapInPandas(lambda it: it, "id long").count()

    queries = entry_mod.queries()
    out: dict[str, dict] = {}
    for name in args.queries:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"qbench:{name}:warm")
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        warm = time.time() - t0
        spark.catalog.clearCache()
        k = args.k or (3 if warm <= 3.0 else (2 if warm <= 8.0 else 1))
        runs = []
        for i in range(k):
            spark.sparkContext.setJobDescription(f"qbench:{name}:run{i}")
            t0 = time.time()
            fn(spark, sf_dir).count()
            runs.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        med = sorted(runs)[(len(runs) - 1) // 2]
        out[name] = {"rows": n, "warm": round(warm, 3), "runs": runs, "median": med}
        print(f"# {name}: {n} rows; warm {warm:.2f}s, runs {runs} -> median {med:.2f}s",
              file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
