"""Phase-attribution profile of the SALTED minhash pipeline (round-5 task:
find the ~49 s parallelism-independent constant the 1M-doc scaling fit
exposed — BENCH.md salted-form scaling section).

Runs the salted pipeline on the tools/scaling_bench.py corpus with each
stage materialized behind a persist + count and a wall per phase, in a
fresh JVM at local[cpus]. Comparing a local[2] and a local[8] run gives a
per-phase (W, C) decomposition via T = W/p + C:
    W = 8*(T2 - T8)/3      C = (4*T8 - T2)/3

Usage: python tools/profile_salted.py <cpus> [n_docs]
(ensure the corpus exists first: python tools/scaling_bench.py sets it up,
or this script calls ensure_corpus itself).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.scaling_bench import DATA, ensure_corpus  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    ensure_corpus(n_docs)

    from pyspark.sql import functions as F

    from text_dedup_spark.kernels.minhash_kernel import MinHashKernel
    from text_dedup_spark.operators.connected_components import connected_components
    from text_dedup_spark.operators.ids import CLUSTER_COL, INDEX_COL
    from text_dedup_spark.operators.minhash import (
        _bands_udf,
        _explode_bands,
        assign_clusters,
        contract_identical_fingerprints,
        lsh_star_edges_salted,
    )
    from text_dedup_spark.session import get_spark

    spark = get_spark(
        "profile-salted",
        master=f"local[{cpus}]",
        conf={
            "spark.sql.shuffle.partitions": str(max(cpus, 8)),
            "spark.driver.memory": "48g",
            # same honest per-leg JVM core budget as scaling_bench's legs —
            # the decomposition must explain THOSE runs, so the JVM must see
            # the same core count here
            "spark.driver.extraJavaOptions": f"-XX:ActiveProcessorCount={cpus}",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    kernel = MinHashKernel(num_perm=128, ngram_size=2, min_length=5, threshold=0.5)

    phases: dict[str, float] = {}
    host: dict[str, dict] = {}
    t_all = time.time()

    def _stat():
        with open("/proc/stat") as f:
            return [int(x) for x in f.readline().split()[1:]]

    def timed(name: str, fn):
        before = _stat()
        t0 = time.time()
        out = fn()
        phases[name] = round(time.time() - t0, 2)
        d = [a - b for a, b in zip(_stat(), before, strict=True)]
        tot = sum(d) or 1
        # per-phase contention stamp: a phase measured under steal is not
        # comparable to a quiet one (memory: VM steal swings walls 1.5-2x)
        host[name] = {
            "steal_pct": round(100 * d[7] / tot, 1),
            "system_pct": round(100 * d[2] / tot, 1),
            "idle_pct": round(100 * d[3] / tot, 1),
        }
        print(f"# {name}: {phases[name]}s -> {out} {host[name]}", file=sys.stderr)
        return out

    df = spark.read.parquet(f"{DATA}/pages")
    timed("read_count", df.count)
    # warm pool (identical to scaling_bench's untimed warm)
    spark.range(cpus * 2).repartition(cpus * 2).mapInPandas(
        lambda it: it, "id long"
    ).count()

    docs = df.withColumn(INDEX_COL, F.col("doc_id")).repartition(64, F.col(INDEX_COL))
    with_bands = (
        docs.select(INDEX_COL, "text")
        .withColumn("__BANDS__", _bands_udf(kernel)(F.col("text")))
        .select(INDEX_COL, "__BANDS__")
        .persist()
    )
    filtered = with_bands.where(F.col("__BANDS__").isNotNull())
    timed("fingerprint", filtered.count)

    rep_rows, cedges = contract_identical_fingerprints(filtered, num_partitions=64)
    rep_rows = rep_rows.persist()
    cedges = cedges.persist()
    timed("contract_reps", rep_rows.count)
    timed("contract_edges", cedges.count)

    exploded = _explode_bands(rep_rows, kernel).repartition(
        64, "__band_idx__", "__band_val__"
    )
    band_edges = lsh_star_edges_salted(exploded).persist()
    timed("band_edges", band_edges.count)

    edges = band_edges.unionByName(cedges)
    mapping = timed("cc", lambda: connected_components(edges))
    timed("cc_mapping_count", mapping.count)

    survivors = docs.join(filtered.select(INDEX_COL), INDEX_COL)
    assigned = assign_clusters(survivors, mapping)
    kept = assigned.where(F.col(CLUSTER_COL) == F.col(INDEX_COL))
    timed("assign_kept", kept.count)

    total = round(time.time() - t_all, 2)
    print(json.dumps({"cpus": cpus, "n_docs": n_docs, "phases": phases,
                      "host": host, "total": total}))
    spark.stop()


if __name__ == "__main__":
    main()
