"""Two-parallelism scaling benchmark (BASELINE.json north rule evidence).

No real cluster exists in this sandbox, so the N -> 4N executor scaling
criterion is evidenced by running the SAME minhash-dedup job on the SAME
input at local[8] and local[32] (fresh JVM each) and reporting throughput at
both plus efficiency = (thr_32 / thr_8) / 4.

Usage: python tools/scaling_bench.py [n_docs] [n_small] [n_large]
(defaults 100000 4 16).

Why local[4] vs local[16] and not local[8] vs local[32]: a PySpark job with
pandas UDFs runs ~2N busy threads at local[N] (N JVM executor threads + N
Python workers). On this 32-core box local[32] would oversubscribe 2x while
local[8] runs uncontended, rigging the comparison against the larger
"cluster" — measured: local[32] is SLOWER than local[8] on this job purely
from oversubscription. local[4]->local[16] keeps both legs within capacity
(8 vs 32 busy threads), which is what distinct N- and 4N-executor clusters
would look like.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))  # script invocation: make tools.hostcal importable
DATA = Path("/tmp/spark_graft_scale")

RUN_SNIPPET = r"""
import json, sys, time
sys.path.insert(0, "{repo}")
from text_dedup_spark.session import get_spark
from text_dedup_spark.kernels.minhash_kernel import MinHashKernel
from text_dedup_spark.operators.minhash import minhash_dedup
from text_dedup_spark.operators.ids import INDEX_COL

cpus = {cpus}
spark = get_spark("scaling", master=f"local[{cpus}]",
                  conf={{"spark.sql.shuffle.partitions": str(max(cpus, 8)),
                         # local mode: one JVM holds all executors; size the
                         # heap like a real worker fleet would be sized
                         "spark.driver.memory": "48g",
                         # honest per-leg core budget: without this the JVM
                         # sizes GC workers, JIT compiler threads and netty
                         # pools for the PHYSICAL 32 cores in BOTH legs, so
                         # the local[2] leg borrows ~32-core GC/JIT silently
                         # — free parallelism a real 2-core executor fleet
                         # would not have, deflating measured N->4N scaling
                         "spark.driver.extraJavaOptions":
                             f"-XX:ActiveProcessorCount={{cpus}}"}})
spark.sparkContext.setLogLevel("ERROR")
df = spark.read.parquet("{data}/pages")
n = df.count()
kernel = MinHashKernel(num_perm=128, ngram_size=2, min_length=5, threshold=0.5)
# warm the Python UDF worker pool before timing (a long-lived cluster's
# steady state; worker startup is a per-process constant, not job work —
# and it applies identically to both legs)
spark.range(cpus * 2).repartition(cpus * 2).mapInPandas(lambda it: it, "id long").count()
t0 = time.time()
# partition counts identical in BOTH legs (the only variable between legs
# must be parallelism). band_partitions=64 -> ~8 MB sort partitions for
# the 1M-doc band exchange, the concurrency-safe sort width (see
# minhash_dedup docstring); input at 64 gives every leg the same task
# granularity for the fingerprint UDF.
res = minhash_dedup(df, kernel, id_col="doc_id", repartition_input=64,
                    band_partitions=64, band_edges_mode="{mode}")
kept = res.kept.count()
wall = time.time() - t0
print(json.dumps({{"cpus": cpus, "docs": n, "kept": kept, "wall_sec": round(wall, 2),
                   "docs_per_sec": round(n / wall, 1)}}))
spark.stop()
"""


def ensure_corpus(n_docs: int) -> None:
    # single current-size marker: per-size .ok markers accumulated while the
    # pages/ dir only ever holds ONE corpus, so a rerun at a previous size
    # silently read the wrong data
    marker = DATA / "pages_current_size"
    if marker.exists() and marker.read_text().strip() == str(n_docs):
        return
    for stale in DATA.glob("pages_*.ok"):
        stale.unlink()
    print(f"# generating {n_docs} synthetic web pages...", file=sys.stderr)
    sys.path.insert(0, str(REPO))
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from text_dedup_spark.sources.web_pages import make_web_pages

    corpus = make_web_pages(n_docs=n_docs, seed=42)
    # text payload only for the dedup job (nanosecond timestamps are not
    # Spark-readable parquet; warc_ts is irrelevant to the benchmark)
    pages = corpus.pages.drop(columns=["html", "warc_ts"])
    pages["doc_id"] = np.arange(len(pages), dtype=np.int64)
    (DATA / "pages").mkdir(parents=True, exist_ok=True)
    for old in (DATA / "pages").glob("*.parquet"):
        old.unlink()
    tbl = pa.Table.from_pandas(pages, preserve_index=False)
    n_files = 32
    rows_per = (len(pages) + n_files - 1) // n_files
    for i in range(n_files):
        pq.write_table(tbl.slice(i * rows_per, rows_per), DATA / "pages" / f"part-{i:03d}.parquet")
    marker.write_text(str(n_docs))
    # leave the page cache in the SAME state every leg sees: flush the
    # dirty writeback pages the generation just produced (background
    # writeback otherwise steals I/O + CPU from whichever leg runs first —
    # measured 2.7x on a 1M-doc local[8] leg that followed a regen) and
    # read the files back so each leg starts warm
    os.sync()
    for p in sorted((DATA / "pages").glob("*.parquet")):
        with open(p, "rb") as f:
            while f.read(1 << 24):
                pass


def _cpu_sample() -> list[int] | None:
    try:
        with open("/proc/stat") as f:
            return [int(x) for x in f.readline().split()[1:]]
    except Exception:
        return None


def run_at(cpus: int, mode: str = "window") -> dict:
    from tools.hostcal import cpu_calib_sec

    code = RUN_SNIPPET.format(repo=REPO, cpus=cpus, data=DATA, mode=mode)
    calib_before = cpu_calib_sec()
    before = _cpu_sample()
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=3600,
        env={**os.environ, "PYTHONPATH": str(REPO)},
    )
    after = _cpu_sample()
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            res = json.loads(line)
            # host-contention stamp per leg (same honesty metric as
            # bench.py's host_cpu): steal/system % over this leg's window —
            # a leg with steal >> 1% is not comparable to a quiet one
            if before is not None and after is not None:
                d = [a - b for a, b in zip(after, before, strict=True)]
                tot = sum(d) or 1
                res["host_steal_pct"] = round(100 * d[7] / tot, 2) if len(d) > 7 else None
                res["host_system_pct"] = round(100 * d[2] / tot, 2)
            # slow-mode detector (tools/hostcal.py): a leg whose calibration
            # is ~1.5x its siblings' ran in the platform's slow mode even at
            # zero steal — compare calib across legs before comparing walls
            res["calib_before_sec"] = calib_before
            res["calib_after_sec"] = cpu_calib_sec()
            return res
    raise RuntimeError(f"no result line; stderr tail: {out.stderr[-2000:]}")


def main() -> None:
    """argv: [n_docs] [n_small] [n_large] [repeats].

    With repeats > 1, each leg runs `repeats` times (alternating small/large
    so slow host-steal drift hits both legs equally) and the pair result
    uses each leg's MEDIAN throughput — single pairs on this virtualized
    box swing up to ~35% (BENCH.md host-variance note), which is larger
    than the efficiency margin being measured."""
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_large = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    # argv[5]: star-edge form ("window" parity default / "salted" scale
    # profile) — lets the north-rule scaling evidence cover the form a
    # real web-scale run would use
    mode = sys.argv[5] if len(sys.argv) > 5 else "window"
    ensure_corpus(n_docs)
    runs: dict[int, list[dict]] = {n_small: [], n_large: []}
    for r in range(repeats):
        for cpus in (n_small, n_large):
            t0 = time.time()
            res = run_at(cpus, mode)
            runs[cpus].append(res)
            print(
                f"# run {r + 1}/{repeats} local[{cpus}]: {res} "
                f"(total {time.time() - t0:.0f}s)",
                file=sys.stderr,
            )

    def median_run(rs: list[dict]) -> dict:
        rs = sorted(rs, key=lambda x: x["docs_per_sec"])
        return rs[len(rs) // 2]

    small, large = median_run(runs[n_small]), median_run(runs[n_large])
    ratio = n_large / n_small
    eff = (large["docs_per_sec"] / small["docs_per_sec"]) / ratio
    print(
        json.dumps(
            {
                "metric": f"minhash dedup scaling local[{n_small}] -> local[{n_large}]",
                "band_edges_mode": mode,
                "n_docs": n_docs,
                "repeats": repeats,
                f"local{n_small}": small,
                f"local{n_large}": large,
                f"local{n_small}_all_docs_per_sec": [x["docs_per_sec"] for x in runs[n_small]],
                f"local{n_large}_all_docs_per_sec": [x["docs_per_sec"] for x in runs[n_large]],
                "speedup": round(large["docs_per_sec"] / small["docs_per_sec"], 3),
                "scaling_efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
