"""Stage-level utilization profile of the scaling-bench minhash job.

Runs ONE leg of tools/scaling_bench.py's job at a given parallelism with
the Spark UI enabled, then reads the UI REST API to print, per stage:
wall span, summed task time, executor CPU, shuffle bytes, and task count —
plus a whole-job utilization figure (sum task time / (wall * slots)).
Identifies where the big-leg efficiency loss lives: straggler tails
(stage wall >> task_time/slots), serial driver gaps (job wall >> sum of
stage walls), or skew (max task >> median).

Usage: python tools/profile_minhash.py [cpus] [n_docs]
(corpus must already exist at /tmp/spark_graft_scale; run scaling_bench
first). Idle-machine rule applies: run alone.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DATA = Path("/tmp/spark_graft_scale")


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sys.path.insert(0, str(REPO))
    from text_dedup_spark.kernels.minhash_kernel import MinHashKernel
    from text_dedup_spark.operators.minhash import minhash_dedup
    from text_dedup_spark.session import get_spark

    spark = get_spark(
        "profile",
        master=f"local[{cpus}]",
        conf={
            "spark.sql.shuffle.partitions": str(max(cpus, 8)),
            "spark.driver.memory": "48g",
            "spark.ui.enabled": "true",
            "spark.ui.port": "4047",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(str(DATA / "pages"))
    n = df.count()
    kernel = MinHashKernel(num_perm=128, ngram_size=2, min_length=5, threshold=0.5)
    spark.range(cpus * 2).repartition(cpus * 2).mapInPandas(lambda it: it, "id long").count()

    t0 = time.time()
    res = minhash_dedup(df, kernel, id_col="doc_id", repartition_input=cpus * 4)
    kept = res.kept.count()
    wall = time.time() - t0
    print(f"wall {wall:.1f}s kept {kept} docs/s {n / wall:.0f} cpus {cpus}")

    app = json.load(urllib.request.urlopen("http://localhost:4047/api/v1/applications"))
    app_id = app[0]["id"]

    def get(path: str):
        return json.load(
            urllib.request.urlopen(f"http://localhost:4047/api/v1/applications/{app_id}/{path}")
        )

    stages = get("stages?status=complete")
    stages.sort(key=lambda s: s["firstTaskLaunchedTime"])
    slots = cpus
    total_task = 0.0
    total_cpu = 0.0
    spans = []
    fmt = "%Y-%m-%dT%H:%M:%S.%fGMT"
    from datetime import datetime

    print(
        f"{'stage':>5} {'wall_s':>7} {'task_s':>8} {'cpu_s':>7} {'util%':>6} "
        f"{'tasks':>5} {'shR_MB':>7} {'shW_MB':>7}  name"
    )
    for s in stages:
        first = datetime.strptime(s["firstTaskLaunchedTime"], fmt)
        last = datetime.strptime(s["completionTime"], fmt)
        span = (last - first).total_seconds()
        task_s = s["executorRunTime"] / 1e3
        cpu_s = s["executorCpuTime"] / 1e9
        util = 100.0 * task_s / (span * slots) if span > 0 else 0.0
        total_task += task_s
        total_cpu += cpu_s
        spans.append((first.timestamp(), last.timestamp()))
        print(
            f"{s['stageId']:>5} {span:>7.1f} {task_s:>8.1f} {cpu_s:>7.1f} {util:>6.0f} "
            f"{s['numCompleteTasks']:>5} {s['shuffleReadBytes'] / 1e6:>7.0f} "
            f"{s['shuffleWriteBytes'] / 1e6:>7.0f}  {s['name'][:45]}"
        )
    # merged busy span across stages vs job wall = scheduler/driver gaps
    spans.sort()
    busy = 0.0
    cur_a, cur_b = spans[0]
    for a, b in spans[1:]:
        if a > cur_b:
            busy += cur_b - cur_a
            cur_a, cur_b = a, b
        else:
            cur_b = max(cur_b, b)
    busy += cur_b - cur_a
    print(
        f"TOTAL task_s {total_task:.0f} cpu_s {total_cpu:.0f} | job wall {wall:.1f}s, "
        f"stage-busy span {busy:.1f}s, driver/gap {wall - busy:.1f}s | "
        f"utilization {100 * total_task / (wall * slots):.0f}% of {slots} slots"
    )
    spark.stop()


if __name__ == "__main__":
    main()
