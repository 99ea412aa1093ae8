"""Hardware scaling envelope for the sandbox box (BENCH.md evidence).

Runs the minhash fingerprint kernel's actual arithmetic (xxh3 over real
shingles + permute/min over uint64 tiles) in plain multiprocessing — zero
Spark, zero shuffle — at two process counts, and reports the throughput
ratio. This is the ceiling ANY framework can reach when scaling N -> 4N
worker processes on THIS virtualized box (shared DRAM + hypervisor steal);
the gap between this envelope and 1.0 is silicon/host, not the engine.
On a real cluster, 4N executors bring 4x the memory systems, so the
envelope there is ~1.0 by construction.

Usage: python tools/cpu_envelope.py [n_small] [n_large] [seconds_per_leg]
(defaults 2 8 60). Idle-machine rule applies.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _worker(args) -> int:
    """Fingerprint synthetic docs until the deadline; return docs done."""
    seed, deadline = args
    sys.path.insert(0, str(REPO))
    import numpy as np

    from text_dedup_spark.kernels.minhash_kernel import MinHashKernel
    from text_dedup_spark.kernels.tokenization import ngrams, tokenize

    rng = np.random.RandomState(seed)
    words = ["w%d" % i for i in range(5000)]
    docs = [
        " ".join(words[j] for j in rng.randint(0, 5000, size=180))
        for _ in range(200)
    ]
    k = MinHashKernel(num_perm=128, ngram_size=2, min_length=5, threshold=0.5)
    done = 0
    while time.time() < deadline:
        sets = []
        for t in docs:
            toks = tokenize(t)
            sets.append(
                {" ".join(g).encode("utf-8") for g in ngrams(toks, 2, 5)}
            )
        k.embed_batch_bandhash(sets)
        done += len(docs)
    return done


def run_leg(nproc: int, seconds: float) -> float:
    deadline = time.time() + seconds
    with mp.Pool(nproc) as pool:
        t0 = time.time()
        done = sum(pool.map(_worker, [(i, deadline) for i in range(nproc)]))
        wall = time.time() - t0
    return done / wall


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_large = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    secs = float(sys.argv[3]) if len(sys.argv) > 3 else 60.0
    run_leg(n_small, 5.0)  # warm imports/page cache
    thr_small = run_leg(n_small, secs)
    thr_large = run_leg(n_large, secs)
    ratio = n_large / n_small
    print(
        json.dumps(
            {
                "metric": f"fingerprint-kernel hardware envelope {n_small} -> {n_large} procs",
                f"docs_per_sec_{n_small}p": round(thr_small, 1),
                f"docs_per_sec_{n_large}p": round(thr_large, 1),
                "envelope_efficiency": round(thr_large / thr_small / ratio, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
