"""Single-threaded CPU calibration probe for bench legs.

The /proc/stat steal stamp misses one contention class this VM exhibits:
whole-leg "slow modes" where a deterministic single-thread workload runs
1.5-2x slower at ZERO recorded steal (round-5: the identical 91 MB SA task
measured 56.6-130.1 s across quiet runs; a 2M-doc local[8] leg measured
176 s vs 124-151 s for its four siblings). This probe times a fixed numpy
workload (~0.2 s nominal) so every leg carries an objective same-second
speed reference: compare `calib_sec` across legs before comparing walls —
a leg whose calibration is 1.5x its siblings' ran in the slow mode and its
wall is not comparable.
"""

from __future__ import annotations

import time

import numpy as np


def cpu_calib_sec(iters: int = 4, n: int = 1_500_000) -> float:
    """Wall seconds for a fixed single-threaded sort+arithmetic workload
    (np.sort and elementwise ops never multi-thread, unlike BLAS matmul —
    the probe must not vary with the leg's thread budget). Deterministic
    input; one discarded warm pass."""
    rng = np.random.default_rng(12345)
    x = rng.integers(0, 1 << 62, size=n, dtype=np.int64)
    np.sort(x)  # warm (page-in + allocator)
    t0 = time.time()
    for _ in range(iters):
        y = np.sort(x)
        ((y * np.int64(2654435761)) >> np.int64(7)).cumsum()
    return round(time.time() - t0, 4)
