"""Host-noise calibration gate for benchmark runs.

The sandbox host swings wall-clock +/-25-50% in transient windows
(Firecracker co-tenancy; documented in BENCH/BASELINE.md since r3).
Before trusting any graded number, run THIS: 16 identical pure-CPU
loops in parallel via multiprocessing -- on a quiet 32-core host they
finish within a tight band; a storm shows up as a wide spread or a
slow median.

Usage: python scripts/calibrate_host.py [n_workers] [reps]

Prints one JSON line {"spread": .., "median_sec": .., "per_worker":
[..], "quiet": bool}.  Policy (r5 lesson, held since): spread > 30%
means a noise storm -- defer benches, never run anything else while a
bench is in flight.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import statistics
import sys
import time

N_ITERS = 4_000_000


def _spin(_: int) -> float:
    t0 = time.time()
    acc = 0
    for i in range(N_ITERS):
        acc += i * i & 0xFFFF
    return time.time() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    best: list[float] | None = None
    for _ in range(reps):
        with mp.Pool(n) as pool:
            times = pool.map(_spin, range(n))
        if best is None or statistics.median(times) < statistics.median(best):
            best = times
    assert best is not None
    spread = (max(best) - min(best)) / min(best)
    print(
        json.dumps(
            {
                "spread": round(spread, 3),
                "median_sec": round(statistics.median(best), 3),
                "min_sec": round(min(best), 3),
                "max_sec": round(max(best), 3),
                "quiet": spread <= 0.30,
                "n_workers": n,
            }
        )
    )


if __name__ == "__main__":
    main()
