"""Aggregate DRAM-bandwidth probe for the scaling-efficiency writeup.

Launches K pinned worker processes (one per core, ``taskset``-style via
``os.sched_setaffinity``), each streaming a ~256 MB float64 triad
(``a = b + s*c``) repeatedly for a fixed wall window, and reports the
aggregate touched-bytes/sec at each K.

Purpose: the north rule's scaling criterion compares N- vs 4N-node
CLUSTERS, where memory bandwidth grows with node count.  A single box
cannot emulate that: once the crawl's per-core throughput is high
enough, adding cores saturates the shared memory bus and measured
efficiency reflects the BOX, not the engine.  This probe quantifies the
box's ceiling so BASELINE.md can separate the two effects with data
instead of argument.

Usage: python tools/membw_probe.py [K ...]   (default: 1 2 4 8 16 32)
Prints one JSON line: {"cores": {K: GB/s aggregate, ...}}
"""

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

N = 32 * 1024 * 1024          # 256 MB per array, 3 arrays per worker
WINDOW = 3.0                  # seconds of streaming per measurement


def _worker(core: int, out: mp.Queue) -> None:
    try:
        os.sched_setaffinity(0, {core})
    except OSError:
        pass
    a = np.zeros(N)
    b = np.random.default_rng(core).random(N)
    c = np.random.default_rng(core + 1).random(N)
    # warm: fault every page before the timed window
    np.add(b, c, out=a)
    t0 = time.perf_counter()
    reps = 0
    while time.perf_counter() - t0 < WINDOW:
        np.multiply(c, 1.000001, out=a)
        np.add(a, b, out=a)          # triad: read b,c, write a (x2 pass)
        reps += 1
    dt = time.perf_counter() - t0
    # bytes touched per rep: 2 reads + 2 writes + 1 read ~ 5 arrays
    out.put(5.0 * 8 * N * reps / dt)


def measure(k: int) -> float:
    q: mp.Queue = mp.Queue()
    procs = [mp.Process(target=_worker, args=(i, q)) for i in range(k)]
    for p in procs:
        p.start()
    rates = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return sum(rates) / 1e9


if __name__ == "__main__":
    ks = [int(x) for x in sys.argv[1:]] or [1, 2, 4, 8, 16, 32]
    print(json.dumps(
        {"unit": "GB/s aggregate", "window_sec": WINDOW,
         "cores": {str(k): round(measure(k), 2) for k in ks}}
    ))
