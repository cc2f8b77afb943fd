"""Memory-bandwidth microbenchmark: STREAM-style triad (a = b + s*c) run
by P worker processes, each pinned to its own core, each sweeping arrays
far larger than the last-level cache.

Purpose (BENCH/BASELINE.md): attribute the 8→32-core scaling shortfall of
the filter+scrub pipeline.  If the GUEST's aggregate memory bandwidth at
32 cores is not ~4× its bandwidth at 8 cores, then no memory-heavy job —
Spark or not — can scale 4× on this box, and the ceiling is the VM, not
the plan.  The triad is pure numpy (C loops, no Python per element), the
same compute/byte regime as the pipeline's zlib/regex stages.

Usage: python scripts/membw_triad.py [cores ...]    (default: 1 8 32)
Prints one line per level: aggregate GB/s (median of 3).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

N = 20_000_000  # 3 arrays × 8 B × 20M = 480 MB per worker >> LLC
SWEEPS = 5


def _worker(core: int, barrier: "mp.Barrier") -> None:
    try:
        os.sched_setaffinity(0, {core})
    except OSError:
        pass
    b = np.random.default_rng(core).random(N)
    c = np.random.default_rng(core + 1).random(N)
    a = np.empty(N)
    # warm-up sweep (page faults, NUMA placement)
    np.add(b, 1.5 * c, out=a)
    # all workers sweep the SAME wall-clock window: without the barrier,
    # staggered starts let early workers run alone and a sum of per-worker
    # rates wildly overstates aggregate bandwidth (observed 3×)
    barrier.wait()
    for _ in range(SWEEPS):
        np.multiply(c, 1.5, out=a)
        np.add(a, b, out=a)


def run_level(p: int) -> float:
    """Aggregate GB/s: total triad bytes / wall time of the synchronized
    window (parent is a barrier party: clock starts when all workers are
    warmed and released, stops when the last one finishes)."""
    barrier = mp.Barrier(p + 1)
    procs = [mp.Process(target=_worker, args=(i, barrier)) for i in range(p)]
    for pr in procs:
        pr.start()
    barrier.wait()
    t0 = time.perf_counter()
    for pr in procs:
        pr.join()
    dt = time.perf_counter() - t0
    # triad traffic: read b, read c, write a (+RFO ignored) = 3×8 B/elem
    return (p * N * SWEEPS * 3 * 8) / dt / 1e9


def main(levels: list[int], reps: int = 5) -> None:
    # interleave the levels within each rep so co-tenant drift (±25% over
    # minutes on this box) hits every level equally, then take medians
    runs: dict[int, list[float]] = {p: [] for p in levels}
    for _ in range(reps):
        for p in levels:
            runs[p].append(run_level(p))
    out = {}
    for p in levels:
        meds = sorted(runs[p])
        out[p] = meds[len(meds) // 2]
        print(f"cores={p:3d}  aggregate triad bandwidth = {out[p]:.1f} GB/s "
              f"(runs: {', '.join(f'{m:.1f}' for m in meds)})")
    for lo, hi in [(8, 32), (4, 16), (1, 8)]:
        if lo in out and hi in out:
            print(f"bandwidth ratio {lo}→{hi} cores: {out[hi] / out[lo]:.2f}× "
                  f"(perfect scaling would need {hi // lo}×)")
    print(json.dumps({"triad_gbps": out}))


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [1, 8, 32])
