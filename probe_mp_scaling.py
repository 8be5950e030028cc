#!/usr/bin/env python
"""No-Spark scaling probe: the machine's own parallel-efficiency ceiling.

Runs the SAME extraction kernels as the Spark job (fixtures.gen_page →
kernels.extract.extract_document) under plain ``multiprocessing`` — no
JVM, no shuffle, no scheduler — at several worker counts, and prints
docs/sec per count plus N→4N efficiency pairs.

Purpose: BENCH.md's scaling table needs a control. If PURE
multiprocessing of pure-Python kernels also loses efficiency above ~8
busy cores, the loss is the sandbox's hypervisor/frequency ceiling, not
the Spark plan. This script is that control, committed so the number in
BENCH.md is reproducible: ``python probe_mp_scaling.py``.

Work is pre-partitioned into one contiguous slice per worker (zero
coordination — a lower bound on parallel overhead; Spark cannot beat
this on one box).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

N_DOCS = int(os.environ.get("PROBE_DOCS", "8000"))
COUNTS = tuple(int(c) for c in
               os.environ.get("PROBE_CORES", "2,8,32").split(","))
REPS = int(os.environ.get("PROBE_REPS", "3"))


def _work(args: tuple[int, int]) -> int:
    lo, hi = args
    from extract_kit_spark.fixtures import gen_page
    from extract_kit_spark.kernels.extract import extract_document
    n = 0
    for i in range(lo, hi):
        p = gen_page(i)
        extract_document(p["url"], p["html"])
        n += 1
    return n


def run_at(workers: int) -> float:
    per = -(-N_DOCS // workers)
    slices = [(w * per, min((w + 1) * per, N_DOCS))
              for w in range(workers)]
    with mp.Pool(workers) as pool:
        pool.map(_work, slices[:1])  # warm imports on one worker
        t0 = time.perf_counter()
        done = sum(pool.map(_work, slices))
        dt = time.perf_counter() - t0
    assert done == N_DOCS
    return N_DOCS / dt


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    best: dict[int, float] = {}
    for rep in range(REPS):
        for c in COUNTS:
            dps = run_at(c)
            best[c] = max(best.get(c, 0.0), dps)
            print(f"rep{rep} workers={c}: {dps:.0f} docs/s "
                  f"({dps / c:.0f}/proc)", file=sys.stderr)
    pairs = {}
    cs = sorted(best)
    for a, b in zip(cs, cs[1:]):
        pairs[f"{a}_to_{b}"] = round(best[b] / best[a] / (b / a), 3)
    print(json.dumps({"probe": "multiprocessing-no-spark",
                      "docs": N_DOCS,
                      "best_docs_per_sec": {str(c): round(v, 1)
                                            for c, v in best.items()},
                      "efficiency_pairs": pairs}))


if __name__ == "__main__":
    main()
