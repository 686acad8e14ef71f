"""Aggregate DRAM copy-bandwidth microbenchmark — the hardware context
for the scaling numbers in BASELINE.md.

A CDC ingest epoch is dominated by data movement (parquet decode,
Arrow transfers, shuffle serialization), so the machine's aggregate
copy bandwidth at P concurrent processes bounds any P-way speedup.
This measures it directly: P pinned worker processes each stream-copy
a buffer far larger than L3 for a fixed wall-time window; aggregate
GB/s = sum of per-worker bytes / window.

Usage:
    python -m bench.membw                 # P in {1, 4, 8, 32}
    python -m bench.membw --procs 1 4     # explicit levels

Prints one JSON line: {"1": gbps, "4": gbps, ...}.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import time

import numpy as np

BUF_MB = 256  # per-worker buffer; far beyond any L3 slice
WINDOW_S = 3.0


def _worker(idx: int, out_q: mp.Queue) -> None:
    os.sched_setaffinity(0, {idx % os.cpu_count()})
    src = np.random.bytes(BUF_MB << 20)
    a = np.frombuffer(src, dtype=np.uint8)
    b = np.empty_like(a)
    # warm
    np.copyto(b, a)
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < WINDOW_S:
        np.copyto(b, a)
        n += 1
    dt = time.perf_counter() - t0
    # copy touches 2x the buffer (read + write)
    out_q.put(2 * n * (BUF_MB << 20) / dt)


def measure(procs: int) -> float:
    q: mp.Queue = mp.Queue()
    ws = [mp.Process(target=_worker, args=(i, q)) for i in range(procs)]
    for w in ws:
        w.start()
    rates = [q.get() for _ in ws]
    for w in ws:
        w.join()
    return sum(rates) / 1e9


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--procs", type=int, nargs="*", default=[1, 4, 8, 32])
    args = p.parse_args()
    print(json.dumps({str(n): round(measure(n), 1) for n in args.procs}))


if __name__ == "__main__":
    main()
