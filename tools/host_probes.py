#!/usr/bin/env python3
"""Host scaling probes backing BENCH.md's methodology.

Two micro-workloads, each run at taskset-pinned 1/2/4/8 cores:

- ``spin``: register-resident integer loop — pure-CPU scaling ceiling
  (what the scheduler + frequency governor allow).
- ``stream``: 64 MB numpy copy+add per worker — memory-bandwidth scaling
  ceiling (what the VM's memory system allows).

The gap between the two is the host's contention profile: a Spark build
streams far more bytes per instruction than ``spin``, so its N-vs-4N
efficiency lands between the two curves. Run:

    python tools/host_probes.py            # prints a small table
"""

from __future__ import annotations

import multiprocessing as mp
import os
import subprocess
import sys
import time


def _spin(res, i):
    x = 0
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < 6.0:
        for _ in range(100000):
            x += 1
        n += 100000
    res[i] = n / (time.perf_counter() - t0) / 1e6  # M iters/s


def _stream(res, i):
    import numpy as np

    a = np.ones(64_000_000 // 8, dtype=np.float64)  # 64 MB
    b = np.empty_like(a)
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < 6.0:
        np.copyto(b, a)
        a += 1.0
        n += 2
    res[i] = n * 64 / (time.perf_counter() - t0)  # MB/s


def _run(kind: str, workers: int) -> float:
    res = mp.Array("d", workers)
    fn = _spin if kind == "spin" else _stream
    ps = [mp.Process(target=fn, args=(res, i)) for i in range(workers)]
    [p.start() for p in ps]
    [p.join() for p in ps]
    return sum(res)


def main() -> None:
    if len(sys.argv) == 3:  # pinned child: <kind> <workers>
        print(f"{_run(sys.argv[1], int(sys.argv[2])):.1f}")
        return
    for kind, unit in (("spin", "M iters/s"), ("stream", "MB/s")):
        rows = []
        for c in (1, 2, 4, 8):
            cmd = ["taskset", "-c", f"0-{c - 1}" if c > 1 else "0",
                   sys.executable, os.path.abspath(__file__), kind, str(c)]
            val = float(subprocess.run(
                cmd, capture_output=True, text=True, check=True
            ).stdout.strip())
            rows.append((c, val))
        base = rows[0][1]
        print(f"\n{kind} ({unit}):")
        for c, v in rows:
            eff = v / base / c
            print(f"  {c:2d} cores: {v:10.1f}   x{v / base:5.2f}  eff {eff:.2f}")


if __name__ == "__main__":
    main()
