#!/usr/bin/env python
"""Host compute-scaling probe: NO Spark, NO JVM, NO shared data.

Each worker process runs an identical closed-loop of transcendental math
whose working set is two registers — no memory traffic, no locks, no I/O.
If the host really had P independent cores, throughput would scale ~P and
8->32 efficiency would be ~1.0. The measured curve is therefore a pure
property of the sandbox host (hypervisor vCPU scheduling / frequency
behavior), and an upper bound on what ANY engine — Spark or otherwise —
can exhibit for N->4N scaling here.

Writes BENCH/host_probe.json. Used by BENCH/BASELINE.md to attribute the
pipeline's measured scaling efficiency between host ceiling and engine
overhead (BASELINE.json north_rule evidence).
"""

from __future__ import annotations

import json
import math
import multiprocessing as mp
import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def burn(n: int) -> float:
    x = 0.001
    t0 = time.perf_counter()
    for _ in range(n):
        x = math.cos(x) + math.sin(x * 1.0001)
    return time.perf_counter() - t0


def run(procs: int, n: int) -> tuple[float, float]:
    t0 = time.perf_counter()
    with mp.Pool(procs) as p:
        task_times = p.map(burn, [n] * procs)
    return time.perf_counter() - t0, sum(task_times) / len(task_times)


def main() -> None:
    n = int(os.environ.get("HOST_PROBE_ITERS", "60000000"))
    repeats = int(os.environ.get("HOST_PROBE_REPEATS", "3"))
    sweep: dict[int, dict] = {}
    for procs in (1, 4, 8, 16, 32):
        best_thr, best = 0.0, None
        for _ in range(repeats):
            wall, avg_task = run(procs, n)
            thr = procs * n / wall / 1e6
            if thr > best_thr:
                best_thr = thr
                best = {
                    "wall_sec": round(wall, 2),
                    "avg_task_sec": round(avg_task, 2),
                    "throughput_mops": round(thr, 1),
                }
        sweep[procs] = best
        print(procs, best)

    report = {
        "nproc": os.cpu_count(),
        "iters_per_proc": n,
        "repeats_best_of": repeats,
        "sweep": sweep,
        "efficiency_1_to_8": round(
            sweep[8]["throughput_mops"] / sweep[1]["throughput_mops"] / 8, 3
        ),
        "efficiency_8_to_32": round(
            sweep[32]["throughput_mops"] / sweep[8]["throughput_mops"] / 4, 3
        ),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "host_probe.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
