"""Measure this box's RAW multiprocessing scaling ceiling, independent of Ray.

The sandbox VM is CPU-overcommitted: identical pure-Python workers scale
sublinearly with process count, and the ceiling drifts with neighbor load.
The engine's scaling efficiency (bench.py --scaling) can only be judged
against the SAME-DAY hardware ceiling this prints — comparing an engine
number against a ceiling measured on a quieter day overstates the gap.

    python tools/cpu_ceiling.py [lo] [hi]     # default 4 16

Prints one JSON line: units/s at each process count and the efficiency
(r_hi / r_lo) / (hi / lo) — the same formula bench.py uses.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _burn(args) -> int:
    """Fixed CPU-bound unit: tight arithmetic loop, no memory traffic."""
    n_units, stop = args
    done = 0
    while done < n_units and time.perf_counter() < stop:
        acc = 0
        for i in range(200_000):
            acc += i * i % 7
        done += 1
    return done


def rate(n_procs: int, seconds: float = 12.0) -> float:
    stop = time.perf_counter() + seconds
    with mp.Pool(n_procs) as pool:
        t0 = time.perf_counter()
        counts = pool.map(_burn, [(10_000, stop)] * n_procs)
        wall = time.perf_counter() - t0
    return sum(counts) / wall


def _mem_burn(args) -> float:
    """Memory-bound unit: repeatedly reduce a 100 MB array. Returns GB
    touched. Complements _burn: the hypervisor can throttle memory
    bandwidth independently of the ALUs (measured 0.6 GB/s single-thread
    memcpy in one window and 8 GB/s minutes later on this VM), and Ray
    shuffles are bandwidth-bound where _burn is not."""
    import numpy as np

    seconds, seed = args
    a = np.arange(12_500_000, dtype=np.float64) + seed  # 100 MB
    stop = time.perf_counter() + seconds
    gb = 0.0
    while time.perf_counter() < stop:
        a.sum()
        gb += 0.1
    return gb


def membw_gbps(n_procs: int, seconds: float = 3.0) -> float:
    """Aggregate memory-read bandwidth (GB/s) across n_procs processes."""
    with mp.Pool(n_procs) as pool:
        t0 = time.perf_counter()
        gbs = pool.map(_mem_burn, [(seconds, i) for i in range(n_procs)])
        wall = time.perf_counter() - t0
    return sum(gbs) / wall


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    r_lo, r_hi = rate(lo), rate(hi)
    print(
        json.dumps(
            {
                "metric": "cpu_scaling_ceiling",
                f"units_per_sec_{lo}": round(r_lo, 2),
                f"units_per_sec_{hi}": round(r_hi, 2),
                "efficiency": round((r_hi / r_lo) / (hi / lo), 3),
                "num_procs": [lo, hi],
            }
        )
    )


if __name__ == "__main__":
    main()
