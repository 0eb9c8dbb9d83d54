"""Host CPU-capacity calibration for the scaling gate.

This sandbox shares a virtualized host that TAXES wide loads: a pure-python
CPU burn (no Ray, no I/O — nothing of the engine) measures how many
effective CPUs an n-way load actually receives, via /proc/stat busy/steal
deltas.  Measured repeatedly on 2026-08-17: 8-way ~0.99 efficiency,
32-way ~0.85 — i.e. a PERFECTLY scaling program can measure at most
~0.86 on an 8-vs-32 efficiency gate here.  ``bench.py --scaling`` numbers
should therefore be read against the ceiling this script reports at the
same moment (BASELINE.md records both raw and ceiling-adjusted values).

Usage: python tools/host_calibration.py [widths...]   (default: 8 32)
Prints one JSON line: {"8": {busy_cpus, steal_cpus, efficiency}, ...,
"ceiling_lo_hi": efficiency(hi)/efficiency(lo)}.

``--membw`` measures the OTHER per-node ceiling: aggregate DRAM bandwidth
under an n-way numpy copy burn (GB/s touched, read+write).  The CPU burn
cannot see memory-side contention — round-4 attempt 2 measured a 0.998
CPU ceiling (zero steal) while the engine's 8v32 ratio sat at ~0.6; the
membw burn shows the DRAM wall directly (per-worker GB/s falls as width
grows once the socket saturates).  On a real cluster both resources scale
per NODE; only their single-box ceilings are visible in this sandbox.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

BURN_SEC = 8.0


def _burn(_):
    t0 = time.time()
    while time.time() - t0 < BURN_SEC:
        pass


def _stat():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    busy = vals[0] + vals[2]  # user + system
    steal = vals[7] if len(vals) > 7 else 0
    return busy, steal


def measure(width: int) -> dict:
    b0, s0 = _stat()
    with mp.Pool(width) as p:
        p.map(_burn, range(width))
    b1, s1 = _stat()
    jiffies = BURN_SEC * 100.0  # USER_HZ=100 per cpu
    return {
        "busy_cpus": round((b1 - b0) / jiffies, 2),
        "steal_cpus": round((s1 - s0) / jiffies, 2),
        "efficiency": round((b1 - b0) / (width * jiffies), 3),
    }


COPY_MB = 256


def _copy_burn(q):
    import numpy as np

    a = np.empty(COPY_MB * 1024 * 1024 // 8, dtype=np.float64)
    b = np.empty_like(a)
    a[:] = 1.0
    # warm placement, then timed copies
    np.copyto(b, a)
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < BURN_SEC:
        np.copyto(b, a)
        n += 1
    dt = time.perf_counter() - t0
    q.put((n * COPY_MB * 2 / 1024.0, dt))  # GB touched (read+write), sec


def measure_membw(width: int) -> dict:
    q = mp.Queue()
    procs = [mp.Process(target=_copy_burn, args=(q,)) for _ in range(width)]
    for p in procs:
        p.start()
    vals = [q.get() for _ in range(width)]
    for p in procs:
        p.join()
    agg = sum(gb / dt for gb, dt in vals)
    return {
        "agg_gb_per_s": round(agg, 1),
        "per_worker_gb_per_s": round(agg / width, 2),
    }


def main_membw(widths: list[int]) -> dict:
    out: dict = {}
    for w in widths:
        out[str(w)] = measure_membw(w)
    if len(widths) >= 2:
        lo, hi = str(widths[0]), str(widths[-1])
        out["membw_ceiling_lo_hi"] = round(
            (out[hi]["agg_gb_per_s"] / out[lo]["agg_gb_per_s"])
            / (int(hi) / int(lo)), 3
        )
    return out


def main(widths: list[int]) -> dict:
    out: dict = {}
    for w in widths:
        out[str(w)] = measure(w)
    if len(widths) >= 2:
        lo, hi = str(widths[0]), str(widths[-1])
        out["ceiling_lo_hi"] = round(
            out[hi]["efficiency"] / out[lo]["efficiency"], 3
        )
    return out


if __name__ == "__main__":
    args = sys.argv[1:]
    membw_mode = "--membw" in args
    ws = [int(a) for a in args if not a.startswith("--")] or [8, 32]
    print(json.dumps(main_membw(ws) if membw_mode else main(ws)))
