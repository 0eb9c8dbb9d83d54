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
    ws = [int(a) for a in sys.argv[1:]] or [8, 32]
    print(json.dumps(main(ws)))
