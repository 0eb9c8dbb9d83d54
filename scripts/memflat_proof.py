"""Memory-flat streaming proof (BASELINE.md; round-4 ask 7).

Claim under test: the streaming executor holds PEAK MEMORY flat while the
input grows 5x — blocks flow read -> exchange -> kernel -> partitioned
write under backpressure, nothing materializes the corpus.

Protocol: one full resumable feature backfill (the scaling job: sessionize
+ per-turn stack, hash buckets, float32 packed output) at 40M turns
(replicate=400 — the scaling-gate input) and at 200M turns (replicate=2000,
5x, ~9 GB packed output), each in a FRESH process.  A sampler thread polls
every 0.5 s:

- total PSS across ALL processes (driver + raylet + every Ray worker),
  from /proc/<pid>/smaps_rollup — PSS, not RSS: every worker maps the
  shared plasma region, so summed RSS counts those pages once PER WORKER
  (measured 2x+ inflation at 32 cpus) while PSS apportions them;
- plasma (object store) usage as /dev/shm used bytes (statvfs — the
  store is shm-backed; no psutil/grpc in this container).

What "memory-flat" honestly means for this job: the backfill's one
exchange is an all-to-all shuffle, and Ray's shuffle holds its blocks in
the object store UNTIL THE CONFIGURED CAP, spilling to disk beyond it —
so peak plasma grows ~linearly with input below the cap (measured ~0.12
GB per M turns) and must PLATEAU AT THE CAP above it, with the job still
completing.  Peak memory is bounded by CONFIGURATION, not by input size;
on a real cluster the cap multiplies per node.  Pass =

- the largest level's shuffle volume exceeds the object-store cap, yet
  peak /dev/shm usage stays <= 1.05 x cap (spill engaged, no blowup), and
- heap (total PSS minus shm) grows far less than input across the top
  doubling (< 1.5x for 2x input).

Prints ONE JSON line; record it in BASELINE.md.

Usage::

    python scripts/memflat_proof.py                   # 40M / 200M / 400M
    python scripts/memflat_proof.py --levels 80,400   # quick smoke
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def total_pss_bytes() -> int:
    total = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/smaps_rollup") as f:
                for line in f:
                    if line.startswith("Pss:"):
                        total += int(line.split()[1]) * 1024
                        break
        except OSError:
            continue
    return total


def shm_used_bytes() -> int:
    st = os.statvfs("/dev/shm")
    return (st.f_blocks - st.f_bfree) * st.f_frsize


def child_main(args) -> int:
    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    from protein_feature_engineering_ray.config import tune_data_context

    tune_data_context()
    from protein_feature_engineering_ray.pipelines.backfill import (
        EVENTS_TURN_SPECS,
        backfill_to_dir,
    )
    from protein_feature_engineering_ray.schema import EVENT_ROLE_ALPHABET
    from protein_feature_engineering_ray.sources.synthscale import (
        replicated_events,
        sized_num_buckets,
    )
    from protein_feature_engineering_ray.sources.transcripts import pre_encode

    baseline = total_pss_bytes()
    shm_baseline = shm_used_bytes()
    peak = {"pss": 0, "shm": 0, "heap": 0}
    stop = threading.Event()

    def sample():
        while not stop.is_set():
            pss = total_pss_bytes()
            shm = shm_used_bytes()
            peak["pss"] = max(peak["pss"], pss)
            peak["shm"] = max(peak["shm"], shm)
            # heap = CO-SAMPLED non-plasma memory (subtracting two peaks
            # taken at different instants overstates it)
            peak["heap"] = max(peak["heap"], pss - shm)
            stop.wait(0.5)

    t = threading.Thread(target=sample, daemon=True)
    t.start()

    out_dir = os.path.join(args.base, f"out-{args.replicate}")
    shutil.rmtree(out_dir, ignore_errors=True)
    n_turns = args.base_turns * args.replicate
    t0 = time.perf_counter()
    backfill_to_dir(
        pre_encode(replicated_events(args.sf_dir, args.replicate),
                   EVENT_ROLE_ALPHABET),
        out_dir,
        num_buckets=sized_num_buckets(n_turns),
        turn_specs=EVENTS_TURN_SPECS,
        project=("conv_id", "event_id", "turn_idx", "role_code",
                 "tool_flag", "ts", "value"),
        vector_col="features", out_dtype="float32",
    )
    wall = round(time.perf_counter() - t0, 2)
    stop.set()
    t.join(timeout=5)
    out_bytes = sum(
        os.path.getsize(os.path.join(d, f))
        for d, _, fs in os.walk(out_dir) for f in fs)
    cap_gb = ray.cluster_resources().get("object_store_memory", 0) / 2**30
    spilled = 0
    for d, _, fs in os.walk("/tmp/ray"):
        if "spill" in d:
            spilled += sum(os.path.getsize(os.path.join(d, f)) for f in fs)
    peak_shm = max(peak["shm"] - shm_baseline, 0)
    peak_pss_over = peak["pss"] - baseline
    print("RESULT " + json.dumps({
        "replicate": args.replicate,
        "n_turns": n_turns,
        "wall_sec": wall,
        "turns_per_sec": round(n_turns / wall, 1),
        "baseline_pss_gb": round(baseline / 2**30, 3),
        "peak_total_pss_gb": round(peak["pss"] / 2**30, 3),
        "peak_pss_over_baseline_gb": round(peak_pss_over / 2**30, 3),
        "peak_heap_gb": round(
            max(peak["heap"] - (baseline - shm_baseline), 0) / 2**30, 3),
        "peak_shm_used_gb": round(peak_shm / 2**30, 3),
        "object_store_cap_gb": round(cap_gb, 3),
        "spilled_gb": round(spilled / 2**30, 3),
        "output_gb": round(out_bytes / 2**30, 3),
    }))
    shutil.rmtree(out_dir, ignore_errors=True)
    ray.shutdown()
    return 0


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    p.add_argument("--levels", default="400,2000,4000",
                   help="comma-separated replicate factors")
    p.add_argument("--num-cpus", type=int,
                   default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    p.add_argument("--base", default="/tmp/memflat")
    p.add_argument("--replicate", type=int, default=None,
                   help="internal: child mode")
    args = p.parse_args()

    import duckdb

    args.base_turns = duckdb.sql(
        f"select count(*) from read_parquet('{args.sf_dir}/events.parquet')"
    ).fetchone()[0]

    if args.replicate is not None:
        return child_main(args)

    shutil.rmtree(args.base, ignore_errors=True)
    os.makedirs(args.base)
    runs = []
    for rep in [int(x) for x in args.levels.split(",")]:
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--sf-dir", args.sf_dir, "--num-cpus", str(args.num_cpus),
             "--base", args.base, "--replicate", str(rep)],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
        out, _ = proc.communicate()
        assert proc.returncode == 0, f"replicate={rep} run failed"
        runs.append(json.loads(
            [ln for ln in out.splitlines()
             if ln.startswith("RESULT ")][-1][7:]))

    mid, hi = runs[-2] if len(runs) > 1 else runs[0], runs[-1]
    input_growth = hi["n_turns"] / mid["n_turns"]
    heap_growth = hi["peak_heap_gb"] / max(mid["peak_heap_gb"], 1e-9)
    cap = hi["object_store_cap_gb"]
    shm_bounded = hi["peak_shm_used_gb"] <= 1.05 * cap
    result = {
        "metric": "peak memory vs input size (streaming backfill; bar: "
                  "plasma bounded by the object-store cap via spill, heap "
                  "growth << input growth)",
        "num_cpus": args.num_cpus,
        "runs": runs,
        "top_input_growth": round(input_growth, 2),
        "top_heap_growth": round(heap_growth, 3),
        "object_store_cap_gb": cap,
        "shm_bounded_by_cap": bool(shm_bounded),
        "memory_flat": bool(shm_bounded and heap_growth < 1.5),
    }
    print(json.dumps(result))
    shutil.rmtree(args.base, ignore_errors=True)
    return 0 if result["memory_flat"] else 1


if __name__ == "__main__":
    sys.exit(main())
