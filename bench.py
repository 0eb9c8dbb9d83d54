"""Benchmark harness.

``python bench.py``            — run headline pipelines on $GRAFT_SF_DIR
                                 (default /root/testdata/sf0.1) under
                                 ray.init(num_cpus=$RAY_GRAFT_CPUS or 32);
                                 prints ONE JSON line.
``python bench.py --scaling``  — same headline job at num_cpus=8 and 32 in
                                 fresh processes; prints throughputs and
                                 scaling efficiency (BASELINE.md protocol).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def run_bench() -> dict:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import duckdb

    n_turns = duckdb.sql(
        f"select count(*) from read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()[0]

    from protein_feature_engineering_ray.pipelines import queries as Q
    from protein_feature_engineering_ray.pipelines.backfill import (
        EVENTS_TURN_SPECS,
        backfill_to_dir,
    )
    from protein_feature_engineering_ray.sources import from_events

    # warm page cache (untimed)
    from_events(sf_dir).count()

    times: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        fn()
        times[name] = round(time.perf_counter() - t0, 3)

    out_dir = "/tmp/bench_backfill"
    shutil.rmtree(out_dir, ignore_errors=True)
    timed("backfill", lambda: backfill_to_dir(
        from_events(sf_dir), out_dir, num_buckets=max(64, num_cpus * 4),
        turn_specs=EVENTS_TURN_SPECS))
    timed("conv_descriptors", lambda: Q._conv(sf_dir, [
        ("AAC", {}), ("GAAC", {}), ("DPC", {}), ("CKSAAP", {"kspace": 2}),
        ("CTDT", {}), ("ConvSummary", {}), ("DDE", {}),
        ("NMBroto", {"nlag": 3}), ("PAAC", {"lam": 3}),
    ]).count())
    timed("asof_orders", lambda: Q.q_asof_orders(sf_dir).count())
    timed("sessions_frames", lambda: (
        Q.q_session_stats(sf_dir).count(), Q.q_frames(sf_dir).count()))
    timed("doc_pipeline", lambda: (
        Q.q_token_count(sf_dir).count(), Q.q_lang_quality(sf_dir).count(),
        Q.q_minhash_dedup(sf_dir).count()))
    timed("knn", lambda: Q.q_knn(sf_dir))

    backfill_sec = times["backfill"]
    result = {
        "metric": "turns/sec end-to-end feature backfill (sessionize + per-turn feature stack, partitioned resumable output)",
        "value": backfill_sec,
        "unit": "sec",
        "turns_per_sec": round(n_turns / backfill_sec, 1),
        "n_turns": n_turns,
        "queries": times,
        "sf": sf_dir,
        "num_cpus": num_cpus,
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = one(lo), one(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    return {
        "metric": "scaling efficiency, backfill at num_cpus 8 vs 32 (fresh processes, same input)",
        "sec_8": r_lo["value"],
        "sec_32": r_hi["value"],
        "turns_per_sec_8": r_lo["turns_per_sec"],
        "turns_per_sec_32": r_hi["turns_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "sf": r_hi["sf"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
