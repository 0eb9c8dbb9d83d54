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
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from protein_feature_engineering_ray.config import tune_data_context

    tune_data_context()

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

    # Replicate the corpus so compute dominates fixed overheads (the sf0.1
    # events table is only ~100k turns); each copy gets distinct conv_ids,
    # deterministically.  REPLICATE=1 disables.
    replicate = int(os.environ.get("GRAFT_REPLICATE", "20"))

    def replicated():
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        if replicate <= 1:
            return from_events(sf_dir)

        # one independent task per copy (each reads the page-cached parquet
        # itself): the producer side scales with the cpu count instead of
        # serializing in a single fan-out task over the one input block
        src = f"{sf_dir}/events.parquet"

        def emit(batch):
            out = []
            for k in batch["id"]:
                t = pq.read_table(src)
                value = t["value"]
                et = t["event_type"]
                import pyarrow.compute as pc

                conv = pc.binary_join_element_wise(
                    pc.cast(t["user_id"], pa.string()),
                    pc.cast(pa.scalar(f"#{k}"), pa.string()), ""
                )
                tool = pc.if_else(pc.greater_equal(value, 100.0), et,
                                  pa.scalar("", pa.string()))
                out.append(pa.table({
                    "conv_id": conv,
                    "event_id": t["event_id"],
                    "turn_idx": pa.array(
                        np.full(len(t), -1, dtype=np.int32), pa.int32()),
                    "role": et,
                    "text": t["props"],
                    "tool": tool,
                    "ts": t["ts"],
                    "value": value,
                }))
            return pa.concat_tables(out)

        import ray as _ray

        return _ray.data.range(replicate).map_batches(
            emit, batch_format="numpy", batch_size=1
        )

    n_turns *= max(replicate, 1)
    # fixed bucket count (a property of the DATA layout, not the cpu count;
    # swept at 40M turns: 128→16.5s, 256→9.5s, 512→8.2s, 1024→9.1s @32cpu)
    num_buckets = 512

    times: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        fn()
        times[name] = round(time.perf_counter() - t0, 3)

    # /tmp measured as fast as tmpfs here (page-cache-backed writes); on a
    # real cluster the write lands on per-node storage whose aggregate
    # bandwidth scales with node count
    out_dir = "/tmp/bench_backfill"
    # untimed warm-up: full pipeline once — spawns the worker pool, imports
    # numpy/pandas in every worker, warms the page cache
    BACKFILL_COLS = ("conv_id", "event_id", "turn_idx", "role", "tool", "ts",
                     "value")
    def one_backfill():
        shutil.rmtree(out_dir, ignore_errors=True)
        backfill_to_dir(replicated(), out_dir, num_buckets=num_buckets,
                        turn_specs=EVENTS_TURN_SPECS, project=BACKFILL_COLS)

    one_backfill()  # untimed warm-up (worker pool spawn, imports, page cache)
    best = None
    for _ in range(2):  # min-of-2: the sandbox host is noisy
        t0 = time.perf_counter()
        one_backfill()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    times["backfill"] = round(best, 3)
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
    """Same job, fresh process per run, at 8 and 32 cpus; min-of-N per level
    (the sandbox shares a noisy host — the minimum measures the engine, the
    mean measures the neighbors).  Default 40M replicated turns so compute
    dominates fixed startup/shuffle-coordination costs."""
    repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "3"))
    env_common = dict(
        os.environ,
        GRAFT_REPLICATE=os.environ.get("GRAFT_REPLICATE", "400"),
    )

    def one(ncpu: int) -> dict:
        env = dict(env_common, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    runs_lo = [one(lo) for _ in range(repeats)]
    runs_hi = [one(hi) for _ in range(repeats)]
    r_lo = min(runs_lo, key=lambda r: r["value"])
    r_hi = min(runs_hi, key=lambda r: r["value"])
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    return {
        "metric": "scaling efficiency, backfill at num_cpus 8 vs 32 (fresh processes, same input, min of %d)" % repeats,
        "sec_8": r_lo["value"],
        "sec_32": r_hi["value"],
        "sec_8_all": [r["value"] for r in runs_lo],
        "sec_32_all": [r["value"] for r in runs_hi],
        "n_turns": r_hi["n_turns"],
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
